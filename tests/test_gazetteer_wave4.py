"""Round-5 wave-4 grammar shapes (the fourth recall wave, found by the
shape-probe batch after the realistic-fixture P/R run went 1.0).

Each test pins a real-world declaration family that previously extracted
NOTHING (or leaked its name into the call stream):

- JS/TS: typed arrow declarators (`= (): T =>`), CommonJS
  `exports.name = fn` / `module.exports.name = fn`, TS `namespace`.
- C/C++: `enum` / `enum class` / `union`, anonymous and named
  `typedef struct { … } alias;`.
- Go: grouped `type (…)` blocks, defined types / aliases / func types
  beyond struct|interface.
- Java: `@interface` annotation types, `throws` clauses on methods and
  prototypes, `default`-tailed annotation members.
- Python: lambda declarators (`f = lambda x: …`), incl. the class-body
  method form.

Reference parity target: the reference's per-page LLM extraction reads
every declaration on the page (parsers/pdf_parser.py:396-416), so
per-shape recall is the fidelity axis, not an optional nicety.
"""

from __future__ import annotations

from scrapontologies_spark.functions.code_gazetteer import extract_mentions


def _pairs(lang, text):
    return [(m["kind"], m["name"]) for m in extract_mentions(lang, text)]


def _decls(lang, text):
    return [
        (m["kind"], m["name"], m["owner"])
        for m in extract_mentions(lang, text)
        if m["kind"] != "call"
    ]


# --- JS/TS -----------------------------------------------------------------


def test_typed_arrow_declarators():
    src = (
        "export const useThing = (): Thing => { return x }\n"
        "const fetchAll = async (): Promise<Task[]> => load()\n"
        "let pick = (xs: number[]): number | null => xs[0]\n"
    )
    assert _decls("javascript", src) == [
        ("function", "useThing", ""),
        ("function", "fetchAll", ""),
        ("function", "pick", ""),
    ]


def test_typed_class_field_arrow():
    src = "class S {\n  tick = (): void => { this.n += 1 }\n}\n"
    assert ("method", "tick", "S") in _decls("javascript", src)


def test_commonjs_exports_assignments():
    src = (
        "exports.helper = function (x) { return x }\n"
        "exports.merge = (a, b) => ({ ...a, ...b })\n"
        "module.exports.run = async () => { go() }\n"
    )
    assert _decls("javascript", src) == [
        ("function", "helper", ""),
        ("function", "merge", ""),
        ("function", "run", ""),
    ]


def test_module_exports_object_is_not_a_declaration():
    # re-exporting existing bindings declares nothing new
    assert _pairs("javascript", "module.exports = { run, helper }\n") == []


def test_exports_assign_owns_body_calls():
    src = "exports.load = function (p) {\n  return readFile(p)\n}\n"
    calls = [m for m in extract_mentions("javascript", src) if m["kind"] == "call"]
    assert calls == [{"kind": "call", "name": "readFile", "owner": "load"}]


def test_ts_namespace_is_a_nominal_container():
    src = "export namespace Geo {\n}\nnamespace A.B.C {\n}\nmodule Legacy {\n}\n"
    assert _pairs("javascript", src) == [
        ("class", "Geo"),
        ("class", "A.B.C"),
        ("class", "Legacy"),
    ]
    # `module.exports` and quoted ambient modules can never fire
    assert _pairs("javascript", "declare module 'pkg' {\n}\n") == []


# --- C/C++ -------------------------------------------------------------------


def test_c_enum_union_nominal_types():
    src = (
        "enum Color { RED, GREEN };\n"
        "enum class Winding : int { CW, CCW };\n"
        "union Scalar { int i; double f; };\n"
    )
    assert _pairs("c", src) == [
        ("class", "Color"),
        ("class", "Winding"),
        ("class", "Scalar"),
    ]


def test_c_typedef_anonymous_takes_alias():
    src = "typedef struct {\n  int x;\n} point_t;\n"
    assert _pairs("c", src) == [("class", "point_t")]
    src = "typedef enum {\n  OK,\n  ERR,\n} status_t;\n"
    assert _pairs("c", src) == [("class", "status_t")]


def test_c_typedef_named_takes_tag_and_alias():
    src = "typedef struct node {\n  struct node *next;\n} node_t;\n"
    assert sorted(_pairs("c", src)) == [("class", "node"), ("class", "node_t")]


def test_c_typedef_split_across_chunks_is_skipped():
    # unbalanced body (the close brace landed in the next chunk): no
    # mention, no crash — the cross-chunk container envelope
    assert _pairs("c", "typedef struct {\n  int x;\n") == []


def test_c_variable_declarations_still_excluded():
    assert _pairs("c", "struct Point p;\nenum Color c;\n") == []


# --- Go ----------------------------------------------------------------------


def test_go_grouped_type_block():
    src = (
        "type (\n"
        "\tTask struct {\n"
        "\t\tID int\n"
        "\t}\n"
        "\tTaskID = int\n"
        "\tHandler func(w, r int)\n"
        ")\n"
    )
    # struct FIELD lines (ID int) must not mint types — depth gating
    assert _pairs("go", src) == [
        ("class", "Task"),
        ("class", "TaskID"),
        ("class", "Handler"),
    ]


def test_go_defined_types_beyond_struct_interface():
    src = "type Celsius float64\ntype MyInt = int\ntype Mw func(h H) H\n"
    assert _pairs("go", src) == [
        ("class", "Celsius"),
        ("class", "MyInt"),
        ("class", "Mw"),
    ]


# --- Java --------------------------------------------------------------------


def test_java_annotation_type_and_default_members():
    src = (
        "public @interface Retry {\n"
        "    int attempts() default 3;\n"
        "}\n"
    )
    assert _decls("java", src) == [
        ("class", "Retry", ""),
        ("method", "attempts", "Retry"),
    ]
    # no call leak from the default-tailed member line
    assert not [m for m in extract_mentions("java", src) if m["kind"] == "call"]


def test_java_throws_clause_methods_and_protos():
    src = (
        "public class Io {\n"
        "  public byte[] readAll(Path p) throws IOException, Foo {\n"
        "    return Files.readAllBytes(p);\n"
        "  }\n"
        "  void close() throws IOException;\n"
        "}\n"
    )
    decls = _decls("java", src)
    assert ("method", "readAll", "Io") in decls
    assert ("method", "close", "Io") in decls
    calls = [m["name"] for m in extract_mentions("java", src) if m["kind"] == "call"]
    # the decl names no longer leak (receiver calls like Files.readAllBytes
    # are excluded by the dotted-call lookbehind, as everywhere)
    assert calls == []


def test_java_use_site_annotation_is_not_a_type():
    assert _pairs("java", "  @Override\n  @Retry(attempts = 2)\n") == []


# --- Python ------------------------------------------------------------------


def test_python_lambda_declarators():
    src = "is_urgent = lambda t: t.p >= 8\n\nclass R:\n    key = lambda self: 1\n"
    assert _decls("python", src) == [
        ("function", "is_urgent", ""),
        ("class", "R", ""),
        ("method", "key", "R"),
    ]


def test_python_lambda_attribute_and_dict_values_excluded():
    assert _pairs("python", "self.f = lambda x: x\nd = {'k': lambda: 1}\n") == []


def test_python_lambda_owns_same_line_calls():
    src = "f = lambda x: g(x)\n"
    mentions = extract_mentions("python", src)
    assert {"kind": "function", "name": "f", "owner": ""} in mentions
    # the decl line yields no calls — same contract as a one-line def
    assert not [m for m in mentions if m["kind"] == "call"]


# --- wave 5 (second shape-probe batch, same round) ---------------------------


def test_go_const_var_blocks_leak_no_calls():
    src = "const (\n\tKindA = iota\n\tKindB\n)\nvar (\n\tmu sync.Mutex\n)\n"
    assert extract_mentions("go", src) == []


def test_js_generator_methods():
    src = "class S {\n  *iter() { yield take(1) }\n  async *stream() {}\n}\n"
    got = extract_mentions("javascript", src)
    assert {"kind": "method", "name": "iter", "owner": "S"} in got
    assert {"kind": "method", "name": "stream", "owner": "S"} in got
    # the generator decl no longer leaks its name; the one-line body is
    # consumed by the declarator line, like every one-line declarator
    assert [m for m in got if m["kind"] == "call"] == []


def test_rust_type_alias_and_fn_bounds():
    src = (
        "pub type Result<T> = std::result::Result<T, Error>;\n"
        "pub fn sort_by<F>(xs: &mut [i32], f: F)\n"
        "where\n"
        "    F: Fn(i32) -> i32,\n"
        "{\n"
        "    apply(xs)\n"
        "}\n"
    )
    got = extract_mentions("rust", src)
    assert {"kind": "class", "name": "Result", "owner": ""} in got
    # Fn in the where-clause is a bound, not a call site
    assert [m for m in got if m["kind"] == "call"] == [
        {"kind": "call", "name": "apply", "owner": "sort_by"}
    ]


def test_c_function_like_macro_and_fn_ptr_typedef():
    src = (
        "#define MAX(a, b) ((a) > (b) ? (a) : (b))\n"
        "#define VERSION 3\n"
        "typedef int (*cmp_fn)(const void *a, const void *b);\n"
    )
    assert _pairs("c", src) == [
        ("function", "MAX"),       # function-like macro only
        ("class", "cmp_fn"),
    ]


def test_java_functional_interface_fields():
    src = (
        "public class H {\n"
        "  private final Function<Integer, Integer> doubler = x -> x * 2;\n"
        "  static Supplier<Integer> zero = () -> make();\n"
        "}\n"
    )
    got = extract_mentions("java", src)
    assert {"kind": "method", "name": "doubler", "owner": "H"} in got
    assert {"kind": "method", "name": "zero", "owner": "H"} in got
    # the initializer body's call is consumed by the declarator line —
    # and crucially no phantom `make` METHOD is minted (the old greedy
    # <.*> generic span re-anchored on the lambda body)
    assert not [m for m in got if m["name"] == "make"]


def test_java_switch_arrows_are_not_declarations():
    src = (
        "public class W {\n"
        "  int f(int k) {\n"
        "    switch (k) {\n"
        "      case 1 -> g(k);\n"
        "      default -> h(k);\n"
        "    }\n"
        "    return 0;\n"
        "  }\n"
        "}\n"
    )
    got = extract_mentions("java", src)
    assert [(m["kind"], m["name"]) for m in got if m["kind"] != "call"] == [
        ("class", "W"), ("method", "f"),
    ]
    assert sorted(m["name"] for m in got if m["kind"] == "call") == ["g", "h"]


def test_java_generic_span_stays_on_one_line():
    # a negated-class span must not cross lines and re-own the next
    # class's prototype (found by the java recall fuzz family)
    src = (
        "class Cls1 {\n"
        "    public List<String> a0(int a) {\n"
        "    }\n"
        "}\n"
        "class Cls2 {\n"
        "    public List<String> b0(int a);\n"
        "}\n"
    )
    got = extract_mentions("java", src)
    assert {"kind": "method", "name": "b0", "owner": "Cls2"} in got
