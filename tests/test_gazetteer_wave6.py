"""Round-5 wave-6 grammar shapes (the third shape-probe batch).

Each test pins a scoping or prototype family the line-based extractors
got wrong on realistic code:

- Python/Go: a column-0 statement after a def ENDS that def's body —
  the dedent-blind owner tracker handed every module-level call after
  the first def to that def.
- Go: interface method-set prototypes (method decls owned by the
  interface, not phantom calls) and anonymous-func declarators
  (`var h = func(…) {`).
- TS: `abstract render(): void;` prototypes are declarations.
- JS: ES2022 private methods / private field arrows (`#helper() {`).
- Rust: enum tuple variants (`Circle(f64),`) are not call sites.
- C++: destructors (`~Socket()`) — previously an invisible decl AND a
  phantom `Socket` call.
- Java: member ownership follows class brace EXTENTS — a method after a
  nested class closes belongs to the outer class, not the inner one.

Reference parity target: the reference's per-page LLM extraction reads
every declaration on the page (parsers/pdf_parser.py:396-416), so
per-shape scoping fidelity is the fidelity axis, not a nicety.
"""

from __future__ import annotations

from scrapontologies_spark.functions.code_gazetteer import extract_mentions


def _rows(lang, text):
    return [
        (m["kind"], m["name"], m["owner"]) for m in extract_mentions(lang, text)
    ]


def _calls(lang, text):
    return [(m["name"], m["owner"]) for m in extract_mentions(lang, text)
            if m["kind"] == "call"]


# --- Python: module-scope owner reset ---------------------------------------


def test_python_toplevel_statement_resets_owner():
    src = (
        "class Factory:\n"
        "    def make(self):\n"
        "        return build()\n"
        "\n"
        "X = compute_default()\n"
        "\n"
        "main()\n"
    )
    assert _calls("python", src) == [
        ("build", "make"),
        ("compute_default", ""),   # was owned by `make` pre-wave-6
        ("main", ""),
    ]


def test_python_black_style_signature_keeps_owner():
    # the `):` closer at column 0 is still inside the declaration — only
    # an identifier/decorator at column 0 resets
    src = (
        "def long_sig(\n"
        "    a,\n"
        "    b,\n"
        "):\n"
        "    return helper(a)\n"
    )
    assert _calls("python", src) == [("helper", "long_sig")]


def test_python_paren_free_toplevel_resets_too():
    src = (
        "def f():\n"
        "    return g()\n"
        "\n"
        "FLAG = True\n"
        "h()\n"
    )
    assert _calls("python", src) == [("g", "f"), ("h", "")]


def test_python_lambda_declarator_still_owns_until_reset():
    # per-language probe split keeps the lambda-declarator alternative:
    # it sets the owner, and the next column-0 statement clears it
    src = (
        "h = lambda x: deep(x)\n"
        "probe(1)\n"
    )
    assert _calls("python", src) == [("probe", "")]


# --- Go: interface prototypes, anonymous funcs, toplevel reset ---------------


GO_IFACE = (
    'import "fmt"\n'
    "\n"
    "type Store interface {\n"
    "\tGet(key string) (string, error)\n"
    "\tPut(key, val string) error\n"
    "\tio.Reader\n"
    "}\n"
    "\n"
    "func use(s Store) {\n"
    "\tcheck(s)\n"
    "}\n"
)


def test_go_interface_methods_are_decls_owned_by_interface():
    rows = _rows("go", GO_IFACE)
    assert ("method", "Get", "Store") in rows
    assert ("method", "Put", "Store") in rows
    # embedded interface (no paren) is not a member decl
    assert not any(r[1] == "Reader" for r in rows)


def test_go_interface_body_yields_no_calls():
    assert _calls("go", GO_IFACE) == [("check", "use")]


def test_go_anonymous_func_declarator():
    src = (
        "var handler = func(w, r int) int {\n"
        "\treturn serve(w)\n"
        "}\n"
        "\n"
        "func init() {\n"
        "\tretry := func() {\n"
        "\t\tping()\n"
        "\t}\n"
        "\tretry()\n"
        "}\n"
    )
    rows = _rows("go", src)
    assert ("function", "handler", "") in rows
    assert ("function", "retry", "") in rows
    assert ("serve", "handler") in _calls("go", src)
    assert ("ping", "retry") in _calls("go", src)


def test_go_toplevel_var_initializer_call_is_module_scope():
    src = (
        "func fn_a(x int) int {\n"
        "\treturn fn_b(x)\n"
        "}\n"
        "\n"
        "var registry = NewRegistry()\n"
    )
    assert _calls("go", src) == [("fn_b", "fn_a"), ("NewRegistry", "")]


# --- TS abstract prototypes + JS private members -----------------------------


def test_ts_abstract_prototype_is_a_method_decl_not_a_call():
    src = (
        "export abstract class Widget {\n"
        "  abstract render(): void;\n"
        "  abstract resize(w: number): number;\n"
        "}\n"
    )
    rows = _rows("javascript", src)
    assert ("method", "render", "Widget") in rows
    assert ("method", "resize", "Widget") in rows
    assert _calls("javascript", src) == []


def test_js_private_method_declares_and_owns_body_calls():
    src = (
        "class Cache {\n"
        "  #load(k) {\n"
        "    return fetchRow(k);\n"
        "  }\n"
        "  #evict = (k) => drop(k);\n"
        "  get(k) {\n"
        "    return this.#load(k);\n"
        "  }\n"
        "}\n"
    )
    rows = _rows("javascript", src)
    # bare names: a `this.#load()` call site also yields the bare name
    assert ("method", "load", "Cache") in rows
    assert ("method", "evict", "Cache") in rows
    assert ("fetchRow", "load") in _calls("javascript", src)
    assert ("load", "get") in _calls("javascript", src)


def test_js_shebang_is_not_a_comment_casualty():
    # dropping '#' from the JS comment probe must not create new leaks
    src = "#!/usr/bin/env node\nfunction main() {\n  run();\n}\n"
    assert _calls("javascript", src) == [("run", "main")]


# --- Rust enum variants -------------------------------------------------------


def test_rust_enum_tuple_variants_are_not_calls():
    src = (
        "pub enum Shape {\n"
        "    Circle(f64),\n"
        "    Rect { w: f64, h: f64 },\n"
        "    Point,\n"
        "}\n"
        "\n"
        "fn area(s: &Shape) -> f64 {\n"
        "    compute(s)\n"
        "}\n"
    )
    rows = _rows("rust", src)
    assert ("class", "Shape", "") in rows
    assert _calls("rust", src) == [("compute", "area")]
    # variants are not mentions either — the nominal type is the enum
    assert not any(r[1] == "Circle" for r in rows)


def test_rust_call_after_enum_closes_is_still_extracted():
    src = (
        "enum E {\n"
        "    A(u8),\n"
        "}\n"
        "fn f() {\n"
        "    go(1);\n"
        "}\n"
    )
    assert _calls("rust", src) == [("go", "f")]


# --- C++ destructors ----------------------------------------------------------


def test_cpp_destructor_inline_and_out_of_line():
    src = (
        "class Socket {\n"
        "public:\n"
        "    Socket(int fd);\n"
        "    ~Socket() { close_fd(fd_); }\n"
        "};\n"
        "\n"
        "Socket::~Socket() {\n"
        "    release(fd_);\n"
        "}\n"
    )
    rows = _rows("c", src)
    assert rows.count(("method", "~Socket", "Socket")) == 2
    calls = _calls("c", src)
    # no phantom `Socket` call from either destructor header
    assert not any(n == "Socket" for n, _ in calls)
    assert ("close_fd", "~Socket") in calls
    assert ("release", "~Socket") in calls


def test_cpp_defaulted_and_proto_destructors_are_silent():
    src = (
        "class Conn {\n"
        "    virtual ~Conn() = default;\n"
        "    ~Conn();\n"
        "};\n"
    )
    # ';'-terminated forms follow the _C_PROTO policy: no mention, no call
    assert _rows("c", src) == [("class", "Conn", "")]


# --- Java nested-class extents -------------------------------------------------


def test_java_method_after_nested_class_belongs_to_outer():
    src = (
        "public class Outer {\n"
        "    class Inner {\n"
        "        void inner_m() {\n"
        "            tick();\n"
        "        }\n"
        "    }\n"
        "\n"
        "    void outer_m() {\n"
        "        tock();\n"
        "    }\n"
        "}\n"
    )
    rows = _rows("java", src)
    assert ("method", "inner_m", "Inner") in rows
    assert ("method", "outer_m", "Outer") in rows


def test_java_truncated_class_extent_runs_to_chunk_end():
    # chunk boundary cut the class body: members still owned (the extent
    # runs to end-of-chunk, the shared cross-chunk-container envelope)
    src = (
        "class Partial {\n"
        "    void m(int a) {\n"
        "        work(a);\n"
        "    }\n"
    )
    assert ("method", "m", "Partial") in _rows("java", src)


def test_java_member_after_all_classes_close_is_ownerless():
    src = (
        "class Done {\n"
        "}\n"
        "    void stray(int a) {\n"
        "    }\n"
    )
    # ownerless → function fallback (no dangling has_method triple)
    assert ("function", "stray", "") in _rows("java", src)
