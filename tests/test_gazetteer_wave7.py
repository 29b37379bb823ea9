"""Round-5 wave-7 grammar shapes (the fourth shape-probe batch): SCOPE
EXTENTS for the three grammars that still attributed members by "nearest
preceding declaration", plus C++ constructors.

- Python: a full indent-scope stack (one line walk emits decls AND
  calls).  Fixes: a def nested in a function is a closure, not a method
  of an earlier class; a class-body statement's calls are not owned by
  the previous module-level def; `return inner(3)` after a nested def
  belongs to the OUTER def; nested (indented) classes exist at all.
- JavaScript/TypeScript: method-shaped members after a class closed
  (object-literal methods) are no longer owned by the stale class.
- C/C++: inline members after a class closed (namespace helpers) are no
  longer owned by the stale class; constructors — no return type, so
  `Socket::Socket(…) {` was an ownerless 'function' and
  `Socket() = default;` / in-class prototypes minted a phantom call.

Reference parity target: the reference's per-page LLM extraction reads
every declaration on the page (parsers/pdf_parser.py:396-416) with its
enclosing container in view, so ownership fidelity is part of the
extraction contract, not a nicety.
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


def _decls(lang, text):
    return [(m["kind"], m["name"], m["owner"])
            for m in extract_mentions(lang, text) if m["kind"] != "call"]


# --- Python: indent-scope stack ---------------------------------------------


def test_python_nested_def_is_closure_not_method():
    src = (
        "class Config:\n"
        "    def label(self):\n"
        "        return fmt(self)\n"
        "\n"
        "def outer():\n"
        "    def inner(x):\n"
        "        return x\n"
        "    return inner(3)\n"
    )
    rows = _decls("python", src)
    # inner is a closure of outer, NOT a method of the earlier Config
    assert ("function", "inner", "") in rows
    assert ("method", "inner", "Config") not in rows
    # and the call to inner() belongs to outer, not to inner itself
    assert ("inner", "outer") in _calls("python", src)


def test_python_class_body_statement_not_owned_by_previous_def():
    src = (
        "def setup():\n"
        "    return init()\n"
        "\n"
        "class A:\n"
        "    x = compute()\n"
    )
    assert _calls("python", src) == [
        ("init", "setup"),
        ("compute", ""),   # class-body statement — pre-wave-7: `setup`
    ]


def test_python_nested_class_visible_and_owns_members():
    src = (
        "class Outer:\n"
        "    class Inner:\n"
        "        def a(self):\n"
        "            return h1()\n"
        "    def b(self):\n"
        "        return h2()\n"
    )
    rows = _decls("python", src)
    assert ("class", "Inner", "") in rows          # was invisible (col-0 anchor)
    assert ("method", "a", "Inner") in rows        # innermost scope
    assert ("method", "b", "Outer") in rows        # Inner's extent closed
    assert _calls("python", src) == [("h1", "a"), ("h2", "b")]


def test_python_def_nested_in_method_is_closure():
    src = (
        "class A:\n"
        "    def m(self):\n"
        "        def helper():\n"
        "            return probe()\n"
        "        return helper()\n"
    )
    rows = _decls("python", src)
    assert ("function", "helper", "") in rows      # innermost scope is a def
    assert _calls("python", src) == [("probe", "helper"), ("helper", "m")]


def test_python_module_lambda_does_not_own_following_calls():
    # a same-indent statement pops the lambda's scope immediately
    src = (
        "norm = lambda s: s.strip()\n"
        "result = run(norm)\n"
    )
    assert _calls("python", src) == [("run", "")]


def test_python_black_style_closer_does_not_pop():
    src = (
        "def f(\n"
        "    a,\n"
        "    b,\n"
        "):\n"
        "    return g(a)\n"
    )
    assert _calls("python", src) == [("g", "f")]


def test_python_conditional_method_still_owned():
    src = (
        "class A:\n"
        "    if FLAG:\n"
        "        def m(self):\n"
        "            return h()\n"
    )
    assert ("method", "m", "A") in _decls("python", src)
    assert _calls("python", src) == [("h", "m")]


# --- JavaScript/TypeScript: class extents ------------------------------------


def test_js_object_literal_method_after_class_is_ownerless():
    src = (
        "export class A {\n"
        "  run() {\n"
        "    return step();\n"
        "  }\n"
        "}\n"
        "export const obj = {\n"
        "  get(url) {\n"
        "    return fetch(url);\n"
        "  },\n"
        "};\n"
    )
    rows = _decls("javascript", src)
    assert ("method", "run", "A") in rows
    assert ("function", "get", "") in rows     # pre-wave-7: method of A
    assert ("method", "get", "A") not in rows


def test_js_class_expression_members_fall_to_enclosing_extent():
    # a named class EXPRESSION (`inner = class Inner {`) is not a
    # statement-position declaration, so it opens no extent — declared
    # envelope: its members belong to the innermost enclosing extent
    # (here Outer), and `b` after the expression closes stays on Outer
    src = (
        "class Outer {\n"
        "  inner = class Inner {\n"
        "    a() { return 1; }\n"
        "  };\n"
        "  b() { return 2; }\n"
        "}\n"
    )
    rows = _decls("javascript", src)
    assert ("method", "a", "Outer") in rows
    assert ("method", "b", "Outer") in rows


# --- C/C++: class extents + constructors -------------------------------------


def test_c_indented_function_after_class_is_ownerless():
    src = (
        "class A {\n"
        " public:\n"
        "  int m() { return probe(); }\n"
        "};\n"
        "\n"
        "namespace util {\n"
        "    inline int helper(int x) {\n"
        "        return x;\n"
        "    }\n"
        "}\n"
    )
    rows = _decls("c", src)
    assert ("method", "m", "A") in rows
    assert ("function", "helper", "") in rows  # pre-wave-7: method of A
    assert ("method", "helper", "A") not in rows


def test_cpp_out_of_line_constructor_is_method():
    src = (
        "Socket::Socket(const char* host) {\n"
        "  resolve(host);\n"
        "}\n"
    )
    rows = _rows("c", src)
    assert ("method", "Socket", "Socket") in rows   # was ('function', '', …)
    assert ("call", "resolve", "Socket") in rows
    # a qualified METHOD must not fit the ctor backref
    src2 = "void Socket::read(int n) {\n  recv(n);\n}\n"
    assert ("method", "read", "Socket") in _rows("c", src2)


def test_cpp_inline_constructor_with_init_list():
    src = (
        "struct Point {\n"
        "  Point(int x) : x_(x) {\n"
        "    clamp(x);\n"
        "  }\n"
        "};\n"
    )
    rows = _rows("c", src)
    assert ("method", "Point", "Point") in rows
    assert ("call", "clamp", "Point") in rows
    # the ctor header itself must not leak a call
    assert ("call", "Point", "") not in rows


def test_cpp_defaulted_and_prototype_ctors_silent():
    src = (
        "class Socket {\n"
        " public:\n"
        "  Socket() = default;\n"
        "  Socket(const Socket&) = delete;\n"
        "  explicit Socket(const char* host);\n"
        "};\n"
    )
    rows = _rows("c", src)
    # no mention (the _C_PROTO policy) and — the wave-7 fix — no phantom call
    assert all(r[0] != "call" for r in rows), rows
    assert rows == [("class", "Socket", "")]


def test_cpp_ctor_name_must_match_enclosing_class():
    # a call statement inside a member body must NOT be silenced by the
    # ctor-prototype rule when the name differs from the class
    src = (
        "class Widget {\n"
        " public:\n"
        "  void refresh() {\n"
        "    redraw();\n"
        "  }\n"
        "};\n"
    )
    assert ("redraw", "refresh") in _calls("c", src)
