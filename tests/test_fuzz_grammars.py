"""Property-based fuzzing of the M1 extraction grammars (VERDICT r04 #4).

Round 4's adversarial program fuzzed the query/oracle contract; the
grammars themselves had only hand-written edge tests, and grammar regexes
were a top-3 defect class in the round-4 review passes.  This module
closes that gap with two seeded families per language:

1. **Recall family** — a generator draws declaration blocks from the
   grammar's *documented envelope* (the shapes each regex claims, incl.
   the round-5 modern-JS/TS ones) and renders source text while
   independently tracking the ground-truth mention set.  The generator IS
   the slow reference re-parse: it never consults the grammar's regexes,
   so a regex that silently stops matching a claimed shape fails here
   with a shrunken counterexample.

2. **Noise family** — hostile text built from decl keywords, regex
   metacharacters, quotes, braces, CJK and newlines in random order.  No
   ground truth exists for garbage, so the assertions are the kernel
   invariants: never crashes, mention rows are well-formed, entity names
   stay join-safe ([\\w.-]+, no embedded whitespace/newline — the ADVICE
   r04 ``\\Z`` fix), ``method`` mentions never dangle (owner != ''), and
   the downstream payload → schema-digest → triples pipeline accepts the
   output.

A third family pins call-site owner attribution for the owner-tracking
grammars (python via ``_calls``, javascript/rust/ruby via
``_calls_tracked``): bodies with known call sites must attribute each
call to the enclosing declaration the generator placed it under.

Pure Python (no Spark session), so examples are cheap; ``derandomize``
keeps the families seeded/reproducible per the round-5 ask.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapontologies_spark.functions.code_gazetteer import (
    TEXT_TERMS,
    chunk_payload,
    chunk_schema_digest,
    document_payload,
    document_schema,
    extract_mentions,
    triples_for_mentions,
)

_SETTINGS = dict(max_examples=60, deadline=None, derandomize=True)
_DECL_KINDS = ("function", "class", "method", "import")
_KINDS = frozenset((*_DECL_KINDS, "call", "term"))
_NAME_OK = re.compile(r"[\w.-]+\Z")


def _decls(lang: str, text: str):
    return sorted(
        (m["kind"], m["name"], m["owner"])
        for m in extract_mentions(lang, text)
        if m["kind"] in _DECL_KINDS
    )


# ---------------------------------------------------------------------------
# Recall family — generators know their own ground truth
# ---------------------------------------------------------------------------
# Each @st.composite generator returns (source_text, expected) where
# expected is the sorted (kind, name, owner) multiset of declaration-kind
# mentions the grammar MUST produce.  Bodies are paren-free on purpose so
# the decl comparison is exact (call recall has its own family below).


@st.composite
def _python_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 3))
        if shape == 0:
            blocks.append(f"import mod{i}")
            expected.append(("import", f"mod{i}", ""))
        elif shape == 1:
            form = draw(st.sampled_from((
                f"from pkg{i} import thing",
                f"from pkg{i}.sub.deep import thing",   # dotted path
                f"from .pkg{i} import thing",            # relative
                f"from ..pkg{i}.util import thing",
            )))
            blocks.append(form)
            expected.append(("import", f"pkg{i}", ""))
        elif shape == 2:
            base = draw(st.booleans())
            blocks.append(f"class Cls{i}" + ("(Base):" if base else ":"))
            expected.append(("class", f"Cls{i}", ""))
            for j in range(draw(st.integers(0, 2))):
                kw = draw(st.sampled_from(("def", "async def")))
                blocks.append(f"    {kw} meth{i}_{j}(self):")
                blocks.append("        pass")
                expected.append(("method", f"meth{i}_{j}", f"Cls{i}"))
        else:
            # coroutine defs and optional PEP 695 type-parameter lists
            kw = draw(st.sampled_from(("def", "async def")))
            tp = draw(st.sampled_from(("", "[T]", "[T: int, *Ts]")))
            blocks.append(f"{kw} fn{i}{tp}(a, b):")
            blocks.append("    pass")
            expected.append(("function", f"fn{i}", ""))
        if draw(st.booleans()):
            blocks.append(f"# comment {i} def class import")
    return "\n".join(blocks), sorted(expected)


@st.composite
def _javascript_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 7))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 13))
        if shape == 0:
            blocks.append(f"import mod{i} from 'mod{i}';")
            expected.append(("import", f"mod{i}", ""))
        elif shape == 1:
            blocks.append(f"import {{a{i}, b{i}}} from '@scope{i}/pkg';")
            expected.append(("import", f"scope{i}", ""))
        elif shape == 2:
            blocks.append(f"import * as ns{i} from './utils{i}/x.js';")
            expected.append(("import", f"utils{i}", ""))
        elif shape == 3:
            blocks.append(f"import 'side{i}';")
            expected.append(("import", f"side{i}", ""))
        elif shape == 4:
            blocks.append(f"import type {{T{i}}} from 'types{i}';")
            expected.append(("import", f"types{i}", ""))
        elif shape == 5:
            form = draw(st.sampled_from((
                f"const m{i} = require('req{i}');",
                f"export {{a{i}}} from 'req{i}';",
                f"export * from 'req{i}';",
            )))
            blocks.append(form)
            expected.append(("import", f"req{i}", ""))
        elif shape == 6:
            kw = draw(st.sampled_from(
                ("function", "export function", "export default function",
                 "export async function", "async function", "function*")))
            # <T> type-parameter clause (second round-5 wave) — not on
            # generators, where TS disallows it without a comma hint
            gen = "" if kw.endswith("*") else draw(
                st.sampled_from(("", "<T>", "<T, U extends object>",
                                 "<T extends Map<K, V>>")))
            blocks.append(f"{kw} fn{i}{gen}(x) {{}}")
            expected.append(("function", f"fn{i}", ""))
        elif shape == 7:
            kw = draw(st.sampled_from(("const", "let", "var", "export const")))
            arrow = draw(st.sampled_from(("(a, b) =>", "x =>", "async (u) =>")))
            blocks.append(f"{kw} fn{i} = {arrow} null;")
            expected.append(("function", f"fn{i}", ""))
        elif shape == 8:
            kw = draw(st.sampled_from(("const", "export var")))
            blocks.append(f"{kw} fn{i} = function (a) {{}};")
            expected.append(("function", f"fn{i}", ""))
        elif shape == 9:
            kw = draw(st.sampled_from(
                ("class", "export class", "export default class",
                 "export abstract class")))
            if draw(st.booleans()):
                blocks.append(f"{kw} Cls{i} {{}}")
            else:
                # class-body methods (round-5 envelope extension): with
                # optional TS modifiers and return-type annotation
                blocks.append(f"{kw} Cls{i} {{")
                for j in range(draw(st.integers(1, 2))):
                    member = draw(st.integers(0, 2))
                    if member == 0:
                        mods = draw(st.sampled_from(
                            ("", "static ", "async ", "private static ")))
                        gen = draw(st.sampled_from(("", "<T>")))
                        ann = draw(st.sampled_from(("", ": Promise<void>")))
                        blocks.append(f"  {mods}meth{i}_{j}{gen}(props){ann} {{")
                        blocks.append("  }")
                    elif member == 1:
                        # class-field arrow (second round-5 wave),
                        # optionally modifier-prefixed (static factories)
                        fmods = draw(st.sampled_from(
                            ("", "static ", "private readonly ")))
                        arrow = draw(st.sampled_from(
                            ("() =>", "async (e) =>", "x =>")))
                        blocks.append(f"  {fmods}meth{i}_{j} = {arrow} {{")
                        blocks.append("  };")
                    else:
                        # plain field initializers must NOT register
                        blocks.append(f"  meth{i}_{j}(props) {{")
                        blocks.append("  }")
                        blocks.append(f"  notafn{i}_{j} = 42;")
                    expected.append(("method", f"meth{i}_{j}", f"Cls{i}"))
                blocks.append("}")
            expected.append(("class", f"Cls{i}", ""))
        elif shape == 10:
            kw = draw(st.sampled_from(
                ("interface", "export interface", "declare interface")))
            blocks.append(f"{kw} Ifc{i} {{}}")
            expected.append(("class", f"Ifc{i}", ""))
        elif shape == 11:
            blocks.append(f"export type Ty{i} = string;")
            expected.append(("class", f"Ty{i}", ""))
        elif shape == 12:
            kw = draw(st.sampled_from(
                ("enum", "const enum", "export const enum", "declare enum")))
            blocks.append(f"{kw} En{i} {{}}")
            expected.append(("class", f"En{i}", ""))
        else:
            # non-declarations that must NOT register
            blocks.append(draw(st.sampled_from((
                f"const NOT{i} = (a + b) * c;",
                f"let plain{i} = 42;",
                f"// function ghost{i}(x) nothing — no paren-anchor",
                f"type_annotation{i}: string;",
            ))))
    return "\n".join(blocks), sorted(expected)


@st.composite
def _go_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 3))
        if shape == 0:
            if draw(st.booleans()):
                blocks.append(f'import "pkg{i}"')
                expected.append(("import", f"pkg{i}", ""))
            else:
                # gofmt grouped block, optionally aliased entries
                blocks.append("import (")
                for j in range(draw(st.integers(1, 2))):
                    alias = draw(st.sampled_from(("", "alias ", "_ ")))
                    blocks.append(f'    {alias}"grp{i}_{j}/sub"')
                    expected.append(("import", f"grp{i}_{j}", ""))
                blocks.append(")")
        elif shape == 1:
            recv = draw(st.sampled_from(("", f"(s *Srv{i}) ", f"(s Srv{i}) ")))
            # plain funcs may take go 1.18 type parameters; receiver
            # methods can't declare their own in go
            tp = "" if recv else draw(
                st.sampled_from(("", "[T any]", "[T any, U comparable]")))
            blocks.append(f"func {recv}Fn{i}{tp}(x int) int {{")
            blocks.append("  return x")
            blocks.append("}")
            if recv:
                # receiver method: owned by the receiver type (round 5)
                expected.append(("method", f"Fn{i}", f"Srv{i}"))
            else:
                expected.append(("function", f"Fn{i}", ""))
        elif shape == 2:
            tp = draw(st.sampled_from(("", "[T any]")))
            kind = draw(st.sampled_from(("struct", "interface")))
            blocks.append(f"type Typ{i}{tp} {kind} {{")
            blocks.append("}")
            expected.append(("class", f"Typ{i}", ""))
        else:
            blocks.append(f"// func ghost{i} in a comment")
    return "\n".join(blocks), sorted(expected)


@st.composite
def _java_src(draw):
    blocks = []
    n = draw(st.integers(1, 5))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 2))
        if shape == 0:
            stat = draw(st.sampled_from(("", "static ")))
            blocks.append(f"import {stat}seg{i}.util.Thing;")
        elif shape == 1:
            mods = draw(st.sampled_from(
                ("", "public ", "public final ", "protected abstract ",
                 "private static final ")))
            kind = draw(st.sampled_from(
                ("class", "interface", "enum", "record", "sealed class")))
            if kind == "record":
                # compact record header — fits the call shape, must still
                # be a decl (and never leak a phantom call)
                blocks.append(f"{mods}record Cls{i}(int a, int b) {{")
                blocks.append("}")
                continue
            blocks.append(f"{mods}{kind} Cls{i} {{")
            for j in range(draw(st.integers(0, 2))):
                mmods = draw(st.sampled_from(
                    ("public ", "protected static ", "private synchronized ",
                     "public final native ")))
                # optional <T> type-parameter clause (second round-5 wave);
                # the bounded form nests one level of generics
                tp = draw(st.sampled_from(
                    ("", "<T> ", "<K, V> ", "<T extends Comparable<T>> ")))
                rt = draw(st.sampled_from(
                    ("int", "List<String>", "Map<String, List<Integer>>",
                     "byte[]")))
                if draw(st.booleans()):
                    blocks.append(f"    {mmods}{tp}{rt} meth{i}_{j}(int a) {{")
                    blocks.append("    }")
                else:
                    # abstract/interface prototype — also a declaration
                    blocks.append(f"    {mmods}{tp}{rt} meth{i}_{j}(int a);")
            blocks.append("}")
        else:
            # ownerless indented method (class header landed in an earlier
            # chunk): 'function' fallback unless a class precedes it here —
            # the reference scan below attributes either way
            blocks.append(f"    public void orphan{i}(int a) {{")
            blocks.append("    }")
    # extent-aware attribution replayed independently: a member is owned
    # by the class whose braces still ENCLOSE it — an "orphan" method
    # rendered AFTER a class block closed is ownerless (function
    # fallback), per the wave-6 nested-extent semantics.  Every class
    # block this generator renders closes with a column-0 '}', so the
    # reference re-parse clears the open class on that line.
    src = "\n".join(blocks)
    out_expected = []
    last_cls = ""
    for ln in blocks:
        if ln.startswith("}"):
            last_cls = ""
            continue
        mcls = re.match(
            r"(?:(?:public|protected|private|abstract|final|static"
            r"|sealed|non-sealed)\s+)*"
            r"(?:class|interface|enum|record)\s+(\w+)", ln)
        if mcls:
            last_cls = mcls.group(1)
            out_expected.append(("class", last_cls, ""))
            continue
        mimp = re.match(r"import\s+(?:static\s+)?(\w+)", ln)
        if mimp:
            out_expected.append(("import", mimp.group(1), ""))
            continue
        mm = re.match(r"\s+(?:[\w<>,\[\] ]+\s+)*?(\w+)\s*\(int a\)\s*[{;]", ln)
        if mm and ("meth" in mm.group(1) or "orphan" in mm.group(1)):
            if last_cls:
                out_expected.append(("method", mm.group(1), last_cls))
            else:
                out_expected.append(("function", mm.group(1), ""))
    return src, sorted(out_expected)


@st.composite
def _rust_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 3))
        if shape == 0:
            vis = draw(st.sampled_from(("", "pub ", "pub(crate) ")))
            blocks.append(f"{vis}use crate{i}::module::Item;")
            expected.append(("import", f"crate{i}", ""))
        elif shape == 1:
            vis = draw(st.sampled_from(("", "pub ")))
            kw = draw(st.sampled_from(("struct", "enum", "trait", "mod")))
            blocks.append(f"{vis}{kw} Typ{i} {{")
            blocks.append("}")
            expected.append(("class", f"Typ{i}", ""))
        elif shape == 2:
            if draw(st.booleans()):
                mods = draw(st.sampled_from(
                    ("", "pub ", "pub async ", "pub(crate) unsafe ",
                     "const ", 'extern "C" ')))
                blocks.append(f"{mods}fn fn{i}(x: u64) -> u64 {{")
                blocks.append("    x")
                blocks.append("}")
            else:
                # macro definition: function-kind decl, callable as name!()
                blocks.append(f"macro_rules! fn{i} {{")
                blocks.append("    ($x:expr) => { $x };")
                blocks.append("}")
            expected.append(("function", f"fn{i}", ""))
        else:
            tgt = f"Impl{i}"
            hdr = draw(st.sampled_from(
                (f"impl {tgt} {{", f"impl fmt::Display for {tgt} {{",
                 f"impl<T> From<T> for {tgt} {{")))
            blocks.append(hdr)
            for j in range(draw(st.integers(1, 2))):
                blocks.append(f"    fn meth{i}_{j}(&self) {{")
                blocks.append("    }")
                expected.append(("method", f"meth{i}_{j}", tgt))
            blocks.append("}")
    return "\n".join(blocks), sorted(expected)


@st.composite
def _ruby_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 3))
        if shape == 0:
            blocks.append(f"require 'gem{i}/sub'")
            expected.append(("import", f"gem{i}", ""))
        elif shape == 1:
            kw = draw(st.sampled_from(("class", "module")))
            blocks.append(f"{kw} Cls{i}")
            expected.append(("class", f"Cls{i}", ""))
            for j in range(draw(st.integers(0, 2))):
                recv = draw(st.sampled_from(("", "self.")))
                blocks.append(f"  def {recv}meth{i}_{j}")
                blocks.append("  end")
                expected.append(("method", f"meth{i}_{j}", f"Cls{i}"))
            blocks.append("end")
        elif shape == 2:
            blocks.append(f"def fn{i}")
            blocks.append("end")
            expected.append(("function", f"fn{i}", ""))
        else:
            blocks.append(f"# def ghost{i} in comment")
    return "\n".join(blocks), sorted(expected)


@st.composite
def _c_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 4))
        if shape == 0:
            form = draw(st.sampled_from(
                (f"#include <hdr{i}.h>", f'#include "sub/hdr{i}.hpp"')))
            blocks.append(form)
            expected.append(("import", f"hdr{i}", ""))
        elif shape == 1:
            kw = draw(st.sampled_from(("struct", "class")))
            suffix = draw(st.sampled_from((" {", " : public Base {")))
            blocks.append(f"{kw} Typ{i}{suffix}")
            if draw(st.booleans()):
                # inline member after an access specifier: the column-0
                # `public:` line must not strip the member's owner
                blocks.append("public:")
                blocks.append(f"    void memb{i}(int v) {{")
                blocks.append("    }")
                expected.append(("method", f"memb{i}", f"Typ{i}"))
            blocks.append("};")
            expected.append(("class", f"Typ{i}", ""))
        elif shape == 2:
            rt = draw(st.sampled_from(("void", "int", "static long",
                                       "const char *")))
            blocks.append(f"{rt} fn{i}(int x) {{")
            blocks.append("}")
            expected.append(("function", f"fn{i}", ""))
        elif shape == 3:
            blocks.append(f"int Own{i}::meth{i}(void) {{")
            blocks.append("}")
            expected.append(("method", f"meth{i}", f"Own{i}"))
        else:
            # prototype: neither a mention nor a call
            blocks.append(f"void proto{i}(int a);")
    return "\n".join(blocks), sorted(expected)


@st.composite
def _json_src(draw):
    parts, expected = [], []
    n = draw(st.integers(1, 5))
    for i in range(n):
        key = f"sec{i}"
        expected.append(("class", key, ""))
        if draw(st.booleans()):
            children = [f"k{i}_{j}" for j in range(draw(st.integers(1, 3)))]
            inner = ", ".join(f'"{c}": {j}' for j, c in enumerate(children))
            parts.append(f'"{key}": {{{inner}}}')
            expected.extend(("method", c, key) for c in children)
        else:
            parts.append(f'"{key}": {i}')
    return "{" + ", ".join(parts) + "}", sorted(expected)


@st.composite
def _yaml_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 5))
    for i in range(n):
        sec = f"sec{i}"
        blocks.append(f"{sec}:")
        expected.append(("class", sec, ""))
        for j in range(draw(st.integers(0, 3))):
            key = f"k{i}_{j}"
            form = draw(st.sampled_from(
                (f"  {key}: {j}", f"  - {key}: {j}", f"\t{key}: val")))
            blocks.append(form)
            expected.append(("method", key, sec))
        if draw(st.booleans()):
            blocks.append(f"# comment: not{i}: a: key")  # '#' != word char,
            # but 'not{i}'/'a' WOULD match… keep comments colon-free:
            blocks[-1] = f"# plain comment {i}"
    return "\n".join(blocks), sorted(expected)


@st.composite
def _toml_src(draw):
    blocks, expected = [], []
    for j in range(draw(st.integers(0, 2))):
        blocks.append(f"top{j} = {j}")
        expected.append(("class", f"top{j}", ""))
    n = draw(st.integers(1, 4))
    for i in range(n):
        sec = f"sec{i}"
        form = draw(st.sampled_from((f"[{sec}]", f"[[{sec}]]", f"[ {sec} ]")))
        blocks.append(form)
        expected.append(("class", sec, ""))
        for j in range(draw(st.integers(0, 3))):
            blocks.append(f"k{i}_{j} = \"v\"")
            expected.append(("method", f"k{i}_{j}", sec))
    return "\n".join(blocks), sorted(expected)


@st.composite
def _shell_src(draw):
    blocks, expected = [], []
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            blocks.append("")  # blank separator — regression surface
            # for the \\s*-crosses-newline indent-capture bug
        shape = draw(st.integers(0, 3))
        if shape == 0:
            form = draw(st.sampled_from(
                (f"source lib/mod{i}.sh", f". ./mod{i}.sh",
                 f"source 'mod{i}.bash'")))
            blocks.append(form)
            expected.append(("import", f"mod{i}", ""))
        elif shape == 1:
            form = draw(st.sampled_from(
                (f"fn{i}() {{", f"function fn{i} {{", f"function fn{i}() {{")))
            blocks.append(form)
            blocks.append("  echo hi")
            blocks.append("}")
            expected.append(("function", f"fn{i}", ""))
        else:
            blocks.append(f"VAR{i}=$(date)")  # $() must not register
    return "\n".join(blocks), sorted(expected)


_RECALL = {
    "python": _python_src(),
    "javascript": _javascript_src(),
    "go": _go_src(),
    "java": _java_src(),
    "rust": _rust_src(),
    "ruby": _ruby_src(),
    "c": _c_src(),
    "json": _json_src(),
    "yaml": _yaml_src(),
    "toml": _toml_src(),
    "shell": _shell_src(),
}


def _mk_recall_test(lang, strat):
    @settings(**_SETTINGS)
    @given(strat)
    def test(case):
        src, expected = case
        assert _decls(lang, src) == expected, src
    test.__name__ = f"test_recall_{lang}"
    return test


for _lang, _strat in _RECALL.items():
    globals()[f"test_recall_{_lang}"] = _mk_recall_test(_lang, _strat)


@settings(**_SETTINGS)
@given(st.lists(
    st.sampled_from(TEXT_TERMS + ("the", "quick", "analysis", "join2",
                                  "2join", "joins", "rejoin", "JOIN")),
    min_size=0, max_size=20))
def test_recall_text_terms(words):
    # ASCII \b: exactly the tokens equal to a gazetteer term match
    # (case-sensitive; join2/2join/joins/rejoin share no word boundary)
    src = " ".join(words)
    got = [m["name"] for m in extract_mentions("text", src)]
    assert got == [w for w in words if w in TEXT_TERMS]


def test_json_root_array_fallback():
    # ADVICE r04: root-array docs used to yield nothing
    src = '[{"alpha": 1, "beta": 2}, {"gamma": 3}]'
    assert _decls("json", src) == sorted(
        [("function", "alpha", ""), ("function", "beta", ""),
         ("function", "gamma", "")]
    )


# ---------------------------------------------------------------------------
# Noise family — kernel invariants on hostile input
# ---------------------------------------------------------------------------

_NOISE_PIECES = st.sampled_from([
    "def ", "class ", "function ", "export ", "import ", "fn ", "impl ",
    "func ", "require", "interface ", "enum ", "type ", "const ", "=>",
    "(", ")", "{", "}", "[", "]", "::", ":", "=", ";", ",", ".",
    "'", '"', "`", "\\", "\\n", "\n", "\n\n", "\t", "  ", " ",
    "#", "//", "/*", "*/", "--", "->", "$", "%", "*", "?", "|", "^",
    "foo", "Bar_9", "x", "_", "-", "0", "的函数", "🚀", "é",
    "name\n", "a: b", "- k:", "[sec]", '#include <x.h>', "self.",
    "", "NA",
])
_NOISE_TEXT = st.lists(_NOISE_PIECES, min_size=0, max_size=40).map("".join)

_ALL_LANGS = tuple(_RECALL) + ("text", "markdown", "docker", "make")


@settings(**_SETTINGS)
@given(st.sampled_from(_ALL_LANGS), _NOISE_TEXT)
def test_noise_invariants(lang, text):
    ms = extract_mentions(lang, text)
    for m in ms:
        assert set(m) == {"kind", "name", "owner"}
        assert m["kind"] in _KINDS
        # join-safe entity ids: the \Z fix means no embedded newline /
        # whitespace ever survives into a name or owner
        assert _NAME_OK.match(m["name"]), repr(m)
        assert m["owner"] == "" or _NAME_OK.match(m["owner"]), repr(m)
        if m["kind"] == "method":
            assert m["owner"] != "", repr(m)  # never a dangling has_method
    # downstream kernel accepts whatever the grammar emitted
    payload = chunk_payload(ms)
    chunk_schema_digest(payload)
    triples = triples_for_mentions("repo/p.x", ms)
    for subj, pred, obj, _rt in triples:
        assert "\n" not in subj and "\n" not in obj


@settings(**_SETTINGS)
@given(st.sampled_from(_ALL_LANGS), _NOISE_TEXT, st.sampled_from((64, 1024)))
def test_noise_document_pipeline(lang, text, chunk_bytes):
    # full per-document path (chunker included) never raises and the
    # payload/schema are stable across repeat evaluation
    p1 = document_payload(lang, text, chunk_bytes=chunk_bytes)
    p2 = document_payload(lang, text, chunk_bytes=chunk_bytes)
    assert p1 == p2
    s1 = document_schema(lang, text, chunk_bytes=chunk_bytes)
    assert isinstance(s1, dict)


# ---------------------------------------------------------------------------
# Call-attribution family — owner tracking under fuzzed layouts
# ---------------------------------------------------------------------------


@st.composite
def _calls_case(draw, lang):
    blocks, expected = [], []
    current = ""
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            fn = f"fn{i}"
            if lang == "python":
                blocks.append(f"def {fn}(x):")
            elif lang == "javascript":
                blocks.append(draw(st.sampled_from((
                    f"export function {fn}(x) {{",
                    f"const {fn} = (x) =>",
                    f"async function {fn}(x) {{"))))
            elif lang == "rust":
                blocks.append(f"fn {fn}(x: u8) {{")
            else:  # ruby
                blocks.append(f"def {fn}")
            current = fn
        for j in range(draw(st.integers(0, 2))):
            callee = f"callee{i}_{j}"
            if lang == "python":
                blocks.append(f"    r = {callee}(x)")
            elif lang == "javascript":
                blocks.append(f"  {callee}(x);")
            elif lang == "rust":
                blocks.append(f"    {callee}(x);")
            else:
                blocks.append(f"  {callee}(1)")
            expected.append((callee, current))
    return "\n".join(blocks), expected


def _mk_calls_test(lang):
    @settings(**_SETTINGS)
    @given(_calls_case(lang))
    def test(case):
        src, expected = case
        got = [(m["name"], m["owner"])
               for m in extract_mentions(lang, src) if m["kind"] == "call"]
        assert got == expected, src
    test.__name__ = f"test_calls_{lang}"
    return test


for _lang in ("python", "javascript", "rust", "ruby"):
    globals()[f"test_calls_{_lang}"] = _mk_calls_test(_lang)


def test_blank_line_never_becomes_indent():
    # regression: ^(\s*) with re.M let the indent capture start at the
    # BLANK LINE above a column-0 declaration ("\n" is \s), so a top-level
    # `def main()` after a class was attributed as that class's method —
    # in python, rust (fn after impl), ruby (def after class) and c
    # (fn after struct) alike.
    py = "class App:\n    def run(self):\n        pass\n\ndef main():\n    pass\n"
    assert ("function", "main", "") in _decls("python", py)
    assert ("method", "main", "App") not in _decls("python", py)

    rs = "impl Graph {\n    fn node(&self) {}\n}\n\nfn free() {}\n"
    assert ("function", "free", "") in _decls("rust", rs)

    rb = "class Api\n  def get\n  end\nend\n\ndef helper\nend\n"
    assert ("function", "helper", "") in _decls("ruby", rb)

    c = "struct S {\n};\n\nvoid free_fn(int x) {\n}\n"
    assert ("function", "free_fn", "") in _decls("c", c)


def test_comment_lines_never_yield_calls():
    # round-5: lines STARTING with a comment marker leaked bogus calls in
    # every grammar (`# see foo(x)`, `// retry bar(1)`, JSDoc ` * baz(y)`,
    # `/* function ghost(x) { */`); decl anchors were already immune
    cases = {
        ("python", "# see foo(x) for details\nbar(1)\n"): [("bar", "")],
        ("go", "// helper(x) usage\nrender(w)\n"): [("render", "")],
        ("java", "    // init(x)\n    run(y);\n"): [("run", "")],
        ("rust", "// spawn(x)\nemit(1);\n"): [("emit", "")],
        ("ruby", "# call me(1)\nping(2)\n"): [("ping", "")],
        ("javascript",
         "/* function ghost(x) { */\n * @see baz(y)\nreal(1);\n"): [("real", "")],
        ("c", "// pool_free(p) cleanup\nvoid f(int x) {\n  use(x);\n}\n"):
            [("use", "f")],
    }
    for (lang, src), want in cases.items():
        got = [(m["name"], m["owner"])
               for m in extract_mentions(lang, src) if m["kind"] == "call"]
        assert got == want, (lang, src, got)
    # a call-argument continuation line (`*args)`) is NOT a JSDoc line
    src = "def f(x):\n    g(\n        *args)\n"
    names = [m["name"] for m in extract_mentions("python", src)
             if m["kind"] == "call"]
    assert names == ["g"]


def test_string_literals_never_yield_calls():
    # round-5: call-shaped text inside single-line string literals is
    # prose ('log("retry fetch(url)")' must not mint a fetch edge);
    # escape-aware spans, backtick templates included; a genuine call on
    # the same line still registers
    cases = {
        ("python", 'def f(x):\n    log("retry fetch(url) now")\n'): ["log"],
        ("javascript", 'function f(x) {\n  send("use run(a) here");\n}\n'):
            ["send"],
        ("c", 'void f(int x) {\n  puts("use free(p)");\n  emit(x);\n}\n'):
            ["puts", "emit"],
        ("go", 'func f(x int) {\n  say(`raw tick(1)`)\n}\n'): ["say"],
        ("ruby", "def f\n  warn('do ping(1)')\n  pong(2)\nend\n"):
            ["warn", "pong"],
        ("python", 'def f(x):\n    s = "a \\" b(c)"\n    real(1)\n'):
            ["real"],
        ("python", 'def f(x):\n    g("arg")\n'): ["g"],
    }
    for (lang, src), want in cases.items():
        got = [m["name"] for m in extract_mentions(lang, src)
               if m["kind"] == "call"]
        assert got == want, (lang, src, got)


def test_block_mask_is_document_level_across_chunks():
    # a docstring straddling a chunk boundary must not let the orphan
    # closer blank real code in the next chunk (document-level pairing),
    # and doctest/commented-out decls never extract
    from scrapontologies_spark.functions.code_gazetteer import document_triples

    body = "\n".join(f"docstring filler line {i}" for i in range(40))
    src = (
        '"""Module docs.\n' + body + "\n"
        ">>> ghost_call(1)\n"
        "def ghost(x):\n"
        '"""\n'
        "\n"
        "def real(x):\n"
        "    return x\n"
    )
    # chunk_bytes small enough that the docstring spans several chunks
    triples = document_triples("r", "m.py", "python", src, chunk_bytes=256)
    objs = {o for _, _, o, _ in triples}
    assert "r/m.py::real" in objs
    assert "r/m.py::ghost" not in objs
    assert "r/m.py::ghost_call" not in objs

    js = (
        "/*\n" + body + "\n"
        "export function dead(x) { gone(x); }\n"
        "*/\n"
        "export function live(x) {}\n"
    )
    triples = document_triples("r", "m.js", "javascript", js, chunk_bytes=256)
    objs = {o for _, _, o, _ in triples}
    assert "r/m.js::live" in objs
    assert "r/m.js::dead" not in objs and "r/m.js::gone" not in objs


def test_mask_preserves_sha_and_strings_keep_blocks_open():
    from scrapontologies_spark.functions.code_gazetteer import (
        _mask_block_spans,
        chunk_text,
        chunk_text_masked,
    )

    src = 'const p = "/*";\nfunction keep(x) {}\n/* dead */\nreal(1);\n'
    masked = _mask_block_spans(src, "javascript")
    assert len(masked) == len(src)           # offsets preserved
    assert masked.count("\n") == src.count("\n")
    assert "dead" not in masked and "keep" in masked
    # original chunks are byte-identical to plain chunking (sha invariant)
    plain = chunk_text(src, 32)
    trip = chunk_text_masked(src, "javascript", 32)
    assert [(c, t) for c, t, _ in trip] == plain


# ---------------------------------------------------------------------------
# Wave-8 family — multi-line string payloads never leak mentions
# ---------------------------------------------------------------------------

# decl/call-shaped lines placed INSIDE a multi-line string: each would
# mint a mention if the mask missed the span.  None contain the closing
# delimiter of any wrapper below.
_PAYLOAD_LINES = st.sampled_from([
    "def ghost(x): pass",
    "function ghost(x) { gone(1); }",
    "func ghost() {}",
    "fn ghost() {}",
    "class Ghost:",
    "void ghost(int x) {",
    "SELECT count(*) FROM t",
    "  retry(3) wraps call(target)",
    "import ghostmod",
])


def _real_decl(lang, i):
    # one genuine declaration per language + its expected mention row
    return {
        "python": (f"def live{i}(x):\n    return x", ("function", f"live{i}", "")),
        "javascript": (f"export function live{i}(x) {{\n  return x;\n}}",
                       ("function", f"live{i}", "")),
        "go": (f"func live{i}(x int) int {{\n\treturn x\n}}",
               ("function", f"live{i}", "")),
        "java": (f"class Live{i} {{\n}}", ("class", f"Live{i}", "")),
        "rust": (f"fn live{i}() -> u32 {{\n    1\n}}",
                 ("function", f"live{i}", "")),
        "ruby": (f"def live{i}\n  1\nend", ("function", f"live{i}", "")),
        "c": (f"int live{i}(void) {{\n    return 1;\n}}",
              ("function", f"live{i}", "")),
        "shell": (f"live{i}() {{\n  echo hi\n}}",
                  ("function", f"live{i}", "")),
    }[lang]


def _wrap_string(lang, body, rng_pick):
    # every multi-line string form wave 8 masks, per language.  A
    # continuation string needs EVERY interior newline escaped (an
    # unescaped one ends the literal — anything after it is live code,
    # correctly outside the mask).
    cont = body.replace("\n", " \\\n")
    forms = {
        "python": [
            "s = '''\n%s\n'''" % body,
            's = """\n%s\n"""' % body,
            "s = 'head \\\n%s'" % cont.replace("'", ""),
        ],
        "javascript": [
            "const s = `\n%s\n`;" % body,
            'const s = "head \\\n%s";' % cont.replace('"', ""),
        ],
        "go": ["var s = `\n%s\n`" % body],
        "java": ['String s = """\n%s\n""";' % body],
        "rust": ['let s = r#"\n%s\n"#;' % body.replace('"#', ""),
                 'let s = r"\n%s\n";' % body.replace('"', "")],
        "ruby": [
            "s = <<~GHOSTTAG\n%s\nGHOSTTAG" % body,
            "s = <<-GHOSTTAG\n%s\nGHOSTTAG" % body,
            "s = <<'GHOSTTAG'\n%s\nGHOSTTAG" % body.replace("'", ""),
            "=begin\n%s\n=end" % body,
        ],
        "c": ['const char *s = "head \\\n%s";' % cont.replace('"', "")],
        "shell": [
            "cat <<GHOSTTAG\n%s\nGHOSTTAG" % body,
            "cat <<'GHOSTTAG'\n%s\nGHOSTTAG" % body.replace("'", ""),
        ],
    }[lang]
    return forms[rng_pick % len(forms)]


@st.composite
def _string_payload_case(draw):
    lang = draw(st.sampled_from(
        ("python", "javascript", "go", "java", "rust", "ruby", "c",
         "shell")))
    payload = "\n".join(draw(st.lists(_PAYLOAD_LINES, min_size=1, max_size=4)))
    wrapper = _wrap_string(lang, payload, draw(st.integers(0, 7)))
    before, b_row = _real_decl(lang, draw(st.integers(0, 9)))
    after, a_row = _real_decl(lang, 10 + draw(st.integers(0, 9)))
    src = f"{before}\n{wrapper}\n{after}\n"
    expected = [b_row, a_row]
    if lang == "java":
        # the wrapper's field must live inside a class for realism-free
        # simplicity we leave it top-level: the grammar only anchors
        # methods on indented lines, so the bare field line is inert
        pass
    return lang, src, expected


@settings(**_SETTINGS)
@given(_string_payload_case())
def test_string_payloads_never_leak(case):
    lang, src, expected = case
    rows = _decls(lang, src)
    # no ghost mention of any kind, in any position
    names = {m["name"] for m in extract_mentions(lang, src)}
    assert "ghost" not in names and "Ghost" not in names, src
    assert "gone" not in names and "count" not in names, src
    assert "ghostmod" not in names, src
    # the real declarations around the string still extract
    for row in expected:
        assert row in rows, (src, rows)
