"""Deterministic synthetic source-code corpus (BASELINE.json ``input_hint``).

Schema: ``corpus(repo string, path string, commit string, lang string,
content string)`` — the engine's only large input.  Generation is seeded and
wall-clock-free (FIXTURES.md §1): content is template-drawn from a fixed
gazetteer vocabulary so the expected mention set of every row is computable
exactly by the same pure functions the tests use.

Skew is generated on purpose: one mega-repo holds ~30% of all files, to
exercise salting/AQE in the link stage exactly as SURVEY §4 requires.

Scale note: the generator builds rows driver-side only for test scales; for
bench scales it parallelizes via ``spark.range`` + ``mapInPandas`` so corpus
materialization itself is distributed (no driver bottleneck at sf-bench).
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator, List, Tuple

import pandas as pd

LANGS = ("python", "javascript", "go", "java", "markdown")
# Gazetteer vocabulary (fixed — expected mentions derive from these)
N_FUNCS = 40
N_CLASSES = 12
N_MODS = 20

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

_EXT = {"python": "py", "javascript": "js", "go": "go", "java": "java", "markdown": "md"}


def _commit_for(repo: str, path: str, seed: int) -> str:
    return hashlib.sha256(f"{repo}:{path}:{seed}".encode()).hexdigest()[:40]


def _gen_python(rng: random.Random) -> str:
    lines: List[str] = []
    for _ in range(rng.randint(1, 3)):
        m = rng.randrange(N_MODS)
        style = rng.random()
        if style < 0.4:
            lines.append(f"import mod_{m}")
        elif style < 0.8:
            lines.append(f"from mod_{m} import fn_{rng.randrange(N_FUNCS)}")
        else:
            # dotted from-import names the root package (third round-5
            # wave: `from collections.abc import …` matched nothing)
            lines.append(f"from mod_{m}.sub import fn_{rng.randrange(N_FUNCS)}")
    lines.append("")
    if rng.random() < 0.3:
        # docstring with decl-shaped content: the block mask must keep
        # doctest examples out of the extraction (round-5 envelope)
        lines.append('"""Module docs.')
        lines.append(f">>> fn_{rng.randrange(N_FUNCS)}(1)")
        lines.append(f"def ghost_{rng.randrange(99)}(x):")
        lines.append('"""')
        lines.append("")
    for _ in range(rng.randint(1, 5)):
        f = rng.randrange(N_FUNCS)
        if rng.random() < 0.15:
            # lambda declarator (fourth round-5 wave)
            lines.append(f"fn_{f} = lambda x: fn_{rng.randrange(N_FUNCS)}(x)")
            lines.append("")
            continue
        # async coroutines were invisible until the third round-5 wave —
        # keep them in the draw so throughput covers asyncio-style files
        kw = "async def" if rng.random() < 0.2 else "def"
        lines.append(f"{kw} fn_{f}(x):")
        if rng.random() < 0.2:
            # nested def — a closure, owned by nothing (wave-7 scoping:
            # previously minted as a method of whatever class came before)
            lines.append(f"    def fn_{rng.randrange(N_FUNCS)}(y):")
            lines.append("        return y")
        for _ in range(rng.randint(1, 3)):
            lines.append(f"    y = fn_{rng.randrange(N_FUNCS)}(x)")
        lines.append("    return y")
        lines.append("")
    if rng.random() < 0.6:
        c = rng.randrange(N_CLASSES)
        lines.append(f"class Cls_{c}:")
        if rng.random() < 0.2:
            # class-body statement — its call belongs to module scope,
            # not the previous def (wave-7 canary)
            lines.append(f"    cfg = fn_{rng.randrange(N_FUNCS)}(1)")
        if rng.random() < 0.15:
            # nested class + member — invisible before wave 7
            inner = rng.randrange(N_CLASSES)
            lines.append(f"    class Cls_{inner}:")
            lines.append(f"        def fn_{rng.randrange(N_FUNCS)}(self):")
            lines.append("            return self")
        for _ in range(rng.randint(1, 3)):
            f = rng.randrange(N_FUNCS)
            lines.append(f"    def fn_{f}(self):")
            lines.append(f"        return fn_{rng.randrange(N_FUNCS)}(self)")
        lines.append("")
    if rng.random() < 0.4:
        # module-level statement after defs — the wave-6 owner-reset
        # canary (a dedent-blind tracker hands this call to the last def)
        lines.append(f"cfg_{rng.randrange(9)} = fn_{rng.randrange(N_FUNCS)}(0)")
        lines.append("")
    if rng.random() < 0.1:
        # backslash-continuation string (wave 8) — its tail line is
        # string DATA, not a declaration
        lines.append(f"banner_{rng.randrange(9)} = 'usage: \\")
        lines.append(f" def ghost_{rng.randrange(99)}(): pass'")
        lines.append("")
    # padding comments make rows 0.2-50 KB and multi-chunk
    pad = rng.randint(0, 40)
    lines.extend(f"# note {rng.randrange(9999)} filler comment line" for _ in range(pad))
    return "\n".join(lines)


def _gen_javascript(rng: random.Random) -> str:
    # Modern-module shapes included on purpose (round-4 verdict: the suite
    # had zero export-prefixed JS fixtures, so a recall gap on the dominant
    # real-world declaration style was invisible to every oracle): draws
    # cover export/default-export functions and classes, arrow declarators,
    # TS-style interfaces, and named imports alongside the legacy shapes.
    lines: List[str] = []
    for _ in range(rng.randint(1, 3)):
        src = f"mod_{rng.randrange(N_MODS)}"
        style = rng.random()
        if style < 0.35:
            lines.append(f"import mod_{rng.randrange(N_MODS)} from '{src}';")
        elif style < 0.65:
            lines.append(f"import {{fn_{rng.randrange(N_FUNCS)}}} from '{src}';")
        elif style < 0.85:
            lines.append(f"import * as m{rng.randrange(9)} from '{src}';")
        else:
            # barrel re-export (third round-5 wave) — an import edge too
            lines.append(f"export {{fn_{rng.randrange(N_FUNCS)}}} from '{src}';")
    if rng.random() < 0.25:
        # commented-out code: the block mask keeps it out of extraction
        lines.append("/*")
        lines.append(f"export function dead_{rng.randrange(99)}(x) {{")
        lines.append(f"  gone_{rng.randrange(99)}(x);")
        lines.append("}")
        lines.append("*/")
    for _ in range(rng.randint(1, 4)):
        f = rng.randrange(N_FUNCS)
        style = rng.random()
        if style < 0.3:
            lines.append(f"function fn_{f}(x) {{")
            lines.append(f"  return fn_{rng.randrange(N_FUNCS)}(x);")
            lines.append("}")
        elif style < 0.55:
            lines.append(f"export function fn_{f}(x) {{")
            lines.append(f"  return fn_{rng.randrange(N_FUNCS)}(x);")
            lines.append("}")
        elif style < 0.75:
            lines.append(f"export const fn_{f} = (x) => {{")
            lines.append(f"  return fn_{rng.randrange(N_FUNCS)}(x);")
            lines.append("};")
        elif style < 0.9:
            # typed arrow declarator (fourth round-5 wave)
            lines.append(f"export const fn_{f} = (x: number): Res<T> => {{")
            lines.append(f"  return fn_{rng.randrange(N_FUNCS)}(x);")
            lines.append("};")
        else:
            # CommonJS export assignment (fourth round-5 wave)
            head = rng.choice(("exports", "module.exports"))
            lines.append(f"{head}.fn_{f} = function (x) {{")
            lines.append(f"  return fn_{rng.randrange(N_FUNCS)}(x);")
            lines.append("};")
    if rng.random() < 0.5:
        c = rng.randrange(N_CLASSES)
        kw = rng.choice(("class", "export class", "export default class",
                         "export interface", "export abstract class"))
        lines.append(f"{kw} Cls_{c} {{")
        if kw == "export abstract class":
            # abstract prototype — a declaration, never a call (wave 6)
            lines.append(f"  abstract fn_{rng.randrange(N_FUNCS)}(x: number): number;")
        if kw not in ("export interface",) and rng.random() < 0.5:
            # class-body members (round-5 envelope, all waves): plain
            # methods, class-field arrows, <T> generic methods, ES2022
            # private methods
            m = rng.randrange(N_FUNCS)
            style = rng.random()
            if style < 0.35:
                # '*'/'async *' generator methods were invisible until the
                # fifth round-5 wave — drawn alongside plain/static/async
                mods = rng.choice(("", "static ", "async ", "*", "async *"))
                lines.append(f"  {mods}fn_{m}(props) {{")
                lines.append(f"    return fn_{rng.randrange(N_FUNCS)}(props);")
                lines.append("  }")
            elif style < 0.55:
                lines.append(f"  fn_{m} = (e) => {{")
                lines.append(f"    return fn_{rng.randrange(N_FUNCS)}(e);")
                lines.append("  };")
            elif style < 0.75:
                lines.append(f"  fn_{m}<T>(xs) {{")
                lines.append(f"    return fn_{rng.randrange(N_FUNCS)}(xs);")
                lines.append("  }")
            else:
                # private method — invisible AND call-leaking before wave 6
                lines.append(f"  #fn_{m}(k) {{")
                lines.append(f"    return fn_{rng.randrange(N_FUNCS)}(k);")
                lines.append("  }")
        lines.append("}")
        if rng.random() < 0.3:
            # object-literal method AFTER the class closed — extent-aware
            # ownership (wave 7) keeps it ownerless instead of stealing
            # the stale class above
            o = rng.randrange(N_FUNCS)
            lines.append(f"export const reg_{rng.randrange(9)} = {{")
            lines.append(f"  fn_{o}(v) {{")
            lines.append(f"    return fn_{rng.randrange(N_FUNCS)}(v);")
            lines.append("  },")
            lines.append("};")
    if rng.random() < 0.2:
        # multi-line template literal (wave 8) — SQL-ish body with
        # call- and decl-shaped lines stays string DATA
        lines.append(f"const sql_{rng.randrange(9)} = `")
        lines.append(f"  SELECT count_{rng.randrange(99)}(*) FROM t")
        lines.append(f"  function dead_{rng.randrange(99)}(x) {{ gone(x); }}")
        lines.append("`;")
    lines.extend(f"// filler {rng.randrange(9999)}" for _ in range(rng.randint(0, 30)))
    return "\n".join(lines)


def _gen_go(rng: random.Random) -> str:
    if rng.random() < 0.5:
        lines = [f'import "mod_{rng.randrange(N_MODS)}"']
    else:
        # gofmt grouped import block — the dominant real-world form, zero
        # mentions before the third round-5 wave
        lines = [
            "import (",
            f'\t"mod_{rng.randrange(N_MODS)}"',
            f'\t"mod_{rng.randrange(N_MODS)}"',
            ")",
        ]
    if rng.random() < 0.3:
        # const/var block openers minted a phantom call until the fifth
        # round-5 wave — keep them in the draw as a precision canary
        lines.append(rng.choice(("const (", "var (")))
        lines.append(f"\tlimit_{rng.randrange(9)} = {rng.randrange(99)}")
        lines.append(")")
    for _ in range(rng.randint(1, 4)):
        f = rng.randrange(N_FUNCS)
        if rng.random() < 0.3:
            # pointer-receiver method, owned by its type (third wave)
            c = rng.randrange(N_CLASSES)
            lines.append(f"func (s *Cls_{c}) fn_{f}(x int) int {{")
        else:
            lines.append(f"func fn_{f}(x int) int {{")
        lines.append(f"    return fn_{rng.randrange(N_FUNCS)}(x)")
        lines.append("}")
    if rng.random() < 0.4:
        style = rng.random()
        if style < 0.5:
            lines.append(f"type Cls_{rng.randrange(N_CLASSES)} struct {{}}")
        elif style < 0.75:
            # grouped type block (fourth round-5 wave)
            lines.append("type (")
            lines.append(f"\tCls_{rng.randrange(N_CLASSES)} struct {{}}")
            lines.append(f"\tCls_{rng.randrange(N_CLASSES)} = int")
            lines.append(")")
        else:
            # defined type / func type beyond struct|interface
            lines.append(f"type Cls_{rng.randrange(N_CLASSES)} func(x int) int")
    if rng.random() < 0.3:
        # interface method set: decls owned by the interface, never calls
        # (wave 6 — previously phantom calls with a stale owner)
        c = rng.randrange(N_CLASSES)
        lines.append(f"type Cls_{c} interface {{")
        for _ in range(rng.randint(1, 2)):
            lines.append(f"\tfn_{rng.randrange(N_FUNCS)}(x int) int")
        lines.append("}")
    if rng.random() < 0.25:
        # anonymous-func declarator (wave 6) — the JS const-arrow twin
        f = rng.randrange(N_FUNCS)
        lines.append(f"var fn_{f} = func(x int) int {{")
        lines.append(f"\treturn fn_{rng.randrange(N_FUNCS)}(x)")
        lines.append("}")
    if rng.random() < 0.15:
        # multi-line raw string (wave 8) — body stays string DATA
        lines.append(f"var tmpl_{rng.randrange(9)} = `")
        lines.append(f"SELECT count_{rng.randrange(99)}(*) FROM t")
        lines.append(f"func dead_{rng.randrange(99)}() {{}}")
        lines.append("`")
    lines.extend(f"// filler {rng.randrange(9999)}" for _ in range(rng.randint(0, 30)))
    return "\n".join(lines)


def _gen_java(rng: random.Random) -> str:
    if rng.random() < 0.25:
        # static import names the package, not a phantom "static" module
        # (third round-5 wave)
        lines = [f"import static mod_{rng.randrange(N_MODS)}.Util.fn_{rng.randrange(N_FUNCS)};"]
    else:
        lines = [f"import mod_{rng.randrange(N_MODS)}.util;"]
    c = rng.randrange(N_CLASSES)
    if rng.random() < 0.15:
        # record — compact header minted a phantom call before wave 3
        lines.append(f"record Cls_{rng.randrange(N_CLASSES)}(int seed) {{}}")
    # interface/enum are nominal types too (second round-5 wave); their
    # members are prototypes, a class's members mix all the decl shapes
    kind = rng.choice(("class", "class", "class", "interface", "enum",
                       "@interface"))
    lines.append(f"{kind} Cls_{c} {{")
    if kind == "@interface":
        # annotation members carry default tails (fourth round-5 wave)
        for _ in range(rng.randint(1, 2)):
            lines.append(
                f"    int fn_{rng.randrange(N_FUNCS)}() default "
                f"{rng.randrange(9)};"
            )
    elif kind != "class":
        for _ in range(rng.randint(1, 2)):
            tp = rng.choice(("", "<T> "))
            rt = "T" if tp else "int"
            lines.append(f"    {tp}{rt} fn_{rng.randrange(N_FUNCS)}(int x);")
    else:
        if rng.random() < 0.3:
            # constructor — name = class, modifier-as-type backtracking
            lines.append(f"    public Cls_{c}(int seed) {{")
            lines.append(f"        fn_{rng.randrange(N_FUNCS)}(seed);")
            lines.append("    }")
        if rng.random() < 0.15:
            # JDK-15 text block (wave 8) — body stays string DATA
            lines.append(f'    static final String Q_{rng.randrange(9)} = """')
            lines.append(f"        SELECT count_{rng.randrange(99)}(*) FROM t")
            lines.append(f"        void dead_{rng.randrange(99)}() {{")
            lines.append('        """;')
        if rng.random() < 0.2:
            # nested class followed by outer members — the wave-6
            # extent canary (nearest-preceding owner handed the NEXT
            # method to the inner class after it closed)
            inner = rng.randrange(N_CLASSES)
            lines.append(f"    static final class Cls_{inner} {{")
            lines.append(f"        int fn_{rng.randrange(N_FUNCS)}(int x) {{")
            lines.append(f"            return fn_{rng.randrange(N_FUNCS)}(x);")
            lines.append("        }")
            lines.append("    }")
        for _ in range(rng.randint(1, 4)):
            f = rng.randrange(N_FUNCS)
            style = rng.random()
            if style < 0.4:
                # a throws clause on some plain methods (fourth round-5
                # wave: every throwing method used to be invisible)
                throws = " throws IOException" if rng.random() < 0.3 else ""
                lines.append(f"    int fn_{f}(int x){throws} {{")
                lines.append(f"        return fn_{rng.randrange(N_FUNCS)}(x);")
                lines.append("    }")
            elif style < 0.65:
                # generic return type (round-5 envelope)
                lines.append(f"    public List<Integer> fn_{f}(int x) {{")
                lines.append(f"        return fn_{rng.randrange(N_FUNCS)}(x);")
                lines.append("    }")
            elif style < 0.8:
                # <T> type-parameter method (second round-5 wave)
                lines.append(f"    static <T> T fn_{f}(T x) {{")
                lines.append(f"        return fn_{rng.randrange(N_FUNCS)}(x);")
                lines.append("    }")
            elif style < 0.92:
                # abstract prototype — a declaration, never a call
                lines.append(f"    abstract int fn_{f}(int x);")
            else:
                # functional-interface field (fifth round-5 wave) — the
                # java twin of the JS class-field arrow
                lines.append(
                    f"    Supplier<Integer> fn_{f} = () -> "
                    f"fn_{rng.randrange(N_FUNCS)}(1);"
                )
    lines.append("}")
    lines.extend(f"// filler {rng.randrange(9999)}" for _ in range(rng.randint(0, 30)))
    return "\n".join(lines)


def _gen_markdown(rng: random.Random) -> str:
    # exercises the no-match path (FIXTURES.md: markdown rows)
    words = ["notes", "design", "overview", "usage", "example", "table", "spark"]
    return "\n".join(
        "# " + rng.choice(words) + "\n" + " ".join(rng.choices(words, k=rng.randint(5, 40)))
        for _ in range(rng.randint(1, 5))
    )


_GEN = {
    "python": _gen_python,
    "javascript": _gen_javascript,
    "go": _gen_go,
    "java": _gen_java,
    "markdown": _gen_markdown,
}


def row_for(i: int, n_rows: int, seed: int = 42) -> Tuple[str, str, str, str, str]:
    """Pure function index → corpus row (enables distributed generation)."""
    rng = random.Random((seed << 20) ^ i)
    # skew: ~30% of files land in the mega-repo org0/repo0
    if rng.random() < 0.30:
        repo = "org0/repo0"
    else:
        r = rng.randrange(1, max(2, n_rows // 50))
        repo = f"org{r % 7}/repo{r}"
    lang = rng.choices(LANGS, weights=[40, 25, 15, 10, 10])[0]
    path = f"src/pkg_{rng.randrange(30)}/mod_{i}.{_EXT[lang]}"
    content = _GEN[lang](rng)
    return repo, path, _commit_for(repo, path, seed), lang, content


def corpus_rows(n_rows: int, seed: int = 42) -> List[Tuple[str, str, str, str, str]]:
    return [row_for(i, n_rows, seed) for i in range(n_rows)]


def corpus_df(spark, n_rows: int, seed: int = 42, distributed_threshold: int = 20_000):
    """Corpus as a DataFrame.  Small scales build driver-side (exact test
    fixtures); larger scales generate inside executors via mapInPandas over
    spark.range so 100 TB-style materialization never bottlenecks the driver.
    """
    if n_rows <= distributed_threshold:
        return spark.createDataFrame(corpus_rows(n_rows, seed), schema=CORPUS_SCHEMA)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [row_for(int(i), n_rows, seed) for i in b["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return (
        spark.range(n_rows)
        .repartition(max(32, n_rows // 5_000))
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def clustered_embeddings(
    spark,
    n_rows: int,
    dim: int = 64,
    n_clusters: int = 32,
    labeled: bool = False,
    partitions: int = 32,
):
    """Deterministic clustered embedding table (vec_id, embedding[, label])
    — the realistic corpus-embedding shape (tight soft clusters, mean top-k
    cosine ~0.97) shared by the sf1 bench generator, the ANN recall-curve
    harness and the pytest quality-gate fixtures.  ONE construction — a
    tweak here moves all recall gates and documented curves together:
    cluster centroid coordinates from hash(cluster, i), per-row jitter from
    hash(id, i); all JVM-side, no driver rows, no wall-clock randomness."""
    from pyspark.sql import functions as F

    # abs over the hash CAST TO LONG: int32 abs(Int.MinValue) throws
    # ARITHMETIC_OVERFLOW under ANSI mode (default-on in Spark 4) — a
    # probabilistic whole-job crash at ~n_rows×dim hash draws.  The long
    # cast is value-preserving for every other hash, so documented recall
    # curves and gates keyed to this construction are unchanged.
    def _h(*cols):
        return F.abs(F.hash(*cols).cast("long"))

    cluster = (_h("id", F.lit("c")) % n_clusters).cast("int")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (_h(cluster, i) % 2000).cast("double") / 1000.0
            - 1.0
            + ((_h("id", i) % 400).cast("double") / 1000.0 - 0.2)
        ).cast("float"),
    )
    cols = [F.col("id").alias("vec_id"), vec.alias("embedding")]
    if labeled:
        cols.append(cluster.alias("label"))
    return spark.range(n_rows).repartition(partitions).select(*cols)
