"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All JVM-side (split/regexp/aggregate inside whole-stage codegen) so the hot
path has zero Python; every operator returns columns that an ANSI-SQL
oracle reproduces exactly (md5-based fingerprints, integer counts,
double ratios with deterministic operand order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import gram_array, spread

# marker vocabularies per language (fixed gazetteer — the n-gram-heuristic
# stand-in for a real langid model; deterministic + SQL-expressible)
LANG_MARKERS: dict[str, tuple] = {
    "en": ("the", "and", "with", "fast", "slow", "small", "big"),
    "de": ("der", "die", "das", "und", "mit", "schnell", "langsam"),
    "es": ("el", "la", "los", "con", "para", "rapido", "lento"),
    "fr": ("le", "la", "les", "avec", "pour", "vite", "lent"),
    "zh": ("的", "和", "表", "快", "慢", "大", "小"),
}

ENGLISH_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "with", "for",
)


def _is_ascii_word(m: str) -> bool:
    return all(c.isascii() and (c.isalnum() or c == "_") for c in m)


def _re_literal(m: str) -> str:
    """Quote a marker for Java regex so regexp_replace does LITERAL
    substring matching — the DuckDB oracle twin uses plain replace(), so a
    marker containing a regex metacharacter ('+', '(', '.') must not be
    interpreted as a pattern on the Spark side."""
    return "\\Q" + m.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _count_markers(
    text_col: Column, markers: tuple, toks: Column | None = None
) -> Column:
    """Marker-occurrence count with ENGINE-AGNOSTIC boundary semantics.

    ``\\b`` is a trap here: Java (Spark), RE2 (DuckDB) and Python disagree
    about which non-ASCII codepoints are word characters, so a
    ``\\b(...)\\b`` alternation silently breaks Spark↔oracle parity on any
    non-ASCII-adjacent text (and never matches CJK markers at all).
    Instead:

    - ASCII-word markers: split on ``[^A-Za-z0-9_]+`` and count tokens
      that equal a marker — identical in every engine, and equal to the
      old ``\\b`` counts on ASCII text.
    - non-ASCII (CJK) markers: plain substring occurrence counts via
      length deltas (CJK has no word boundaries; counting in-run
      occurrences is also linguistically the right thing).

    Pass ``toks`` as a column reference to a pre-materialized word-token
    array to share one split across many marker sets (language_id /
    keep_filter do; see quality_exprs for why inline splits repeat)."""
    ascii_words = tuple(m for m in markers if _is_ascii_word(m))
    other = tuple(m for m in markers if not _is_ascii_word(m))
    total: Column | None = None
    if ascii_words:
        if toks is None:
            toks = F.split(text_col, r"[^A-Za-z0-9_]+")
        total = F.size(F.filter(toks, lambda t: t.isin(*ascii_words)))
    for m in other:
        c = (
            F.length(text_col)
            - F.length(F.regexp_replace(text_col, _re_literal(m), ""))
        ) / F.lit(len(m))
        c = c.cast("int")
        total = c if total is None else total + c
    return total if total is not None else F.lit(0)


def ascii_word_tokens_in(text_col: Column, words: tuple) -> Column:
    """Array of tokens (split on ``[^A-Za-z0-9_]+``) equal to one of
    ``words`` — the engine-agnostic ASCII-``\\b`` match (see
    _count_markers for why not ``\\b``: Java's word-character set diverges
    from RE2/Python-ASCII on non-ASCII text)."""
    return F.filter(F.split(text_col, r"[^A-Za-z0-9_]+"), lambda t: t.isin(*words))


def lang_hit_columns(text: Column, toks: Column) -> "dict[str, Column]":
    """Per-language marker-hit counts — _count_markers (the single home of
    the engine-agnostic boundary semantics) with every ASCII count drawn
    from the SHARED word-token array ``toks``: the text is split exactly
    once for all languages instead of once per language."""
    return {
        lang: _count_markers(text, LANG_MARKERS[lang], toks=toks)
        for lang in sorted(LANG_MARKERS)
    }


def lang_pred_from_hits(hits: "dict[str, Column]") -> "tuple[Column, Column]":
    """(pred_lang, marker_hits) — argmax marker-hit count, ties broken by
    language code order (first in sorted order wins), expressed as a
    reversed when-chain so it mirrors a SQL CASE exactly.  Pass plain
    column REFERENCES, not the counting expressions: each hit appears ~3×
    here (greatest + CASE), and attribute refs keep each count computed
    once per row instead of relying on codegen subexpression elimination."""
    langs = sorted(hits)
    best = F.greatest(*[hits[lang] for lang in langs])
    # NULL seed, NOT langs[0]: with text=NULL every hit (and `best`) is
    # NULL, every WHEN condition is NULL, and the SQL-CASE twin (no ELSE)
    # yields NULL — a literal fallback would diverge from the oracle and
    # hand NULL-text docs a phantom language.  For non-NULL text some hit
    # always equals `best`, so the seed is unreachable.
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    return pred, best


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predicted language = argmax marker-hit count.
    Returns (doc_id, pred_lang, marker_hits).

    Plan shape: three staged projections — (1) the word-split into a shared
    token array, (2) one materialized hit column per language, (3) the
    argmax CASE over those columns.  Each stage's expensive expressions are
    referenced more than once downstream, so CollapseProject keeps the
    stages physical and every split/count runs once per row (the round-2
    single-projection form re-split the text per language and re-evaluated
    each count ~3× — measured 1.8 s vs 0.3 s-class at sf0.1)."""
    df = spread(df, id_col)
    langs = sorted(LANG_MARKERS)
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.split(F.col(text_col), r"[^A-Za-z0-9_]+").alias("_toks"),
    )
    hits = lang_hit_columns(F.col("_text"), F.col("_toks"))
    counted = tokens.select(
        "doc_id", *[hits[lang].alias(f"_h_{lang}") for lang in langs]
    )
    pred, best = lang_pred_from_hits({l: F.col(f"_h_{l}") for l in langs})
    return counted.select(
        "doc_id", pred.alias("pred_lang"), best.alias("marker_hits")
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, distinct-token count, and a BPE-ish subword
    count (alnum runs + punctuation marks as separate tokens)."""
    df = spread(df, id_col)
    # filtered token array materialized once (it is referenced twice, and
    # ArrayFilter is interpreted — an inline split would run 2× per row)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias(
            "_ftoks"
        ),
    )
    bpe = F.regexp_extract_all(F.col("_text"), F.lit(r"([A-Za-z0-9]+|[^A-Za-z0-9\s])"), 1)
    return base.select(
        "doc_id",
        F.size("_ftoks").alias("n_tokens"),
        F.size(F.array_distinct("_ftoks")).alias("n_distinct_tokens"),
        F.size(bpe).alias("n_subword_tokens"),
    )


def quality_exprs(text: Column, toks: Column | None = None) -> "dict[str, Column]":
    """The quality-signal expressions keyed by output column name — shared
    by quality_score and keep_filter.  Ratios are double divisions with
    fixed operand order → SQL-exact.

    Pass ``toks`` as a plain column REFERENCE to a pre-materialized token
    array where possible: the expressions below reference it ~5× and
    higher-order functions are interpreted (no codegen CSE), so an inline
    filter(split(...)) re-splits the text once per reference per row."""
    if toks is None:
        toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"([^\w\s])"), 1))
    n_stop = _count_markers(F.lower(text), ENGLISH_STOPWORDS)
    mean_wlen = F.when(
        n_tok > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars_measured": n_chars,
        "n_tokens": n_tok,
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop.cast("double") / F.greatest(n_tok, F.lit(1)),
        "mean_word_len": mean_wlen,
    }


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics (the deterministic analog of an LLM quality filter)."""
    df = spread(df, id_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias(
            "_toks"
        ),
    )
    exprs = quality_exprs(F.col("_text"), F.col("_toks"))
    return base.select(
        "doc_id",
        *[c.alias(name) for name, c in exprs.items()],
    )


def _tagged_grams(toks: Column) -> Column:
    """Unigrams and adjacent-pair bigrams tagged into ONE gram array
    (b=0 unigram, b=1 bigram) so a single explode feeds one
    map-side-combining count chain.  sequence() descends when start >
    stop, so the <2-token bigram case is guarded explicitly.  Pass a plain
    column reference so the token array is materialized once."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat(
                F.element_at(toks, i + 1), F.lit(" "), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tag = lambda flag: lambda g: F.struct(F.lit(flag).alias("b"), g.alias("g"))
    return F.concat(F.transform(toks, tag(0)), F.transform(bigrams, tag(1)))


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals: top-unigram fraction,
    fraction of tokens belonging to repeated (count>1) unigrams, and
    top-bigram fraction.

    Shape at scale: explode → groupBy(doc, gram) → groupBy(doc) is the
    canonical word-count — both aggregations combine map-side, so the
    shuffle carries (doc, gram, partial-count) rows, not raw tokens.  A
    row-local higher-order-function variant would avoid the shuffle but is
    O(tokens × distinct) per document — quadratic on a 100k-token doc —
    so the linear shuffle plan wins at 100 TB.

    Envelope: docs with ZERO whitespace tokens (empty/whitespace-only/NULL
    text) produce NO output row (explode drops the empty gram array, as
    does the oracle's unnest) — LEFT-join this result when every corpus
    row must survive downstream; keep_filter, which must preserve all
    docs, computes its signals inline via explode_outer for this reason.
    """
    df = spread(df, id_col)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))

    # ONE scan, ONE explode: unigrams and bigrams tagged into one gram
    # stream, counted together — a single map-side-combining aggregation
    # chain instead of two branches + a join
    grams = base.select(
        "doc_id", F.explode(_tagged_grams(F.col("_toks"))).alias("x")
    )
    counts = grams.groupBy(
        "doc_id", F.col("x.b").alias("b"), F.col("x.g").alias("g")
    ).agg(F.count("*").alias("c"))
    u = F.col("b") == 0
    stats = counts.groupBy("doc_id").agg(
        F.sum(F.when(u, F.col("c"))).alias("n_tokens"),
        F.max(F.when(u, F.col("c"))).alias("_max_c"),
        F.coalesce(
            F.sum(F.when(u & (F.col("c") > 1), F.col("c"))), F.lit(0)
        ).alias("_rep"),
        F.sum(F.when(~u, F.col("c"))).alias("_nb"),
        F.max(F.when(~u, F.col("c"))).alias("_max_b"),
    )
    return stats.select(
        "doc_id",
        F.col("n_tokens"),
        (F.col("_max_c").cast("double") / F.col("n_tokens")).alias("top_unigram_frac"),
        (F.col("_rep").cast("double") / F.col("n_tokens")).alias("repeated_token_frac"),
        F.coalesce(
            F.col("_max_b").cast("double") / F.col("_nb"), F.lit(0.0)
        ).alias("top_bigram_frac"),
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    token ``ngram``-gram with an evaluation set.  Returns
    (doc_id, n_shared_grams) for contaminated training docs only.

    Scale shape: the eval side is tiny by construction (a benchmark), so
    its distinct gram set is **broadcast**; training grams are derived
    narrowly (no shuffle) and the contamination join is a broadcast inner
    join — the only shuffle is the final per-doc distinct/count, keyed by
    (doc_id, gram) with map-side combine."""

    def grams(frame: DataFrame, keep_id: bool) -> DataFrame:
        # Token array materialized in its own projection: ArrayTransform is
        # interpreted (no codegen), so a split() inlined in the lambda would
        # re-split the whole document per element_at — O(tokens² · ngram)
        # per doc (same fix as dedup.shingles).
        cols = [F.col(id_col).alias("doc_id")] if keep_id else []
        base = frame.select(
            *cols,
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias(
                "_toks"
            ),
        )
        return base.select(
            *(["doc_id"] if keep_id else []),
            F.explode(gram_array(F.col("_toks"), ngram)).alias("gram"),
        )

    eval_grams = grams(eval_df, keep_id=False).distinct()
    train_grams = grams(spread(df, id_col), keep_id=True)
    return (
        train_grams.join(F.broadcast(eval_grams), "gram", "inner")
        .select("doc_id", "gram")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def keep_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: tuple = ("en",),
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.3,
    max_top_unigram_frac: float = 0.5,
    max_repeated_token_frac: float = 0.95,
) -> DataFrame:
    """Composed quality gate — the keep/drop decision a training-data
    pipeline makes from the individual signals (language, length,
    punctuation, repetition).

    Plan shape — ONE scan of the corpus, zero joins: a staged projection
    tokenizes once (word-split for language markers, lowered word-split
    for stopwords, whitespace split for quality + the token stream), the
    narrow signals and the unigram explode come out of that single pass,
    and the per-doc narrow signals ride THROUGH the repetition aggregation
    via first() (constant per doc, ~25 B per distinct token on a shuffle
    that already carries the token strings).  The round-2 form scanned the
    corpus twice — once for the narrow signals, once for the gram explode
    — and joined the halves; at 100 TB the second scan costs more than the
    carried bytes.  Empty/NULL-text docs survive via explode_outer (one
    NULL token row) with NULL repetition fractions, exactly like the old
    left join's misses."""
    base = spread(df, id_col)
    langs = sorted(LANG_MARKERS)
    text = F.col(text_col)
    # stage 1: every split exactly once, each held in its own projection so
    # CollapseProject can't inline a multi-referenced split downstream
    stage1 = base.select(
        F.col(id_col).alias("doc_id"),
        text.alias("_text"),
        F.split(text, r"[^A-Za-z0-9_]+").alias("_wtoks"),
        F.split(F.lower(text), r"[^A-Za-z0-9_]+").alias("_ltoks"),
        F.filter(F.split(text, r"\s+"), lambda t: t != "").alias("_toks"),
    )
    hits = lang_hit_columns(F.col("_text"), F.col("_wtoks"))
    n_tok = F.size("_toks")
    stage2 = stage1.select(
        "doc_id",
        *[hits[lang].alias(f"_h_{lang}") for lang in langs],
        n_tok.alias("_n_tokens"),
        (
            F.size(F.regexp_extract_all(F.col("_text"), F.lit(r"([^\w\s])"), 1)).cast(
                "double"
            )
            / F.greatest(F.length("_text"), F.lit(1))
        ).alias("_punct_ratio"),
        (
            # _count_markers(toks=_ltoks) expands to exactly the
            # size(filter(...isin)) expression this held inline — one home
            # for the boundary semantics the stop-count oracle twin mirrors
            _count_markers(F.col("_text"), ENGLISH_STOPWORDS, toks=F.col("_ltoks"))
            .cast("double")
            / F.greatest(n_tok, F.lit(1))
        ).alias("_stop_ratio"),
        F.col("_toks"),
    )
    pred, _ = lang_pred_from_hits({l: F.col(f"_h_{l}") for l in langs})
    # keep's repetition signals are UNIGRAM-only (top_unigram_frac,
    # repeated_token_frac), so explode the token array directly — the
    # round-2 _tagged_grams form also exploded and shuffled every bigram
    # only to discard it in the aggregates (~2× wasted explode rows and
    # shuffle bytes at corpus scale).  Empty/NULL-text docs survive via
    # explode_outer (one NULL-token row) with NULL fractions, as before.
    exploded = stage2.select(
        "doc_id",
        pred.alias("_pred"),
        "_n_tokens",
        "_punct_ratio",
        "_stop_ratio",
        F.explode_outer("_toks").alias("_tok"),
    )
    counts = exploded.groupBy("doc_id", "_tok").agg(
        F.count("*").alias("c"),
        F.first("_pred").alias("_pred"),
        F.first("_n_tokens").alias("_n_tokens"),
        F.first("_punct_ratio").alias("_punct_ratio"),
        F.first("_stop_ratio").alias("_stop_ratio"),
    )
    u = F.col("_tok").isNotNull()
    stats = counts.groupBy("doc_id").agg(
        F.first("_pred").alias("pred_lang"),
        F.first("_n_tokens").alias("n_tokens"),
        F.first("_punct_ratio").alias("punct_ratio"),
        F.first("_stop_ratio").alias("stopword_ratio"),
        F.sum(F.when(u, F.col("c"))).alias("_nu"),
        F.max(F.when(u, F.col("c"))).alias("_max_c"),
        F.coalesce(
            F.sum(F.when(u & (F.col("c") > 1), F.col("c"))), F.lit(0)
        ).alias("_rep"),
    )
    top_uni = F.col("_max_c").cast("double") / F.col("_nu")
    rep_frac = F.col("_rep").cast("double") / F.col("_nu")
    keep = (
        F.col("pred_lang").isin(*allowed_langs)
        & (F.col("n_tokens") >= F.lit(min_tokens))
        & (F.col("n_tokens") <= F.lit(max_tokens))
        & (F.col("punct_ratio") <= F.lit(max_punct_ratio))
        & (F.coalesce(top_uni, F.lit(1.0)) <= F.lit(max_top_unigram_frac))
        & (F.coalesce(rep_frac, F.lit(1.0)) <= F.lit(max_repeated_token_frac))
    )
    return stats.select(
        "doc_id",
        "pred_lang",
        "n_tokens",
        "punct_ratio",
        "stopword_ratio",
        top_uni.alias("top_unigram_frac"),
        rep_frac.alias("repeated_token_frac"),
        keep.alias("keep"),
    )


def _doc_token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, token, tf) — the canonical word-count shape: explode →
    groupBy(doc, token) with map-side partial aggregation, so the shuffle
    carries (doc, token, partial-count) rows, never raw tokens."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: the ``top_k`` whitespace tokens by total
    occurrence count, with document frequency.  Returns
    (token, n_occurrences, n_docs), ties broken by token ascending.

    Scale shape: two chained map-side-combining aggregations (the word-count
    classic) — the token-keyed shuffle carries partial counts; the final
    top-k is a TakeOrdered (per-partition heap + driver merge of k rows),
    NOT a global sort shuffle."""
    pairs = _doc_token_counts(spread(df, id_col), text_col, id_col)
    totals = pairs.groupBy("token").agg(
        F.sum("tf").alias("n_occurrences"), F.count("*").alias("n_docs")
    )
    return totals.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(top_k)


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(document, token) TF-IDF over whitespace tokens:
    ``tf · ln(N / df_t)`` with N = corpus size, df_t = documents containing
    the token.  Returns (doc_id, token, tf, df_t, tf_idf).

    Scale shape: tf and df_t come from the same (doc, token) aggregate —
    df_t is a second map-side-combining groupBy over it (one row per
    (doc, token), far smaller than raw tokens); N arrives via a broadcast
    one-row cross join, keeping the plan fully declarative (no driver-side
    count splitting the job in two).  The tf↔df_t join is token-keyed;
    both sides are already token-partitioned aggregates, so AQE plans a
    co-partitioned shuffle join with no extra exchange on the df_t side."""
    base = spread(df, id_col)
    pairs = _doc_token_counts(base, text_col, id_col)
    doc_freq = pairs.groupBy("token").agg(F.count("*").alias("df_t"))
    n_docs = base.agg(F.count("*").alias("_n"))
    return (
        pairs.join(doc_freq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df_t",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("_n").cast("double") / F.col("df_t").cast("double")),
                6,
            ).alias("tf_idf"),
        )
    )


# PII patterns — shared literals, backreference-free so Java regex (Spark)
# and RE2 (DuckDB) match identically
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{0,4}"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub for training corpora: count and redact emails, IPv4
    addresses, and international-format phone numbers.  Returns
    (doc_id, n_emails, n_ipv4, n_phones, redacted) with matches replaced by
    ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` in that fixed order (the
    replacement tokens contain no digits, so later patterns can't re-match
    earlier redactions).

    Entirely JVM-side regexp work in one narrow projection — zero shuffles,
    zero Python; counts come from the pre-redaction text."""
    df = spread(df, id_col)
    text = F.col(text_col)
    redacted = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4, "<IP>")
    redacted = F.regexp_replace(redacted, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).alias("n_ipv4"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).alias("n_phones"),
        redacted.alias("redacted"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text (collapse runs, trim) — the rolling-hash/winnowing stand-in that
    stays exactly SQL-expressible.  Equal fingerprints ⇒ normalized-equal
    docs."""
    df = spread(df, id_col)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
    )
