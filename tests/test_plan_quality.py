"""Physical-plan quality gates (the 100 TB criteria, asserted on .explain):

- the fused extraction path must stay shuffle-free (no Exchange) — the
  dominant stage at scale must be narrow;
- parquet scans must show column pruning (ReadSchema) and filter pushdown
  (PushedFilters) for selective queries;
- the small side of the reconcile join must broadcast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fused_extract_is_shuffle_free(spark):
    from scrapontologies_spark.operators.extract import (
        extract_document_rows,
        triples_view,
    )
    from scrapontologies_spark.sources.corpus import corpus_df

    corpus = corpus_df(spark, 50)
    plan = _plan(triples_view(extract_document_rows(corpus, 512)))
    assert "Exchange" not in plan, plan


def test_documents_scan_prunes_and_pushes(spark):
    df = (
        spark.read.option("_plan_probe", "1")  # defeat CacheManager plan
        .parquet("/root/testdata/sf0.001/documents.parquet")  # matching: a
        .filter(F.col("doc_id") < 10)  # sibling module's persisted read of
        .select("doc_id", "text")  # the same file must not swap in an
    )  # InMemoryRelation here (order-dependent otherwise)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan, plan
    # ReadSchema must carry only the two projected columns
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in rs and "text" in rs and "lang" not in rs, rs


def test_integrity_semi_join_broadcasts_small_entity_side(spark):
    from scrapontologies_spark.operators.link import referential_integrity

    triples = spark.range(0, 10_000).select(
        F.concat(F.lit("m"), (F.col("id") % 100)).alias("subj"),
        F.lit("defines").alias("pred"),
        F.concat(F.lit("m"), (F.col("id") % 100), F.lit("::f")).alias("obj"),
        F.lit("defines").alias("rel_type"),
    )
    entities = spark.createDataFrame(
        [(f"m{i}",) for i in range(100)] + [(f"m{i}::f",) for i in range(100)],
        "id string",
    )
    df = referential_integrity(triples, entities)
    # static plan can't see through the distinct() aggregate's size stats;
    # the broadcast decision is AQE's at runtime — execute, then inspect the
    # final adaptive plan
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # toString also prints the pre-adaptive subtrees, so assert only that
    # the executed (isFinalPlan=true) section chose broadcast semi joins
    assert "isFinalPlan=true" in final, final
    assert "BroadcastHashJoin" in final and "LeftSemi" in final, final


def test_tpch_q6_predicates_all_push_to_scan(spark):
    """Every Q6 predicate (date range, discount band, quantity cap) must
    reach the parquet reader as PushedFilters — a scan-aggregate with
    residual JVM filters would read far too much at 100 TB."""
    from scrapontologies_spark.plans.dataset_queries import queries

    df = queries()["tpch_q6_forecast_revenue"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    pf = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24",
    ):
        assert frag in pf, (frag, pf)


def test_reconcile_udf_runs_only_on_matched_branch(spark):
    """The A1 merge pandas UDF must evaluate ONLY on rows matched on both
    sides with non-empty payloads; single-sided rows resolve JVM-side —
    exactly one ArrowEvalPython node, guarded by a both-present filter."""
    from scrapontologies_spark.operators.link import reconcile

    e = spark.createDataFrame(
        [("a", "t", '{"x":1}'), ("b", "t", '{"y":2}')],
        "id string, type string, attributes string",
    )
    n = spark.createDataFrame(
        [("b", "t", '{"z":3}'), ("c", "t", '{"w":4}')],
        "id string, type string, attributes string",
    )
    import re

    plan = _plan(reconcile(e, n))
    # formatted explain lists each node twice (tree + details) — count the
    # unique "(n) ArrowEvalPython" detail headers
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1, plan
    # Catalyst pushes the both-present guard BELOW the matched-branch join:
    # each join input is pre-filtered on a non-empty attributes payload
    conds = [l for l in plan.splitlines() if l.startswith("Condition")]
    both_present = [l for l in conds if "isnotnull(attributes" in l]
    assert len(both_present) >= 2, plan


def test_repetition_single_scan_no_extra_shuffle(spark):
    """The tagged-gram design does all counting in one scan; because the
    input is pre-spread on doc_id, BOTH aggregations are co-partitioned —
    the only Exchange in the plan is that initial spread (exploded gram
    rows never shuffle), and the gram count still combines map-side."""
    from scrapontologies_spark.operators import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textops.repetition_stats(docs))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan  # one scan
    n_exchange = sum(
        1 for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l
    )
    assert n_exchange == 1, plan  # only the spread repartition
    assert "partial_count" in plan, plan  # map-side combine on the gram agg


def test_keep_filter_single_scan_no_join(spark):
    """keep_filter is fully fused: ONE document scan, zero joins — the
    narrow signals ride through the repetition aggregation via first()
    instead of a second corpus scan + join."""
    from scrapontologies_spark.operators import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textops.keep_filter(docs))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "Join" not in plan, plan


def test_language_id_splits_text_once(spark):
    """language_id must tokenize once into a shared array: exactly one
    split() in the physical plan, and each language's count materialized
    as its own column (4 ASCII-language size(filter(...)) expressions) —
    not re-evaluated inside greatest() and the CASE chain."""
    from scrapontologies_spark.operators import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textops.language_id(docs))
    assert plan.count("split(") == 1, plan
    assert plan.count("size(filter(") == 4, plan


def test_sessionize_is_single_shuffle(spark):
    """lag window, running-sum window, and both aggregate phases must all
    reuse the hash(user_id) exchange (subset-satisfies-ClusteredDistribution)
    — sessionize costs exactly one shuffle."""
    from scrapontologies_spark.operators.events import sessionize

    df = sessionize(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    plan = _plan(df)
    ops = [l.split(") ", 1)[1].split(" ")[0]
           for l in plan.splitlines()
           if l.startswith("(") and ") " in l]
    assert ops.count("Exchange") == 1, plan


def test_asof_join_is_single_shuffle_no_join(spark):
    """asof_join must plan as union + one hash(key) exchange feeding the
    window — no Join operator at all, so no skew-amplifying range probe."""
    from scrapontologies_spark.operators.events import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = asof_join(
        ev.select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase"),
        right_value_cols=("event_id",),
    )
    plan = _plan(df)
    ops = [l.split(") ", 1)[1].split(" ")[0]
           for l in plan.splitlines()
           if l.startswith("(") and ") " in l]
    assert ops.count("Exchange") == 1, plan
    assert not any("Join" in o for o in ops), plan


def test_interval_join_no_cartesian(spark):
    """interval_join must be an equi-join on (key, bucket) — never a
    BroadcastNestedLoopJoin / CartesianProduct theta join."""
    from scrapontologies_spark.operators.events import interval_join, sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sess = sessionize(ev, 30).select(
        "user_id", "session_idx", "session_start", "session_end"
    )
    plan = _plan(interval_join(ev.select("user_id", "event_id", "ts"), sess))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tf_idf_broadcasts_corpus_size(spark):
    """The one-row corpus-size side must arrive via broadcast, and the
    redact/pii-free scan must appear once per aggregate branch only."""
    from scrapontologies_spark.operators.textops import tf_idf

    docs = (
        spark.read.option("_plan_probe", "1")  # defeat CacheManager plan
        .parquet("/root/testdata/sf0.001/documents.parquet")  # matching —
        # a sibling test's persisted read of the same file would otherwise
        # swap InMemoryRelation in for the file scans and zero the count
    )
    plan = _plan(tf_idf(docs))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # one scan per aggregate branch (tf, df, corpus-N) and no more — a
    # regression that re-reads the scan per language/token branch would
    # inflate this count
    assert plan.count("Location: InMemoryFileIndex") == 3, plan


def test_redact_pii_is_narrow(spark):
    """No hash shuffle and no aggregation — one projection over the scan.
    (spread() may inject a round-robin repartition when the local scan has
    fewer splits than cores; that's a data-spreading exchange, not a
    computation shuffle, and disappears at cluster scale.)"""
    from scrapontologies_spark.operators.textops import redact_pii

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(redact_pii(docs))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Aggregate" not in plan and "Join" not in plan, plan


def test_shingle_split_stays_out_of_the_gram_lambda(spark):
    """ArrayTransform is interpreted (no codegen); a split(text) inlined in
    the gram lambda re-splits the whole document per element_at —
    O(tokens² · k) per doc (the round-3 sf1 cold-pass regression: 74-122 s
    walls).  The token array must be materialized in its own projection:
    exactly one split() in the whole plan, none inside transform(...)."""
    from scrapontologies_spark.operators.dedup import shingles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(shingles(docs, distinct=False))
    lam = [l for l in plan.splitlines() if "transform(" in l]
    assert lam and all("split(" not in l for l in lam), plan
    assert plan.count("split(") == 1, plan


def test_decontaminate_gram_lambda_has_no_inline_split(spark):
    """Same gate for the decontamination gram derivation — one split per
    side (train + eval), never inside a transform lambda."""
    from scrapontologies_spark.operators import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textops.decontaminate(docs, docs.limit(5), ngram=5))
    lam = [l for l in plan.splitlines() if "transform(" in l]
    assert lam and all("split(" not in l for l in lam), plan
    assert plan.count("split(") == 2, plan
