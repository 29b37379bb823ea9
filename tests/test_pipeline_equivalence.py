"""Layer-3 equivalence (SURVEY §5.3): distributed pipeline output ==
driver-side sequential reference-semantics fold, on a seeded synthetic
corpus.  P/R on (subj, pred, obj) sets must be 1.0 (both sides
deterministic); per-row sha256 integrity must hold end-to-end."""

from __future__ import annotations

import json

import pytest

from scrapontologies_spark.functions.code_gazetteer import (
    document_payload,
    document_schema,
    document_triples,
)
from scrapontologies_spark.functions.semantics import (
    canonical_json,
    is_na,
    schema_union_all,
)
from scrapontologies_spark.plans.pipeline import run_pipeline, verify_content_invariant
from scrapontologies_spark.sources.corpus import corpus_df, corpus_rows

N_ROWS = 120
CHUNK_BYTES = 512  # small → guarantees multi-chunk docs → fold order matters


@pytest.fixture(scope="module")
def result(spark):
    corpus = corpus_df(spark, N_ROWS).persist()
    res = run_pipeline(corpus, chunk_bytes=CHUNK_BYTES)
    yield corpus, res
    corpus.unpersist()
    res.doc_rows.unpersist()


def _oracle_triples():
    expected = set()
    for repo, path, commit, lang, content in corpus_rows(N_ROWS):
        expected.update(document_triples(repo, path, lang, content, CHUNK_BYTES))
    return expected


def test_triples_pr_is_one(result):
    _, res = result
    got = {
        (r.subj, r.pred, r.obj, r.rel_type)
        for r in res.triples.collect()
    }
    expected = _oracle_triples()
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 0.0
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision:.4f} R={recall:.4f} "
        f"spark-only={list(got - expected)[:3]} oracle-only={list(expected - got)[:3]}"
    )


def test_fold_matches_sequential_oracle(result):
    _, res = result
    got = {}
    for r in res.doc_entities.collect():
        got.setdefault((r.repo, r.path), {})[r.entity_name] = json.loads(r.attributes)
    for repo, path, commit, lang, content in corpus_rows(N_ROWS):
        expected = document_payload(lang, content, CHUNK_BYTES)
        expected = {k: v for k, v in expected.items() if not is_na(k)}
        assert got.get((repo, path), {}) == expected, f"fold mismatch for {repo}/{path}"


def test_sha256_invariant(result):
    corpus, res = result
    assert verify_content_invariant(corpus, res.chunks) == 0


def test_global_schema_matches_oracle(result):
    _, res = result
    expected = schema_union_all(
        document_schema(lang, content, CHUNK_BYTES)
        for _, _, _, lang, content in corpus_rows(N_ROWS)
    )
    assert res.global_schema_json == canonical_json(expected)


def test_markdown_rows_produce_no_mentions(result):
    _, res = result
    assert res.mentions.filter("lang = 'markdown'").count() == 0


def test_entity_counts(result):
    _, res = result
    # one module entity per document + one entity per merged top-level key
    n_docs = len(corpus_rows(N_ROWS))
    assert res.entities.filter("type = 'module'").count() == n_docs
    assert res.entities.count() > n_docs


def test_partitioning_invariance(spark):
    """Layer-4 light: same output under different parallelism (1 vs 8
    shuffle partitions, repartitioned input) — guards the fold's order
    stability against partitioning (SURVEY §5.4)."""
    rows = corpus_rows(30)
    expected = set()
    for repo, path, commit, lang, content in rows:
        expected.update(document_triples(repo, path, lang, content, CHUNK_BYTES))

    for parts in (1, 8):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            corpus = corpus_df(spark, 30).repartition(parts)
            res = run_pipeline(corpus, chunk_bytes=CHUNK_BYTES, with_schemas=False)
            got = {(r.subj, r.pred, r.obj, r.rel_type) for r in res.triples.collect()}
            res.doc_rows.unpersist()
            assert got == expected, f"divergence at shuffle.partitions={parts}"
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_emit_chunks_false_same_deliverables(result, spark):
    """The slim pass (no chunk rows) must produce byte-identical
    deliverables — triples, entities, global schema — to the full pass."""
    corpus, full = result
    slim = run_pipeline(corpus, chunk_bytes=CHUNK_BYTES, emit_chunks=False)
    try:
        assert slim.chunks.count() == 0
        assert set(map(tuple, slim.triples.collect())) == set(
            map(tuple, full.triples.collect())
        )
        assert set(map(tuple, slim.entities.collect())) == set(
            map(tuple, full.entities.collect())
        )
        assert slim.global_schema_json == full.global_schema_json
    finally:
        slim.doc_rows.unpersist()


def test_pipeline_summary_matches_run_pipeline(result):
    """The scaling bench's one-pass summary must report the same deliverable
    counts and the same global schema as the staged pipeline."""
    from scrapontologies_spark.plans.pipeline import pipeline_summary

    corpus, full = result
    counts, gschema_json = pipeline_summary(corpus, chunk_bytes=CHUNK_BYTES)
    assert counts["triple"] == full.triples.count()
    assert counts["entity"] + counts["module"] == full.entities.count()
    assert gschema_json == full.global_schema_json
