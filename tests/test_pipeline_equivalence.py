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


def test_containment_relations_from_global_schema(result):
    """M5(a): every top-level global-schema property gets a ROOT has_<e>
    edge, and nested-object attributes (e.g. function.calls arrays) nest a
    second containment level — the Digraph exemplar shape."""
    _, res = result
    rels = res.containment_relations
    assert rels and all(r.type == "containment" for r in rels)
    props = json.loads(res.global_schema_json)["properties"]
    roots = {r.target for r in rels if r.source == "ROOT"}
    assert roots == set(props)
    assert all(r.name == f"has_{r.target}" for r in rels)
    # the code corpus induces nested attrs (calls/called_by arrays) → at
    # least one second-level containment edge under a top-level entity
    assert any(r.source != "ROOT" for r in rels)


def test_containment_triples_per_doc_match_sequential_oracle(spark):
    """Distributed per-document containment operator == sequential
    document_schema → M4 → M5(a) oracle, module-rooted."""
    from scrapontologies_spark.functions.semantics import (
        derive_containment_relations,
        schema_to_entities,
    )
    from scrapontologies_spark.operators.extract import (
        containment_triples_from_doc_schemas,
        doc_schemas_view,
        extract_document_rows,
    )

    corpus = corpus_df(spark, 30)
    doc_rows = extract_document_rows(corpus, 512, with_schemas=True, emit_chunks=False)
    got = {
        (r.subj, r.pred, r.obj, r.rel_type)
        for r in containment_triples_from_doc_schemas(
            doc_schemas_view(doc_rows)
        ).collect()
    }
    expected = set()
    for repo, path, commit, lang, content in corpus_rows(30):
        ents = schema_to_entities(document_schema(lang, content, 512))
        for r in derive_containment_relations(ents, root=f"{repo}/{path}"):
            expected.add((r.source, r.name, r.target, r.type))
    assert got == expected and got


def test_fused_containment_emit_matches_chained_operator(spark):
    """extract_document_rows(with_containment=True) — the single-Python-stage
    fused emit — produces exactly the rows of the chained
    containment_triples_from_doc_schemas path (which the test above pins to
    the sequential oracle)."""
    from scrapontologies_spark.operators.extract import (
        containment_triples_from_doc_schemas,
        containment_view,
        doc_schemas_view,
        extract_document_rows,
    )

    corpus = corpus_df(spark, 30)
    fused = {
        (r.subj, r.pred, r.obj, r.rel_type)
        for r in containment_view(
            extract_document_rows(
                corpus, 512, with_schemas=False, emit_chunks=False,
                with_entities=False, with_triples=False, with_containment=True,
            )
        ).collect()
    }
    chained = {
        (r.subj, r.pred, r.obj, r.rel_type)
        for r in containment_triples_from_doc_schemas(
            doc_schemas_view(
                extract_document_rows(corpus, 512, with_schemas=True, emit_chunks=False)
            )
        ).collect()
    }
    assert fused == chained and fused


def test_p8_allowlist_restricts_whole_pipeline(spark):
    """P8 user_prompt_for_filter stand-in: an allowed_kinds filter at
    extraction restricts triples/entities exactly like the sequential
    oracle run with the same allowlist."""
    from scrapontologies_spark.functions.code_gazetteer import (
        chunk_text,
        extract_mentions,
        triples_for_mentions,
    )

    kinds = frozenset({"import"})
    corpus = corpus_df(spark, 30)
    res = run_pipeline(
        corpus, chunk_bytes=CHUNK_BYTES, with_schemas=False, allowed_kinds=kinds
    )
    got = {(r.subj, r.pred, r.obj, r.rel_type) for r in res.triples.collect()}
    assert {t[1] for t in got} <= {"imports"}
    expected = set()
    for repo, path, commit, lang, content in corpus_rows(30):
        mod = f"{repo}/{path}"
        for _, text in chunk_text(content, CHUNK_BYTES):
            expected |= triples_for_mentions(
                mod, extract_mentions(lang, text, kinds, None)
            )
    assert got == expected and got
    res.doc_rows.unpersist()


def test_p8_jvm_mention_filter_matches_extraction_filter(spark):
    """mentions_df's JVM-side isin filter == filtering at extraction."""
    from scrapontologies_spark.operators.extract import extract_chunks, mentions_df

    corpus = corpus_df(spark, 20)
    kinds = {"function", "class"}
    jvm = mentions_df(extract_chunks(corpus, CHUNK_BYTES), allowed_kinds=kinds)
    at_ext = mentions_df(extract_chunks(corpus, CHUNK_BYTES, allowed_kinds=kinds))
    assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, at_ext.collect()))
    assert jvm.count() > 0


def test_emit_selection_schema_only_rows_identical(spark):
    """with_entities=False/with_triples=False must skip the fold and
    triple-set WORK but emit byte-identical schema/module rows."""
    from scrapontologies_spark.operators.extract import (
        doc_schemas_view,
        extract_document_rows,
    )

    corpus = corpus_df(spark, 20)
    full = extract_document_rows(corpus, CHUNK_BYTES, True, False)
    slim = extract_document_rows(
        corpus, CHUNK_BYTES, True, False, with_entities=False, with_triples=False
    )
    assert sorted(map(tuple, doc_schemas_view(slim).collect())) == sorted(
        map(tuple, doc_schemas_view(full).collect())
    )
    kinds = {r.kind for r in slim.select("kind").distinct().collect()}
    assert kinds == {"schema", "module"}


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


def test_content_invariant_catches_mixed_sha_rows(spark):
    """A document with one corrupted-sha chunk row alongside correct ones
    must be flagged — an exists-one-matching-row check would pass it."""
    from pyspark.sql import functions as F

    from scrapontologies_spark.plans.pipeline import verify_content_invariant

    corpus = spark.createDataFrame(
        [("r", "a.py", "c", "python", "x = 1")],
        "repo string, path string, commit string, lang string, content string",
    )
    sha = corpus.select(F.sha2("content", 256).alias("s")).collect()[0]["s"]
    chunks_ok = spark.createDataFrame(
        [("r", "a.py", sha), ("r", "a.py", sha)], "repo string, path string, sha256 string"
    )
    assert verify_content_invariant(corpus, chunks_ok) == 0
    chunks_mixed = spark.createDataFrame(
        [("r", "a.py", sha), ("r", "a.py", "deadbeef")],
        "repo string, path string, sha256 string",
    )
    assert verify_content_invariant(corpus, chunks_mixed) == 1
    # chunk rows for a document absent from the corpus are violations too
    chunks_orphan = chunks_ok.union(
        spark.createDataFrame([("r", "ghost.py", sha)], chunks_ok.schema)
    )
    assert verify_content_invariant(corpus, chunks_orphan) == 1
    # ...as is a corpus document with no chunk rows at all
    assert verify_content_invariant(corpus, chunks_ok.limit(0)) == 1


def test_staged_fold_matches_fused_doc_entities(spark):
    """operators/fold.fold_documents (the staged A2/A3 operator for
    pre-chunked inputs) must produce exactly the fused kernel's
    doc-entities rows when fed the fused pass's own chunk rows."""
    from scrapontologies_spark.operators.extract import (
        chunks_view,
        doc_entities_view,
        extract_document_rows,
    )
    from scrapontologies_spark.operators.fold import fold_documents
    from scrapontologies_spark.sources.corpus import corpus_df

    corpus = corpus_df(spark, 24)
    doc_rows = extract_document_rows(corpus, 512, with_schemas=False).persist()
    try:
        fused = {
            (r.repo, r.path, r.entity_name): (r.entity_type, r.attributes)
            for r in doc_entities_view(doc_rows).collect()
        }
        staged = {
            (r.repo, r.path, r.entity_name): (r.entity_type, r.attributes)
            for r in fold_documents(chunks_view(doc_rows)).collect()
        }
        assert staged == fused and len(fused) > 0
    finally:
        doc_rows.unpersist()


def test_null_content_rows_do_not_abort_extraction(spark):
    """One corpus row with content=NULL (an arbitrary --corpus parquet can
    carry one) must not kill the mapInPandas stage after 4 task retries:
    NULL reads as the empty document — sha256(""), one empty chunk, a
    module row — and every other document extracts normally."""
    import hashlib

    from scrapontologies_spark.operators.extract import (
        extract_chunks,
        extract_document_rows,
        module_entities_view,
        triples_view,
    )

    corpus = spark.createDataFrame(
        [
            ("r", "good.py", "c1", "python", "import os\ndef f():\n    g()\n"),
            ("r", "bad.bin", "c2", "python", None),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    rows = extract_document_rows(corpus, 512)
    mods = {r.id: r.attributes for r in module_entities_view(rows).collect()}
    assert set(mods) == {"r/good.py", "r/bad.bin"}
    empty_sha = hashlib.sha256(b"").hexdigest()
    assert empty_sha in mods["r/bad.bin"]
    # the good doc still yields its triples
    subs = {r.subj for r in triples_view(rows).collect()}
    assert "r/good.py" in subs
    # the chunk-only operator takes the same path
    assert extract_chunks(corpus, 512).count() >= 2
