"""Stage DAG of the KG-construction job (SURVEY §3 EP1+EP2 re-expression).

corpus → chunk+extract (mapInPandas, fused, no shuffle)
       → triples        (JVM explode + distinct)
       → per-doc fold   (applyInPandas over groupBy(repo,path))  [A2/A3]
       → entities       (module + symbol entities, reconciled)    [M4/M6]
       → schemas        (per-doc union + tree-reduced global)     [A4/A5]

Each stage returns a DataFrame; ``run_pipeline`` wires them and (optionally)
checkpoints stage outputs through the warehouse (sources/io.py) for
resumability.  The reference's langgraph node DAGs (pdf_parser.py:161-244)
map 1:1 onto these stages (SURVEY §2.9 O1-O4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.semantics import (
    canonical_json,
    derive_containment_relations,
    schema_to_entities,
)
from ..operators.extract import (
    chunks_view,
    doc_entities_view,
    doc_schemas_view,
    extract_document_rows,
    mentions_df,
    module_entities_view,
    triples_view,
)
from ..operators.schema_merge import global_schema


@dataclass
class PipelineResult:
    doc_rows: DataFrame  # the persisted tall output of the fused pass
    chunks: DataFrame
    mentions: DataFrame
    triples: DataFrame
    doc_entities: DataFrame
    entities: DataFrame
    doc_schemas: DataFrame
    global_schema_json: str
    schema_entities: list  # M4-derived Entity dataclasses from the global schema
    containment_relations: list  # M5(a) Relation dataclasses (ROOT-rooted)


def run_pipeline(
    corpus: DataFrame,
    chunk_bytes: int = 1024,
    with_schemas: bool = True,
    emit_chunks: bool = True,
    allowed_kinds=None,
    allowed_terms=None,
    persist: Optional[bool] = None,
) -> PipelineResult:
    """``allowed_kinds``/``allowed_terms``: P8 extraction allowlist — the
    user_prompt_for_filter stand-in, applied at extraction so entities,
    schemas and triples all reflect the restriction.

    ``persist`` (default: only when ``with_schemas``): cache the tall
    fused-output rows.  The schema path materializes the cache internally
    and a multi-consumer caller benefits from it, but a single-consumer
    caller (e.g. a contract query reading one view) would just leak one
    never-unpersisted cached frame per invocation — callers that keep the
    cache own unpersisting ``result.doc_rows``."""
    if persist is None:
        persist = with_schemas
    # Fused one-pass extraction (see operators/extract.py): every
    # per-document computation is row-local, so chunk/fold/schema/triple
    # rows all come out of ONE narrow mapInPandas — zero shuffles.  One
    # Python pass feeds five consumers → cache the tall rows.  At cluster
    # scale this stage is checkpointed to the warehouse instead
    # (io.write_stage, partitioned by kind), which also provides resume;
    # cache is the local-mode equivalent.
    doc_rows = extract_document_rows(
        corpus, chunk_bytes, with_schemas, emit_chunks,
        allowed_kinds=allowed_kinds, allowed_terms=allowed_terms,
    )
    if persist:
        doc_rows = doc_rows.persist()

    # chunk rows are intermediate "page answers"; with emit_chunks=False the
    # views below are valid but empty DataFrames
    chunks = chunks_view(doc_rows)
    mentions = mentions_df(chunks)
    triples = triples_view(doc_rows)

    doc_entities = doc_entities_view(doc_rows)
    symbols = doc_entities.select(
        F.concat(F.concat_ws("/", "repo", "path"), F.lit("::"), F.col("entity_name")).alias("id"),
        F.col("entity_type").alias("type"),
        F.col("attributes"),
    )
    modules = module_entities_view(doc_rows).select("id", "type", "attributes")
    entities = modules.unionByName(symbols)

    if with_schemas:
        doc_schemas = doc_schemas_view(doc_rows)
        # Fill the cache with a single-Python-stage action BEFORE the
        # global-schema reduce: otherwise the reduce's collect is the first
        # action and its plan chains the extraction mapInPandas with the
        # schema-partial mapInPandas in one task pipeline — two Python
        # runners ping-ponging per task, measured ~4× slower than running
        # them against the materialized cache (same pathology fixed for
        # m5 containment via the fused with_containment emit).  With
        # persist=False there is no cache to fill — the count would be a
        # full wasted extraction pass before the reduce re-runs it all.
        if persist:
            doc_rows.count()
        # tree-reduce over the (already per-doc-unioned) schema rows
        gschema = global_schema(doc_schemas)
        gschema_json = canonical_json(gschema)
        schema_ents = schema_to_entities(gschema)
        containment = derive_containment_relations(schema_ents)
    else:
        doc_schemas = None
        gschema_json = "{}"
        schema_ents = []
        containment = []

    return PipelineResult(
        doc_rows=doc_rows,
        chunks=chunks,
        mentions=mentions,
        triples=triples,
        doc_entities=doc_entities,
        entities=entities,
        doc_schemas=doc_schemas,
        global_schema_json=gschema_json,
        schema_entities=schema_ents,
        containment_relations=containment,
    )


def pipeline_summary(
    corpus: DataFrame, chunk_bytes: int = 1024
) -> "tuple[dict, str]":
    """One-pass deliverables summary: (kind → row count, global schema
    canonical JSON).

    The fused extraction computes every triple / entity / module / schema
    row (emit_chunks=False); a CHAINED narrow mapInPandas reduces each Arrow
    batch to kind-counts plus a partial M3 schema union, and the driver
    folds the ≤#partitions partials (M3 is commutative/associative/
    idempotent — the same license as the A5 tree reduce).  Zero shuffles,
    no cache: this is the scaling bench's measured job, and tests pin its
    outputs to run_pipeline's."""
    import json as _json
    from collections import Counter

    import pandas as pd

    from ..functions.semantics import schema_union_all, schema_union_owned

    doc_rows = extract_document_rows(
        corpus, chunk_bytes=chunk_bytes, with_schemas=True, emit_chunks=False
    )

    def reduce_batches(batches):
        counts: Counter = Counter()
        schema: dict = {}
        for b in batches:
            counts.update(b["kind"].value_counts().to_dict())
            for s in b.loc[b["kind"] == "schema", "schema_json"]:
                schema = schema_union_owned(schema, _json.loads(s))
        yield pd.DataFrame(
            [(_json.dumps(counts), canonical_json(schema))],
            columns=["counts_json", "schema_json"],
        )

    partials = doc_rows.mapInPandas(
        reduce_batches, "counts_json string, schema_json string"
    ).collect()
    counts: Counter = Counter()
    for r in partials:
        counts.update(_json.loads(r["counts_json"]))
    gschema = schema_union_all(_json.loads(r["schema_json"]) for r in partials)
    return dict(counts), canonical_json(gschema)


def verify_content_invariant(corpus: DataFrame, chunks: DataFrame) -> int:
    """Per-row sha256 equality between source content and what EVERY chunk
    row carries (BASELINE input_hint).  Returns the number of violating
    (repo, path, sha) combinations (must be 0): a carried sha that differs
    from its document's source sha, a carried sha for a document absent
    from the corpus, or a corpus document with no chunk rows at all.  A
    same-document mix of good and bad carried hashes is therefore counted
    — an exists-one-matching-row check would let it pass."""
    # coalesce mirrors the extractor's NULL-as-empty-document policy
    # (extract.py: one bad row must not abort the stage): sha2(NULL) is
    # NULL, which would count a deliberately-handled NULL-content doc as a
    # violation even though its chunk rows correctly carry sha256("")
    src = corpus.select(
        "repo",
        "path",
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("sha_src"),
    )
    carried = chunks.select(
        "repo", "path", F.col("sha256").alias("sha_carried")
    ).distinct()
    joined = src.join(carried, ["repo", "path"], "full_outer")
    bad = joined.filter(
        F.col("sha_src").isNull()          # chunk rows for a non-corpus doc
        | F.col("sha_carried").isNull()    # corpus doc with no chunk rows
        | (F.col("sha_src") != F.col("sha_carried"))
    )
    return bad.count()
