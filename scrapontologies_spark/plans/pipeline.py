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

from ..functions.semantics import canonical_json, schema_to_entities
from ..operators.extract import extract_chunks, mentions_df, triples_from_mentions
from ..operators.fold import fold_documents, module_entities
from ..operators.schema_merge import document_schemas, global_schema


@dataclass
class PipelineResult:
    chunks: DataFrame
    mentions: DataFrame
    triples: DataFrame
    doc_entities: DataFrame
    entities: DataFrame
    doc_schemas: DataFrame
    global_schema_json: str
    schema_entities: list  # M4-derived Entity dataclasses from the global schema


def run_pipeline(
    corpus: DataFrame,
    chunk_bytes: int = 1024,
    with_schemas: bool = True,
) -> PipelineResult:
    chunks = extract_chunks(corpus, chunk_bytes)
    # One Python pass feeds three consumers → cache the chunk rows.  At
    # cluster scale this stage is checkpointed to the warehouse instead
    # (io.write_stage), which also provides resume; cache is the local-mode
    # equivalent.
    chunks = chunks.persist()

    mentions = mentions_df(chunks)
    triples = triples_from_mentions(mentions)

    doc_entities = fold_documents(chunks)
    symbols = doc_entities.select(
        F.concat_ws("/", "repo", "path").alias("module_id"),
        F.concat(F.concat_ws("/", "repo", "path"), F.lit("::"), F.col("entity_name")).alias("id"),
        F.col("entity_type").alias("type"),
        F.col("attributes"),
    ).drop("module_id")
    modules = module_entities(chunks).select("id", "type", "attributes")
    entities = modules.unionByName(symbols)

    if with_schemas:
        doc_schemas = document_schemas(chunks)
        gschema = global_schema(chunks)
        gschema_json = canonical_json(gschema)
        schema_ents = schema_to_entities(gschema)
    else:
        doc_schemas = None
        gschema_json = "{}"
        schema_ents = []

    return PipelineResult(
        chunks=chunks,
        mentions=mentions,
        triples=triples,
        doc_entities=doc_entities,
        entities=entities,
        doc_schemas=doc_schemas,
        global_schema_json=gschema_json,
        schema_entities=schema_ents,
    )


def verify_content_invariant(corpus: DataFrame, chunks: DataFrame) -> int:
    """Per-row sha256 equality between source content and what every chunk
    row carries (BASELINE input_hint).  Returns the number of violating
    documents (must be 0).  Implemented as a JVM-side anti-join."""
    src = corpus.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha_src")
    )
    carried = chunks.select("repo", "path", F.col("sha256").alias("sha_carried")).distinct()
    bad = src.join(
        carried,
        (src.repo == carried.repo)
        & (src.path == carried.path)
        & (src.sha_src == carried.sha_carried),
        "left_anti",
    )
    return bad.count()
