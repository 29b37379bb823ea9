"""Incremental corpus ingest via Structured Streaming.

The reference is strictly batch (no streaming surface anywhere in
scrapontologies/ — SURVEY §2.10), but a corpus engine at 100 TB ingests
continuously.  Because the fused extraction (operators/extract.py) is a
STATELESS narrow map, it lifts to Structured Streaming unchanged: new
corpus files → readStream → the same mapInPandas → append-mode triple sink.
Exactly-once comes from the checkpoint + idempotent file sink; no
watermarks are needed (no event-time aggregation — per-document outputs
depend on one input row only).

Cross-document stages (reconcile, CC, global schema) stay periodic batch
jobs over the accumulated tables — the standard lambda split for KG
construction; the streaming layer only keeps the extraction frontier hot.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_document_rows, triples_view
from ..sources.corpus import CORPUS_SCHEMA


def stream_corpus(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """readStream over a growing directory of corpus parquet files
    (schema per BASELINE input_hint).  maxFilesPerTrigger bounds batch size
    so executor memory stays flat regardless of backlog."""
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:  # 0/None distinguishable
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def incremental_doc_rows(
    corpus_stream: DataFrame,
    chunk_bytes: int = 1024,
    with_schemas: bool = True,
) -> DataFrame:
    """The fused extraction applied to a streaming corpus — identical code
    path to batch (stateless mapInPandas lifts directly)."""
    return extract_document_rows(corpus_stream, chunk_bytes, with_schemas)


def dedup_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming exact dedup: first-arrival-wins on md5(text) across
    micro-batches (the incremental twin of operators/dedup.exact_dedup —
    a doc whose content hash was EVER emitted is never emitted again,
    state persists in the checkpoint across restarts).

    Without a watermark the seen-hash state grows with the distinct-content
    count — fine for availableNow catch-up runs and bounded backfills;
    pass (ts_col, watermark e.g. '48 hours') in continuous deployments to
    bound state via dropDuplicatesWithinWatermark: duplicates arriving
    within the window are still suppressed, older state is reclaimed.

    Scale shape: state key is the 32-char hash (never the text), the
    exchange is the same hash(content_hash) shuffle the batch groupBy uses.
    Within one micro-batch the surviving row among simultaneous duplicates
    is arrival-order-dependent (Spark semantics); cross-batch suppression
    is exact."""
    out = docs_stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if ts_col is not None and watermark is None:
        # symmetric validation: a caller supplying the event-time column
        # expects the bounded-state path — silently ignoring it would run
        # global dropDuplicates with state growing until the store OOMs,
        # the exact failure the watermark exists to prevent
        raise ValueError(
            "ts_col without watermark: pass watermark (e.g. '48 hours') "
            "for bounded state, or omit ts_col for the unbounded "
            "availableNow/backfill mode"
        )
    if watermark is not None:
        if ts_col is None:
            raise ValueError("watermark requires ts_col")
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return out.dropDuplicates(["content_hash"])


def run_incremental_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    chunk_bytes: int = 1024,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = 256,
):
    """Start (or resume) the incremental triple-extraction query.

    ``available_now=True`` drains the current backlog and stops — the batch
    catch-up mode used in tests and cron-style incremental runs; False runs
    continuously.  Restart with the same checkpoint_dir resumes exactly
    where the previous run stopped (files already processed are never
    re-emitted).  ``max_files_per_trigger`` (default 256) bounds each
    micro-batch during catch-up so a large accumulated backlog drains in
    memory-flat slices instead of one giant batch (availableNow still
    processes EVERYTHING before stopping — just in bounded triggers); pass
    None to deliberately take the whole backlog in one batch."""
    # emit selection: only triple rows are consumed, so don't serialize
    # chunk payloads or run the entity fold per micro-batch (the chunk rows
    # alone would add Arrow volume the size of the corpus text itself)
    doc_rows = extract_document_rows(
        stream_corpus(spark, input_dir, max_files_per_trigger),
        chunk_bytes, with_schemas=False,
        with_entities=False, emit_chunks=False,
    )
    triples = triples_view(doc_rows)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
