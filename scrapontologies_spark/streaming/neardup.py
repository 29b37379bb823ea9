"""Streaming MinHash-LSH near-duplicate suppression.

The batch near-dup path (operators/dedup.py) buckets documents by LSH band
keys and keeps one canonical document per duplicate cluster.  A 100 TB
ingest pipeline has to make the same decision ONLINE: emit a document only
if no previously-seen document shares an LSH band with it.  The reference
has no streaming surface (SURVEY §2.10); this is the training-data-pipeline
extension of its dedup semantics.

Design: ``foreachBatch`` over a persistent band-key store, reusing the
batch operators (shingles → minhash_signatures → band_key_rows) unchanged —
the signature derivation is a stateless narrow map plus a per-doc
aggregation within the micro-batch, so it needs no streaming state; the
only cross-batch state is the band-key store table.

Semantics (deterministic greedy first-arrival-wins):

- a document is SUPPRESSED if any of its band keys was stored by an
  EARLIER batch (an earlier arrival collides with it), or if a smaller
  ``doc_id`` in the SAME micro-batch occupies one of its band buckets;
- band keys of ALL batch documents (survivors and suppressed alike) enter
  the store, so a later document colliding only with a suppressed one is
  still suppressed — the transitive closure of the greedy rule, matching
  how duplicate clusters chain in the batch path
  (dedup.duplicate_clusters).

Retry safety: store rows are tagged with the writing ``batch_id`` and the
probe EXCLUDES the current batch's own rows, so a foreachBatch re-run
(after a failure between the store append and the checkpoint commit)
reaches the exact same verdict as the first attempt — the batch's novel
documents are never suppressed by their own keys.  The store may carry
duplicate key rows from retried appends (harmless for a semi-join probe),
and the emitted table is at-least-once (standard foreachBatch contract;
dedupe downstream by ``doc_id`` if the sink is not idempotent).

Scale shape: the per-batch store probe is a left-semi join of a small
batch band set against the big store — on a cluster the store is a
bucketed catalog table on ``band_key`` (sources/io.py bucketed tables) so
the probe co-partitions without shuffling the store; locally it is plain
parquet.  Store growth is one row per (doc, band) — O(corpus), the same
footprint the batch signature table already costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..operators.dedup import band_key_rows, minhash_signatures, shingles

_STORE_SCHEMA = "band_idx INT, band_key STRING, batch_id BIGINT"


def _batch_band_keys(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    band_size: int,
) -> DataFrame:
    """(doc_id, band_idx, band_key) for one micro-batch via the batch
    operators (multiset shingles: MinHash's min() is duplicate-invariant,
    so the signature derivation is one map-side-combining aggregation)."""
    sh = shingles(docs, text_col=text_col, id_col=id_col, k=k, distinct=False)
    sigs = minhash_signatures(sh, num_hashes=num_hashes)
    return band_key_rows(sigs, num_hashes=num_hashes, band_size=band_size)


def _batch_plan(
    docs: DataFrame,
    store_dir: str,
    batch_id: int,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    band_size: int,
) -> "tuple[DataFrame, DataFrame]":
    """Build one batch's verdict plan: persists the band table, appends the
    batch's (batch_id-tagged) keys to the store, and returns
    ``(novel, bands)`` — ``novel`` still lazy, ``bands`` persisted so the
    caller can unpersist after materializing ``novel``."""
    spark = docs.sparkSession
    bands = _batch_band_keys(
        docs, text_col, id_col, k, num_hashes, band_size
    ).persist()  # probed three ways below; evictable-safe (plain persist)

    # in-batch greedy: every bucket is owned by its smallest doc_id
    owner = bands.groupBy("band_idx", "band_key").agg(
        F.min("doc_id").alias("_owner")
    )
    suppressed = (
        bands.join(owner, ["band_idx", "band_key"])
        .filter(F.col("doc_id") > F.col("_owner"))
        .select("doc_id")
        .distinct()
    )

    # cross-batch: any band key stored by an EARLIER batch suppresses the
    # doc.  The current batch_id is excluded, so this plan is correct even
    # when executed after the append below (and on foreachBatch retries,
    # whose prior partial append carries the same batch_id).  The
    # existence probe is the read itself — engine-side, so hdfs://s3a://
    # store paths work, not only the driver-local filesystem.
    try:
        seen = spark.read.schema(_STORE_SCHEMA).parquet(store_dir)
    except AnalysisException:  # first batch: no store yet
        seen = None
    if seen is not None:
        # null-safe: rows from an untagged (legacy 2-column) store read as
        # NULL batch_id and must count as PRIOR, not as the current batch
        prior = seen.filter(
            ~F.col("batch_id").eqNullSafe(F.lit(batch_id))
        ).select("band_idx", "band_key")
        hits = (
            bands.join(prior, ["band_idx", "band_key"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        suppressed = suppressed.unionByName(hits).distinct()

    # explicit BIGINT: F.lit of a small int is INT32, and mixed INT32/INT64
    # parquet files in one store break schema-widening-free readers (and a
    # caller's epoch-millis batch_id would genuinely be INT64)
    bands.select("band_idx", "band_key").distinct().withColumn(
        "batch_id", F.lit(batch_id).cast("bigint")
    ).write.mode("append").parquet(store_dir)

    novel = docs.join(
        suppressed.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
    return novel, bands


def neardup_filter_batch(
    docs: DataFrame,
    store_dir: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """One batch of the greedy rule: appends the batch's band keys to
    ``store_dir`` (tagged with ``batch_id``, which must be unique per
    logical batch and stable across retries) and returns the NOVEL
    documents of ``docs`` as a lazy DataFrame.

    Exposed separately from the streaming wiring so tests (and batch
    backfills) can drive the exact per-batch semantics directly.
    Documents too short to shingle (< k tokens) carry no band keys and are
    always emitted, matching the batch path (no candidates).  ``id_col``
    is assumed unique within a batch (exact-duplicate rows should be
    removed upstream, e.g. incremental.dedup_stream); duplicate ids share
    one signature row and would all pass or fail together."""
    novel, bands = _batch_plan(
        docs, store_dir, batch_id, text_col, id_col, k, num_hashes, band_size
    )
    # Materialize while the band cache is hot (it appears three times in
    # novel's plan — owner agg, in-batch join, store semi-join), then drop
    # it.  The result stays persisted (evictable, recompute-safe) for the
    # caller's action; the streaming wrapper manages the cache itself and
    # skips this eager step.
    novel = novel.persist()
    novel.count()
    bands.unpersist()
    return novel


def run_neardup_stream(
    docs_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    available_now: bool = True,
):
    """Wire the per-batch filter into a foreachBatch sink: novel documents
    append to ``out_dir`` parquet, band keys accumulate in ``store_dir``.
    Returns the started StreamingQuery."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        novel, bands = _batch_plan(
            batch_df, store_dir, batch_id,
            text_col, id_col, k, num_hashes, band_size,
        )
        novel.write.mode("append").parquet(out_dir)
        bands.unpersist()  # emitted — drop the cache before the next batch

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
