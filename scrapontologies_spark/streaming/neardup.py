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

- a document is SUPPRESSED if any of its band keys already exists in the
  store (an earlier arrival collides with it), or if a smaller ``doc_id``
  in the SAME micro-batch occupies one of its band buckets;
- band keys of ALL batch documents (survivors and suppressed alike) are
  appended to the store, so a later document colliding only with a
  suppressed one is still suppressed — the transitive closure of the
  greedy rule, matching how duplicate clusters chain in the batch path
  (dedup.duplicate_clusters).

Exactly-once: the checkpoint gives at-least-once ``foreachBatch``
execution; a re-run batch re-appends band keys (harmless — duplicates in
the store cannot change any verdict) and may re-emit its novel documents
(standard foreachBatch contract; the emitted table is idempotent under
downstream ``doc_id`` dedup, and the store-first write order below means a
retry can only over-suppress, never double-admit a duplicate).

Scale shape: the per-batch store probe is a left-semi join of a small
batch band set against the big store — on a cluster the store is a
bucketed catalog table on ``band_key`` (sources/io.py bucketed tables) so
the probe co-partitions without shuffling the store; locally it is plain
parquet.  Store growth is one row per (doc, band) — O(corpus), the same
footprint the batch signature table already costs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import band_key_rows, minhash_signatures, shingles

_STORE_SCHEMA = "band_idx INT, band_key STRING"


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


def neardup_filter_batch(
    docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """One micro-batch of the greedy rule: returns the NOVEL documents of
    ``docs`` and appends the batch's band keys to ``store_dir``.

    Exposed separately from the streaming wiring so tests (and batch
    backfills) can drive the exact per-batch semantics directly.
    Documents too short to shingle (< k tokens) carry no band keys and are
    always emitted, matching the batch path (no candidates).  ``id_col``
    is assumed unique within a batch (exact-duplicate rows should be
    removed upstream, e.g. incremental.dedup_stream); duplicate ids share
    one signature row and would all pass or fail together."""
    spark = docs.sparkSession
    bands = _batch_band_keys(
        docs, text_col, id_col, k, num_hashes, band_size
    ).localCheckpoint()  # derived once, probed three ways below

    # in-batch greedy: every bucket is owned by its smallest doc_id
    owner = bands.groupBy("band_idx", "band_key").agg(
        F.min("doc_id").alias("_owner")
    )
    in_batch_losers = (
        bands.join(owner, ["band_idx", "band_key"])
        .filter(F.col("doc_id") > F.col("_owner"))
        .select("doc_id")
        .distinct()
    )

    # cross-batch: any band key already in the store suppresses the doc
    if os.path.exists(store_dir):
        seen = spark.read.schema(_STORE_SCHEMA).parquet(store_dir)
        store_hits = (
            bands.join(seen, ["band_idx", "band_key"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        suppressed = in_batch_losers.unionByName(store_hits).distinct()
    else:
        suppressed = in_batch_losers

    # Materialize the verdict BEFORE appending to the store: `suppressed`
    # lazily reads store_dir, and a post-append execution would see the
    # batch's own keys and suppress every document.
    suppressed = suppressed.localCheckpoint()

    # Store append after the verdict, before the emit: on a foreachBatch
    # retry the keys are already present, so the re-run can only suppress
    # more, never admit a duplicate.
    bands.select("band_idx", "band_key").distinct().write.mode("append").parquet(
        store_dir
    )
    bands.unpersist()

    return docs.join(
        suppressed.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


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
        novel = neardup_filter_batch(
            batch_df,
            store_dir,
            text_col=text_col,
            id_col=id_col,
            k=k,
            num_hashes=num_hashes,
            band_size=band_size,
        )
        novel.write.mode("append").parquet(out_dir)

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
