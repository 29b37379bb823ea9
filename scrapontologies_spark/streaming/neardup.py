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

_STORE_SCHEMA = "band_idx INT, band_key STRING, batch_id BIGINT, writer STRING"


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
    writer_id: str,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    band_size: int,
) -> "tuple[DataFrame, DataFrame]":
    """Build one batch's verdict plan: persists the band table, appends the
    batch's keys to the store tagged with (writer, batch_id), and returns
    ``(novel, bands)`` — ``novel`` still lazy, ``bands`` persisted so the
    caller can unpersist after materializing ``novel``.

    ``writer_id`` namespaces the retry exclusion: foreachBatch batch_ids
    are only unique per CHECKPOINT, so a stream restarted with a fresh
    checkpoint against a long-lived store would otherwise hide the old
    run's batch-0 keys behind its own batch 0.  The streaming wrapper
    derives it from the checkpoint dir (stable across driver restarts of
    the same query — retry exclusion still works — and distinct for a
    reset checkpoint or another stream sharing the store)."""
    spark = docs.sparkSession
    bands = _batch_band_keys(
        docs, text_col, id_col, k, num_hashes, band_size
    ).persist()  # probed three ways below; evictable-safe (plain persist)

    # in-batch greedy: every bucket is owned by its smallest doc_id.  No
    # distinct on any suppressed-id set: they only ever feed the build side
    # of the final left_anti join, where duplicates (bounded by n_bands per
    # doc) are semantically free and a distinct costs a shuffle per batch.
    owner = bands.groupBy("band_idx", "band_key").agg(
        F.min("doc_id").alias("_owner")
    )
    suppressed = (
        bands.join(owner, ["band_idx", "band_key"])
        .filter(F.col("doc_id") > F.col("_owner"))
        .select("doc_id")
    )

    # cross-batch: any band key stored by an EARLIER batch suppresses the
    # doc.  The current (writer, batch_id) is excluded, so this plan is
    # correct even when executed after the append below (and on foreachBatch
    # retries, whose prior partial append carries the same tag).  The
    # existence probe is the read itself — engine-side, so hdfs://s3a://
    # store paths work, not only the driver-local filesystem.
    try:
        seen = spark.read.schema(_STORE_SCHEMA).parquet(store_dir)
    except AnalysisException as e:
        # ONLY the missing-path case means "first batch"; any other
        # analysis failure (bad scheme, catalog error) must propagate —
        # treating it as an empty store would silently disable dedup
        get = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", lambda: None
        )
        klass = get() or ""
        if "PATH_NOT_FOUND" not in klass:
            raise
        seen = None
    if seen is not None:
        # null-safe: rows from an untagged (legacy/compacted) store read
        # as NULL writer/batch_id and must count as PRIOR
        prior = seen.filter(
            ~(
                F.col("writer").eqNullSafe(F.lit(writer_id))
                & F.col("batch_id").eqNullSafe(F.lit(batch_id))
            )
        ).select("band_idx", "band_key")
        hits = bands.join(
            prior, ["band_idx", "band_key"], "left_semi"
        ).select("doc_id")
        suppressed = suppressed.unionByName(hits)

    # explicit BIGINT: F.lit of a small int is INT32, and mixed INT32/INT64
    # parquet files in one store break schema-widening-free readers (and a
    # caller's epoch-millis batch_id would genuinely be INT64)
    bands.select("band_idx", "band_key").distinct().withColumn(
        "batch_id", F.lit(batch_id).cast("bigint")
    ).withColumn("writer", F.lit(writer_id)).write.mode("append").parquet(
        store_dir
    )

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
    writer_id: str = "batch",
) -> DataFrame:
    """One batch of the greedy rule: appends the batch's band keys to
    ``store_dir`` (tagged with ``(writer_id, batch_id)`` — the pair must be
    unique per logical batch across every writer that shares the store, and
    stable across retries of the same batch) and returns the NOVEL
    documents of ``docs`` as a lazy DataFrame.

    Exposed separately from the streaming wiring so tests (and batch
    backfills) can drive the exact per-batch semantics directly.
    Documents too short to shingle (< k tokens) carry no band keys and are
    always emitted, matching the batch path (no candidates).  ``id_col``
    is assumed unique within a batch (exact-duplicate rows should be
    removed upstream, e.g. incremental.dedup_stream); duplicate ids share
    one signature row and would all pass or fail together."""
    novel, bands = _batch_plan(
        docs, store_dir, batch_id, writer_id,
        text_col, id_col, k, num_hashes, band_size,
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
    Returns the started StreamingQuery.

    The store writer tag derives from the CHECKPOINT DIR: stable across
    driver restarts of the same query (retry exclusion keeps working for
    an uncommitted batch) and distinct for a reset checkpoint or a second
    stream sharing the store (whose epoch ids would otherwise collide and
    hide prior keys)."""
    import hashlib

    writer_id = "ckpt:" + hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # no rows: skip the store append (small-file growth)
        novel, bands = _batch_plan(
            batch_df, store_dir, batch_id, writer_id,
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


def compact_band_store(spark, store_dir: str) -> int:
    """Rewrite the band store as distinct (band_idx, band_key) rows with
    NULL writer/batch tags (pure PRIOR rows — every future probe treats
    them as earlier arrivals, which compaction makes true by definition).
    Run BETWEEN streaming runs, never concurrently with one: in continuous
    mode each micro-batch appends a file and the every-batch probe re-lists
    the store, so periodic compaction bounds file-count growth.  Local-FS
    directory swap; on an object store / catalog deployment this is a
    table rewrite (sources/io.py bucketed tables).  Returns the compacted
    row count."""
    import shutil

    compacted = (
        spark.read.schema(_STORE_SCHEMA)
        .parquet(store_dir)
        .select("band_idx", "band_key")
        .distinct()
        .withColumn("batch_id", F.lit(None).cast("bigint"))
        .withColumn("writer", F.lit(None).cast("string"))
    )
    tmp = store_dir.rstrip("/") + "__compacting"
    compacted.write.mode("overwrite").parquet(tmp)
    n = spark.read.schema(_STORE_SCHEMA).parquet(tmp).count()
    shutil.rmtree(store_dir)
    shutil.move(tmp, store_dir)
    return n
