#!/usr/bin/env python3
"""Streaming near-dup band-store bench: ParquetBandStore vs BucketedBandStore.

Drives the SAME per-batch verdict (neardup_filter_batch) over B synthetic
micro-batches for both store layouts and records each batch's wall — the
quantity that matters is the probe-wall TREND as the store grows: the
parquet layout shuffles the whole store every batch (wall grows with store
size), the bucketed catalog table carries hash partitioning on the join
key so the probe stays co-partitioned (no store-side Exchange,
plan-asserted in tests/test_streaming_neardup.py) and only the small
batch side shuffles.  Also times one compaction per layout.

Corpus: deterministic md5-token texts keyed by doc_id (no RNG); every
10th doc repeats an earlier doc's text so cross-batch suppression stays
on the measured path.

Usage: python scripts/neardup_store_bench.py [n_batches] [docs_per_batch]
[seeded_store_rows] (defaults 12, 20000, 10_000_000).  Prints one JSON
line.  Runs ``local[$SPARK_GRAFT_CPUS]`` (default 8) with a 16g driver
heap — the seeded-store sort at the default 10M rows needs well more
than the 1g local-mode default.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_batch(spark, batch_idx: int, n_docs: int):
    """Deterministic 10-token texts; doc_ids [batch*n, (batch+1)*n); every
    10th doc repeats the text of the doc ONE FULL BATCH (plus 3) below it,
    so from batch 1 on the duplicate's source lives in a PRIOR batch and
    the store semi-join (not the in-batch greedy rule) must suppress it —
    the cross-batch path is what the bench exists to measure, and the
    cross-layout emitted-equality assert covers it.  The -3 offset keeps
    the source id off the ``%10 == 7`` stride so a duplicate never points
    at another duplicate."""
    from pyspark.sql import functions as F

    start = batch_idx * n_docs
    reach_back = n_docs + 3
    base = spark.range(start, start + n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 10 == 7) & (F.col("id") >= reach_back),
            F.col("id") - reach_back,
        )
        .otherwise(F.col("id"))
        .alias("text_key"),
    )
    toks = [
        F.substring(F.md5(F.concat_ws("#", F.col("text_key"), F.lit(i))), 1, 8)
        for i in range(10)
    ]
    return base.select("doc_id", F.concat_ws(" ", *toks).alias("text"))


def drive(spark, store, n_batches: int, docs_per_batch: int) -> dict:
    from scrapontologies_spark.streaming.neardup import (
        compact_band_store,
        neardup_filter_batch,
    )

    walls = []
    emitted = 0
    for b in range(n_batches):
        docs = synth_batch(spark, b, docs_per_batch)
        t0 = time.perf_counter()
        novel = neardup_filter_batch(
            docs, store, batch_id=b, writer_id="bench"
        )
        emitted += novel.count()
        walls.append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    compacted = compact_band_store(spark, store)
    compact_wall = round(time.perf_counter() - t0, 3)
    return {
        "batch_walls_sec": walls,
        "first_batch_sec": walls[0],
        "last_batch_sec": walls[-1],
        "total_sec": round(sum(walls), 3),
        "emitted": emitted,
        "compacted_rows": compacted,
        "compact_sec": compact_wall,
    }


def _drop_store_tables(spark, table: str) -> None:
    """Drop the store table AND its compaction-swap leftovers: a bench run
    killed mid-compaction leaves ``<t>__old``/``<t>__compacting``, which
    makes BucketedBandStore.read refuse (crashed-mid-swap guard) and every
    later bench run fail at batch 0 unless they are cleared here."""
    for t in (table, table + "__old", table + "__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def seed_rows(spark, n_rows: int):
    """Synthetic PRIOR store rows (NULL writer/batch — the compacted form):
    md5-derived band keys that never collide with a real batch's keys, so
    the probe measures pure join cost at store scale."""
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        (F.col("id") % 4).cast("int").alias("band_idx"),
        F.md5(F.concat_ws("!", F.lit("seed"), F.col("id"))).alias("band_key"),
        F.lit(None).cast("bigint").alias("batch_id"),
        F.lit(None).cast("string").alias("writer"),
    )


def probe_at_scale(spark, tmp: str, seed: int, docs_per_batch: int) -> dict:
    """Crossover measurement: seed both layouts with ``seed`` PRIOR rows,
    then time ONE batch verdict against each.  The parquet probe must
    shuffle all ``seed`` rows; the bucketed probe scans them co-partitioned
    (no store-side Exchange) and only shuffles the batch."""
    from scrapontologies_spark.streaming.neardup import (
        BucketedBandStore,
        neardup_filter_batch,
    )

    out = {}
    pq_dir = os.path.join(tmp, f"seeded_parquet_{seed}")
    seed_rows(spark, seed).write.mode("overwrite").parquet(pq_dir)
    t0 = time.perf_counter()
    neardup_filter_batch(
        synth_batch(spark, 1, docs_per_batch), pq_dir, batch_id=1,
        writer_id="seeded",
    ).count()
    out["parquet_probe_sec"] = round(time.perf_counter() - t0, 3)

    _drop_store_tables(spark, "ndbench_seeded")
    store = BucketedBandStore("ndbench_seeded", n_buckets=16)
    store.append(seed_rows(spark, seed))
    t0 = time.perf_counter()
    neardup_filter_batch(
        synth_batch(spark, 1, docs_per_batch), store, batch_id=1,
        writer_id="seeded",
    ).count()
    out["bucketed_probe_sec"] = round(time.perf_counter() - t0, 3)
    _drop_store_tables(spark, "ndbench_seeded")
    return out


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    docs_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000

    from scrapontologies_spark.session import build_session
    from scrapontologies_spark.streaming.neardup import (
        BucketedBandStore,
        neardup_filter_batch,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = build_session(
        app_name="neardup-store-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ndbench_")
    # full-plan warm-up (shingle→minhash→band→probe→append) against a
    # throwaway store IN EACH LAYOUT, or the first-run layout absorbs
    # session start-up + codegen in its batch-0 wall — and the bucketed
    # layout would absorb CREATE TABLE + first bucketed-insert codegen in
    # its timed window while the parquet layout got them amortized,
    # systematically overstating the bucketed first_batch_sec
    neardup_filter_batch(
        synth_batch(spark, 0, docs_per_batch),
        os.path.join(tmp, "warmup_store"),
        batch_id=0,
        writer_id="warmup",
    ).count()
    _drop_store_tables(spark, "ndbench_warmup")
    neardup_filter_batch(
        synth_batch(spark, 0, docs_per_batch),
        BucketedBandStore("ndbench_warmup", n_buckets=16),
        batch_id=0,
        writer_id="warmup",
    ).count()
    _drop_store_tables(spark, "ndbench_warmup")
    try:
        parquet_res = drive(
            spark, os.path.join(tmp, "store_parquet"), n_batches, docs_per_batch
        )
        _drop_store_tables(spark, "ndbench_store")
        bucketed_res = drive(
            spark, BucketedBandStore("ndbench_store", n_buckets=16),
            n_batches, docs_per_batch,
        )
        _drop_store_tables(spark, "ndbench_store")
        assert parquet_res["emitted"] == bucketed_res["emitted"], (
            "layouts must emit identical novel sets"
        )
        seeded = probe_at_scale(spark, tmp, seed, docs_per_batch)
        print(json.dumps({
            "metric": "neardup_store_probe",
            "n_batches": n_batches,
            "docs_per_batch": docs_per_batch,
            "parquet": parquet_res,
            "bucketed": bucketed_res,
            "seeded_store_rows": seed,
            "seeded": seeded,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
