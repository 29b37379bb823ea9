"""Warehouse: stage-checkpointed storage + lineage metrics + resume.

The reference mutates parser-global state in place with no checkpointing
(SURVEY §4: failure handling = skip/raise/retry, no resume).  At corpus
scale every stage boundary instead writes a table + a manifest marker, so a
restarted job skips completed stages and produces identical output
(BASELINE north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Format: parquet in this sandbox; the writer goes through ``format(...)`` so
an Iceberg catalog (``df.writeTo(table).using("iceberg")``) is a config
switch, not a rewrite — no Iceberg jars ship in this container.

Metrics: one row per completed stage (stage, rows, wall_ms, fingerprint)
appended to ``_metrics``; fingerprint is an order-independent xor of row
hashes so cross-run output equality is checkable without a diff.

Lineage: one row per checkpoint FILE (stage, file, rows, fingerprint)
appended to ``_lineage`` — the per-partition lineage rows of the north_rule.
The file is the durable partition unit (what a restarted reader re-reads);
stage totals are derived from the same aggregation (count sums, bit_xor is
associative), so lineage and metrics can never disagree.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageInfo:
    name: str
    rows: int
    wall_ms: int
    fingerprint: int
    skipped: bool = False


class Warehouse:
    def __init__(self, root: str, fmt: str = "parquet"):
        self.root = root.rstrip("/")
        self.fmt = fmt
        os.makedirs(f"{self.root}/_manifest", exist_ok=True)

    # -- manifest ------------------------------------------------------------

    def _marker(self, name: str) -> str:
        return f"{self.root}/_manifest/{name}.json"

    def is_complete(self, name: str) -> bool:
        return os.path.exists(self._marker(name))

    def _commit(self, info: StageInfo) -> None:
        tmp = self._marker(info.name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "stage": info.name,
                    "rows": info.rows,
                    "wall_ms": info.wall_ms,
                    "fingerprint": info.fingerprint,
                },
                f,
            )
        os.replace(tmp, self._marker(info.name))  # atomic: marker is the commit point

    # -- stage I/O -----------------------------------------------------------

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def write_stage(
        self,
        df: DataFrame,
        name: str,
        partition_by: Optional[Iterable[str]] = None,
    ) -> StageInfo:
        t0 = time.monotonic()
        w = df.write.mode("overwrite").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(name))
        spark = df.sparkSession
        out = spark.read.format(self.fmt).load(self.path(name))
        # per-file lineage rows; stage totals fold out of the SAME rows
        # (count sums, bit_xor is associative), so _lineage and _metrics
        # cannot disagree.  Totals come from this in-memory frame — never
        # from re-reading _lineage, whose rows from a crashed earlier
        # attempt (marker not yet committed) would double-count; such
        # orphans reference files the overwrite has already deleted and are
        # superseded by the marker being the single commit point.
        lin = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.count("*").alias("rows"),
                F.bit_xor(F.xxhash64(*out.columns)).alias("fingerprint"),
            )
            .select(F.lit(name).alias("stage"), "file", "rows", "fingerprint")
            .persist()
        )
        lin.write.mode("append").format(self.fmt).save(f"{self.root}/_lineage")
        agg = lin.agg(
            F.sum("rows").alias("n"),
            F.bit_xor("fingerprint").alias("h"),
        ).collect()[0]
        lin.unpersist()
        info = StageInfo(
            name=name,
            rows=agg["n"] if agg["n"] is not None else 0,
            wall_ms=int((time.monotonic() - t0) * 1000),
            fingerprint=agg["h"] if agg["h"] is not None else 0,
        )
        self._append_metrics(spark, info)
        self._commit(info)
        return info

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str,
        n_buckets: int,
        sort: bool = True,
    ) -> None:
        """Catalog table bucketed (and sorted) by ``bucket_col`` — the
        cross-RUN co-location lever: two tables bucketed the same way
        (same column, same ``n_buckets``) join on that column with NO
        exchange on either side (plan-asserted in tests), so the nightly
        reconcile of entities_prev ⋈ entities_new skips both corpus-sized
        shuffles.  This is the parquet stand-in for Iceberg's
        ``bucket(N, id)`` hidden partitioning named in SURVEY §1.4/§4.

        Bucketing metadata lives in the session catalog (saveAsTable);
        the data itself is plain ``self.fmt`` files under the warehouse
        root, one directory per table."""
        w = (
            df.write.mode("overwrite")
            .format(self.fmt)
            .option("path", self.path(table))
            .bucketBy(n_buckets, bucket_col)
        )
        if sort:
            w = w.sortBy(bucket_col)
        w.saveAsTable(table)

    def read_stage(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format(self.fmt).load(self.path(name))

    def _append_metrics(self, spark: SparkSession, info: StageInfo) -> None:
        row = [(info.name, info.rows, info.wall_ms, info.fingerprint)]
        spark.createDataFrame(
            row, "stage string, rows long, wall_ms long, fingerprint long"
        ).write.mode("append").format(self.fmt).save(f"{self.root}/_metrics")

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.format(self.fmt).load(f"{self.root}/_metrics")

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.format(self.fmt).load(f"{self.root}/_lineage")

    # -- resumable orchestration ----------------------------------------------

    def run_stage(
        self,
        spark: SparkSession,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: Optional[Iterable[str]] = None,
    ) -> tuple[DataFrame, StageInfo]:
        """Build-and-write unless the manifest already marks the stage
        complete; either way return the stored DataFrame (so downstream
        stages read the checkpoint, not the lineage — restart-safe)."""
        if self.is_complete(name):
            with open(self._marker(name)) as f:
                meta = json.load(f)
            return (
                self.read_stage(spark, name),
                StageInfo(name, meta["rows"], 0, meta["fingerprint"], skipped=True),
            )
        info = self.write_stage(build(), name, partition_by)
        return self.read_stage(spark, name), info
