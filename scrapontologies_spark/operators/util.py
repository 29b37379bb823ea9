"""Shared physical-layout helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *cols: str, factor: int = 2) -> DataFrame:
    """Ensure ``df`` has at least defaultParallelism × factor partitions
    before a compute-heavy fan-out (shingle explode, pair scoring, per-row
    HOF work).

    A scan with fewer splits than cores serializes everything downstream of
    it; this repartitions ONLY in that case, so at cluster scale (scan
    splits ≫ cores) it is a no-op and no corpus-wide shuffle is added.  The
    partition count is explicit because AQE coalesces small-byte shuffles
    regardless of downstream cost.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    if cols:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)
