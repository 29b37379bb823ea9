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
    if _partition_count_at_least(df, target):
        return df
    if cols:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)


# The getNumPartitions probe forces physical planning of the upstream plan;
# memoize the verdict per (session, semantic plan, target) so operator
# chains that spread the same input repeatedly translate the plan once, not
# per call.  The semantic hash covers the LOGICAL plan only, so the memo
# assumes input files are immutable for the life of a session (true for
# this engine's batch runs over snapshot tables) — a path whose file count
# changes mid-session would keep its first verdict until the session ends.
# Stale verdicts cost at most one extra (or one missing) repartition; they
# cannot affect results.
_SPREAD_MEMO: dict = {}
_SPREAD_MEMO_MAX = 1024


def _partition_count_at_least(df: DataFrame, target: int) -> bool:
    try:
        key = (id(df.sparkSession), df.semanticHash(), target)
    except Exception:  # pragma: no cover — analysis failure falls through
        key = None
    if key is not None and key in _SPREAD_MEMO:
        return _SPREAD_MEMO[key]
    enough = df.rdd.getNumPartitions() >= target
    if key is not None:
        if len(_SPREAD_MEMO) >= _SPREAD_MEMO_MAX:
            _SPREAD_MEMO.clear()
        _SPREAD_MEMO[key] = enough
    return enough
