"""Event-stream batch operators for the training-data pipeline.

Gap-based sessionization — the canonical stateful event op a 100 TB
pipeline needs (and the batch twin of streaming/incremental's stateful
path).  Shuffle shape: ONE hash partition by user_id serves both the
window (lag) and the session aggregation — Catalyst reuses the exchange,
so sessionize costs a single shuffle.

Determinism: events are ordered by (ts, event_id) within a user; the gap
comparison runs on INTEGER epoch microseconds (unix_micros ↔ DuckDB
epoch_us), so the oracle matches value-exactly with no float rounding.
NTZ timestamps are interpreted in the session timezone (UTC in the driver
harness), matching DuckDB's naive-as-UTC epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Split each user's event stream into sessions separated by gaps of
    more than ``gap_minutes``.  Returns one row per session:
    (user_id, session_idx, session_start, session_end, n_events,
    total_value) — session_idx is 1-based in time order.
    """
    gap_us = int(gap_minutes * 60_000_000)
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(epoch).over(w)
    is_new = F.when(prev.isNull() | ((epoch - prev) > gap_us), 1).otherwise(0)
    with_sess = events.withColumn(
        "session_idx", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sess.groupBy(F.col(user_col).alias("user_id"), "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
    )
