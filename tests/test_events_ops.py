"""Operator-level tests for the time-join operators (asof_join /
interval_join) and the round-2 textops additions (vocabulary / tf_idf /
redact_pii) on crafted fixtures — boundary semantics the sf0.01 contract
data can't guarantee to exercise (no-prior-match, equal-ts ties,
bucket-spanning intervals, pattern edge cases)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from scrapontologies_spark.operators.events import (
    asof_join,
    interval_join,
    sessionize,
)
from scrapontologies_spark.operators.textops import redact_pii, tf_idf, vocabulary


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_asof_join_backward_semantics(spark):
    ev = _events(
        spark,
        [
            # user 1: purchase at :05, events before/at/after it
            (1, 1, _ts(1), "view"),
            (2, 1, _ts(5), "purchase"),
            (3, 1, _ts(5), "view"),  # equal ts to the purchase → matches it
            (4, 1, _ts(9), "view"),
            # user 2: no purchase at all
            (5, 2, _ts(3), "view"),
        ],
    )
    res = asof_join(
        ev.select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase"),
        right_value_cols=("event_id",),
    )
    got = {r["event_id"]: r["prior_event_id"] for r in res.collect()}
    assert got[1] is None  # before any purchase
    assert got[2] == 2  # the purchase matches itself (<=)
    assert got[3] == 2  # equal-ts tie IS a match (right sorts first)
    assert got[4] == 2
    assert got[5] is None  # user without purchases
    assert res.count() == ev.count()  # left-join row preservation


def test_asof_join_equal_ts_right_rows_pick_max_order(spark):
    ev = _events(
        spark,
        [
            (10, 1, _ts(2), "purchase"),
            (11, 1, _ts(2), "purchase"),  # same ts — larger event_id wins
            (12, 1, _ts(7), "view"),
        ],
    )
    res = asof_join(
        ev.select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase"),
        right_value_cols=("event_id",),
    )
    got = {r["event_id"]: r["prior_event_id"] for r in res.collect()}
    assert got[12] == 11


def test_interval_join_bucket_spanning_and_boundaries(spark):
    # 0.05 h = 3 min buckets → the [10:00, 10:10] interval spans several
    # buckets; boundary points are inclusive on both ends
    points = _events(
        spark,
        [
            (1, 1, _ts(0), "x"),  # == start
            (2, 1, _ts(10), "x"),  # == end
            (3, 1, _ts(11), "x"),  # outside
            (4, 2, _ts(5), "x"),  # other key — must not match
        ],
    ).select("user_id", "event_id", "ts")
    intervals = spark.createDataFrame(
        [(1, 1, _ts(0), _ts(10))],
        "user_id long, session_idx long, session_start timestamp, session_end timestamp",
    )
    res = interval_join(points, intervals, bucket_hours=0.05)
    got = sorted(r["event_id"] for r in res.collect())
    assert got == [1, 2]
    # exactly one match per contained point (no bucket-induced duplicates)
    assert res.select("event_id").distinct().count() == res.count()


def test_interval_join_matches_sessionize_assignment(spark):
    rows = [
        (i, u, _ts(m), "view")
        for i, (u, m) in enumerate(
            [(1, 0), (1, 5), (1, 50), (1, 55), (2, 10), (2, 12)]
        )
    ]
    ev = spark.createDataFrame(
        [(i, u, t, k, 1.0) for (i, u, t, k) in rows],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    sess = sessionize(ev, gap_minutes=30).select(
        "user_id", "session_idx", "session_start", "session_end"
    )
    res = interval_join(ev.select("user_id", "event_id", "ts"), sess, bucket_hours=1)
    assert res.count() == ev.count()  # every event lands in exactly one session
    by_event = {r["event_id"]: r["session_idx"] for r in res.collect()}
    assert by_event[0] == 1 and by_event[1] == 1
    assert by_event[2] == 2 and by_event[3] == 2  # >30 min gap → new session


def test_redact_pii_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo-bar.example.org now"),
            (2, "host 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +44 020 794 6000 today"),
            (4, "clean text with no pii at all"),
            (5, "combo x@y.io at 8.8.8.8 tel +1 555 010 99"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) == (1, 0, 0)
    assert "<EMAIL>" in got[1]["redacted"] and "@" not in got[1]["redacted"]
    assert got[2]["n_ipv4"] == 2 and got[2]["redacted"].count("<IP>") == 2
    assert got[3]["n_phones"] == 1 and "<PHONE>" in got[3]["redacted"]
    assert (got[4]["n_emails"], got[4]["n_ipv4"], got[4]["n_phones"]) == (0, 0, 0)
    assert got[4]["redacted"] == "clean text with no pii at all"
    assert (got[5]["n_emails"], got[5]["n_ipv4"], got[5]["n_phones"]) == (1, 1, 1)


def test_vocabulary_and_tf_idf_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a c"),
            (3, "b b b c"),
            (4, ""),  # empty doc: no tokens, but still counts toward N
        ],
        "doc_id long, text string",
    )
    vocab = {r["token"]: r for r in vocabulary(df, top_k=10).collect()}
    assert vocab["b"]["n_occurrences"] == 4 and vocab["b"]["n_docs"] == 2
    assert vocab["a"]["n_occurrences"] == 3 and vocab["a"]["n_docs"] == 2
    assert vocab["c"]["n_occurrences"] == 2 and vocab["c"]["n_docs"] == 2

    # top-k tie-break: equal counts ordered by token asc
    top = vocabulary(df, top_k=2).collect()
    assert [r["token"] for r in top] == ["b", "a"]

    tfidf = {(r["doc_id"], r["token"]): r for r in tf_idf(df).collect()}
    # N=4 docs; df_t(a)=2 → idf = ln(2); tf(1,'a')=2
    assert tfidf[(1, "a")]["tf"] == 2
    assert tfidf[(1, "a")]["df_t"] == 2
    assert abs(tfidf[(1, "a")]["tf_idf"] - round(2 * math.log(4 / 2), 6)) < 1e-9
    assert (4, "a") not in tfidf  # empty doc emits no pairs


def test_sessionize_custom_order_col(spark):
    """The tie-break column is a parameter, not a hard-coded 'event_id' —
    frames without that column must still sessionize."""
    from datetime import datetime

    from scrapontologies_spark.operators.events import sessionize

    rows = [
        (7, datetime(2024, 1, 1, 10, 0), 1.0, 1),
        (7, datetime(2024, 1, 1, 10, 5), 1.0, 2),
        (7, datetime(2024, 1, 1, 12, 0), 1.0, 3),
    ]
    df = spark.createDataFrame(rows, "uid long, clicked_at timestamp, amount double, click_id long")
    out = {
        (r.user_id, r.session_idx): r.n_events
        for r in sessionize(
            df, gap_minutes=30, user_col="uid", ts_col="clicked_at",
            value_col="amount", order_col="click_id",
        ).collect()
    }
    assert out == {(7, 1): 2, (7, 2): 1}


def test_interval_join_tolerates_shared_column_names(spark):
    """The residual containment predicate uses dataframe-qualified
    references, so intervals carrying their own 'ts' column no longer make
    the filter ambiguous."""
    from datetime import datetime

    from scrapontologies_spark.operators.events import interval_join

    pts = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 30), "p1")],
        "user_id long, ts timestamp, pid string",
    )
    ivs = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0),
             datetime(2024, 1, 1, 9, 0), "s1"),
            (1, datetime(2024, 1, 1, 12, 0), datetime(2024, 1, 1, 13, 0),
             datetime(2024, 1, 1, 9, 0), "s2"),
        ],
        "user_id long, session_start timestamp, session_end timestamp, ts timestamp, sid string",
    )
    got = interval_join(pts, ivs).select("pid", "sid").collect()
    assert [(r.pid, r.sid) for r in got] == [("p1", "s1")]


def test_asof_join_forward_semantics(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts(1), "view"),   # next purchase at :05
            (2, 1, _ts(5), "purchase"),
            (3, 1, _ts(5), "view"),   # equal ts → matches (>= semantics)
            (4, 1, _ts(9), "view"),   # no later purchase
            (5, 2, _ts(3), "view"),   # user without purchases
        ],
    )
    res = asof_join(
        ev.select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase"),
        right_value_cols=("event_id",),
        prefix="next_",
        direction="forward",
    )
    got = {r["event_id"]: r["next_event_id"] for r in res.collect()}
    assert got[1] == 2
    assert got[2] == 2  # the purchase matches itself (>=)
    assert got[3] == 2  # equal-ts tie IS a match
    assert got[4] is None
    assert got[5] is None
    assert res.count() == ev.count()


def test_asof_join_forward_equal_ts_right_rows_pick_min_order(spark):
    # mirror of the backward max-order rule: forward picks the SMALLEST
    # order_col among equal-ts right rows
    ev = _events(
        spark,
        [
            (12, 1, _ts(1), "view"),
            (10, 1, _ts(2), "purchase"),
            (11, 1, _ts(2), "purchase"),
        ],
    )
    res = asof_join(
        ev.select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase"),
        right_value_cols=("event_id",),
        direction="forward",
    )
    got = {r["event_id"]: r["prior_event_id"] for r in res.collect()}
    assert got[12] == 10


def test_asof_join_allow_exact_matches_false(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts(5), "view"),      # equal ts to both purchases
            (2, 1, _ts(5), "purchase"),
            (3, 1, _ts(3), "purchase"),
            (4, 1, _ts(8), "purchase"),
        ],
    )
    left = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase")
    back = asof_join(
        left, right, right_value_cols=("event_id",), allow_exact_matches=False
    )
    assert back.collect()[0]["prior_event_id"] == 3  # strict <, skips :05
    fwd = asof_join(
        left,
        right,
        right_value_cols=("event_id",),
        direction="forward",
        allow_exact_matches=False,
    )
    assert fwd.collect()[0]["prior_event_id"] == 4  # strict >, skips :05


def test_asof_join_nearest_semantics(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts(4), "view"),    # 3 min to :01, 4 min to :08 → backward
            (2, 1, _ts(6), "view"),    # 5 min to :01, 2 min to :08 → forward
            (3, 1, _ts(1), "purchase"),
            (4, 1, _ts(8), "purchase"),
            (5, 2, _ts(0), "view"),    # only a later purchase exists
            (6, 2, _ts(9), "purchase"),
            (7, 3, _ts(0), "view"),    # no purchase at all
        ],
    )
    res = asof_join(
        ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase"),
        right_value_cols=("event_id",),
        prefix="near_",
        direction="nearest",
    )
    got = {r["event_id"]: r["near_event_id"] for r in res.collect()}
    assert got[1] == 3
    assert got[2] == 4
    assert got[5] == 6  # one-sided → the existing side wins
    assert got[7] is None


def test_asof_join_nearest_tie_prefers_backward(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts(5), "view"),  # 2 min to both :03 and :07
            (2, 1, _ts(3), "purchase"),
            (3, 1, _ts(7), "purchase"),
        ],
    )
    res = asof_join(
        ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase"),
        right_value_cols=("event_id",),
        direction="nearest",
    )
    assert res.collect()[0]["prior_event_id"] == 2


def test_time_join_reserved_name_guards(spark):
    import pytest as _pytest

    ev = _events(spark, [(1, 1, _ts(0), "view")])
    bad = ev.withColumn("_side", F.lit(0))
    with _pytest.raises(ValueError, match="reserved"):
        asof_join(bad.select("event_id", "user_id", "ts", "_side"), ev)
    with _pytest.raises(ValueError, match="unknown direction"):
        asof_join(ev, ev, direction="sideways")
    pts = ev.select("user_id", "event_id", "ts", F.lit(0).alias("_bkt"))
    ivs = spark.createDataFrame(
        [(1, _ts(0), _ts(9))],
        "user_id long, session_start timestamp, session_end timestamp",
    )
    with _pytest.raises(ValueError, match="reserved"):
        interval_join(pts, ivs)


def test_asof_null_timestamps_match_nothing(spark):
    """merge_asof parity: a left row with ts=NULL matches NOTHING in any
    direction (w_fwd's DESC ordering sorts NULLs last, so every right row
    would otherwise 'precede' it and forward/nearest would hand it the
    earliest right row); a right row with ts=NULL is never a match."""
    from datetime import datetime

    left = spark.createDataFrame(
        [(1, None, 100), (1, datetime(2024, 1, 1, 12, 0), 101)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0), 900),
            (1, None, 901),
            (1, datetime(2024, 1, 2, 0, 0), 902),
        ],
        "user_id long, ts timestamp, event_id long",
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.event_id: r.prior_event_id
            for r in asof_join(left, right, direction=direction).collect()
        }
        assert got[100] is None, direction
        # the valid left row still matches a real (non-NULL-ts) right row
        assert got[101] == (900 if direction != "forward" else 902), direction
