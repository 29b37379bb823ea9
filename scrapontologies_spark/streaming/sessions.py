"""Stateful streaming sessionization — applyInPandasWithState.

The batch twin is ``operators/events.sessionize`` (same gap semantics, same
output shape); this is the custom stateful streaming operator the SURVEY
scale plan calls for: per-user session state lives in the state store, a
session CLOSES (is emitted) when a later event arrives more than
``gap_minutes`` after the previous one, and the still-open tail session
stays in state across micro-batches (flushed by a later batch, or by the
processing-time state timeout when ``state_timeout_minutes`` is set — the
continuous-deployment path).

Determinism: events are sorted (ts, event_id) within each group call, the
gap comparison runs on integer epoch microseconds, and session_idx is
1-based in time order — identical numbering to the batch operator, so the
closed-session prefix of the stream equals the batch result minus each
user's final (still-open) session (pinned in tests/test_streaming.py).
``total_value`` rounds HALF_UP on the decimal repr — the exact semantics
of Spark's ``F.round`` in the batch twin (Python's builtin ``round`` is
half-EVEN on the binary value and diverges at boundary sums like 2.675).

Late data (cross-micro-batch disorder): an event older than the open
session's last event MERGES into it — extending session_start backward
when it lands within ``gap_minutes`` before the current start — so
session_end can never precede session_start and batch parity holds for
any disorder bounded by the gap.  An event too old even for that (before
start − gap) is emitted immediately as a single-event session with the
sentinel ``session_idx = 0``: visible, never silently dropped (O8
discipline), and distinguishable from in-order numbering.  Already-closed
sessions cannot be reopened — that is the streaming/batch divergence a
watermarked source should prevent upstream.

NULL-timestamp events are dropped at the group boundary: an event with no
time cannot be placed in any session, and letting its NaT through would
poison the state (epoch −2⁶³ns → OutOfBoundsDatetime on emit, aborting
the query on every restart from the same checkpoint).

Scale shape: state is O(1) per user (6 scalars), the shuffle is the same
hash(user_id) exchange the batch plan uses, and each micro-batch touches
only users with new events.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_idx long, session_start timestamp, "
    "session_end timestamp, n_events long, total_value double"
)
# (last event us, session start us, event count, value sum, session index)
STATE_SCHEMA = "last_us long, start_us long, n long, total double, idx long"

_OUT_COLS = [
    "user_id", "session_idx", "session_start",
    "session_end", "n_events", "total_value",
]


def _epoch_us(ts: pd.Series) -> pd.Series:
    # normalize to ns explicitly: astype('int64') on a datetime64 series
    # yields values in the series' OWN unit (us-backed Arrow frames would
    # silently be 1000× off) — pin the unit before taking the integer view
    return pd.to_datetime(ts).astype("datetime64[ns]").astype("int64") // 1000


def _round6(x: float) -> float:
    """HALF_UP on the decimal repr — Spark F.round's semantics (BigDecimal
    of Double.toString), NOT Python round()'s half-even-on-binary, which
    diverges at boundary sums (round(2.675, 2) = 2.67 vs F.round = 2.68)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _emit(rows: list) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=_OUT_COLS)
    df["session_start"] = pd.to_datetime(df["session_start"], unit="us")
    df["session_end"] = pd.to_datetime(df["session_end"], unit="us")
    return df


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    state_timeout_minutes: "float | None" = None,
) -> DataFrame:
    """Streaming gap sessionization: one output row per CLOSED session
    (user_id, session_idx, session_start, session_end, n_events,
    total_value).  ``events`` must be a streaming DataFrame with at least
    (user_col, ts_col, event_id, value_col).

    ``state_timeout_minutes`` — continuous deployments: a user idle for
    this long (processing time) has their open tail session FLUSHED and
    their state removed, bounding the state store by the active-user count
    instead of the all-time distinct-user count.  None (default) keeps the
    availableNow/batch-parity behavior: the tail stays in state."""
    gap_us = int(gap_minutes * 60_000_000)
    timeout_ms = (
        None
        if state_timeout_minutes is None
        else max(1, int(state_timeout_minutes * 60_000))
    )

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if timeout_ms is not None and state.hasTimedOut:
            # idle user: flush the open tail session and drop the state
            last_us, start_us, n, total, idx = state.get
            state.remove()
            if last_us is not None and n > 0:
                yield _emit([(user, idx, start_us, last_us, n, _round6(total))])
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch[ts_col].notna()]  # no time ⇒ no session (see module doc)
        batch = batch.sort_values([ts_col, "event_id"], kind="mergesort")
        if state.exists:
            last_us, start_us, n, total, idx = state.get
        else:
            last_us, start_us, n, total, idx = None, 0, 0, 0.0, 0
        out = []
        ts_us = _epoch_us(batch[ts_col])
        for t, v in zip(ts_us, batch[value_col]):
            t = int(t)
            if last_us is not None and t < last_us:
                # late event from an earlier micro-batch (within-batch rows
                # are sorted): merge into the open session, extending its
                # start backward if needed — NEVER move last_us backward,
                # which would corrupt the gap chain (end < start).
                if t >= start_us - gap_us:
                    start_us = min(start_us, t)
                    n += 1
                    total += float(v)
                else:
                    # too late even to extend: emit as a sentinel
                    # single-event session (idx 0) instead of dropping
                    out.append((user, 0, t, t, 1, _round6(float(v))))
                continue
            if last_us is None or t - last_us > gap_us:
                if last_us is not None:
                    out.append((user, idx, start_us, last_us, n, _round6(total)))
                idx += 1
                start_us, n, total = t, 0, 0.0
            n += 1
            total += float(v)
            last_us = t
        state.update((last_us, start_us, n, total, idx))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield _emit(out)

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
