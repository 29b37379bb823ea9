#!/usr/bin/env python3
"""Adversarial driver-shaped tables for the cross-engine oracle sweep.

The driver's sf tables are benign: 500/500 distinct texts, no NULLs, no
equal timestamps, no zero-norm vectors.  This generator writes the same
ten-table star schema (TESTDATA.md shapes, single parquet FILES) filled
with the hostile shapes the fixtures lack — NULL/empty/whitespace/CJK/
emoji text, exact-duplicate groups, boundary n_chars, NULL lang/source,
zero-norm / duplicate / huge / denormal / NULL embeddings, equal and NULL
event timestamps, malformed JSON props, session-gap-boundary spacing,
NULL group keys and predicate-boundary values in the TPC-H tables — so
every registry query meets its DuckDB oracle on data where engines
actually disagree when a formulation is sloppy (\\b, NULL ordering, NaN,
ties, NULL propagation; see the parity-trap catalog in the repo docs).

Everything is index-derived and deterministic: no RNG, no wall clock.

Usage: python scripts/adversarial_tables.py [out_dir]   (default
bench_data/adversarial) — then:
      python scripts/cross_scale_check.py <out_dir> 8
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TERMS = ("join", "scan", "hash", "sort", "merge", "filter",
         "group", "window", "agg", "batch", "stream", "query")
STOP = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def _docs(n: int = 240) -> pd.DataFrame:
    texts: list = []
    langs: list = []
    sources: list = []
    for i in range(n):
        t: "str | None"
        if i == 0:
            t = None                                 # NULL text (P4)
        elif i == 1:
            t = ""                                   # empty (P4)
        elif i == 2:
            t = "NA"                                 # literal NA (P4)
        elif i == 3:
            t = "   "                                # whitespace-only
        elif i == 4:
            t = "的和表快 join query 的"               # CJK + terms
        elif i == 5:
            t = "theé fast join"                     # unicode-adjacent marker
        elif i == 6:
            t = "join,query.join;hash(join)"         # punctuation boundaries
        elif i in (8, 9):
            t = "join scan hash join scan hash"      # exact-dup pair
        elif i in (10, 20, 30):
            t = "merge sort filter merge sort"       # 3-way dup group
        elif i == 11:
            t = "join"                               # single token
        elif i == 12:
            t = " ".join(["batch stream"] * 40)      # heavy repetition
        elif i == 13:
            t = "join\tquery\nhash"                  # tab/newline separators
        elif i == 14:
            t = " ".join(STOP)                       # stopwords only
        elif i == 15:
            t = "Join QUERY Hash"                    # case sensitivity
        elif i == 16:
            t = "join_1 2join join2 _join join_"     # word-char adjacency
        elif i == 17:
            t = "🚀 join 🚀 query"                   # astral-plane codepoints
        elif i == 18:
            t = "mail a@b.com phone 555-123-4567 ssn 000-11-2222 join"
        elif i == 23:
            t = ("join " * 30)[:150]                 # n_chars == 150 (J2 edge)
        elif i == 24:
            t = ("scan " * 31)[:151]                 # n_chars == 151
        else:
            # formulaic filler: mixed terms + stopwords, length varies
            k = i % 7 + 2
            t = " ".join(
                (TERMS[(i + j) % len(TERMS)] if j % 3 else STOP[(i + j) % len(STOP)])
                for j in range(4 * k)
            )
        texts.append(t)
        langs.append(
            None if i == 19 else "" if i == 21
            else ("en", "de", "fr", "es")[i % 4]
        )
        sources.append(None if i == 22 else f"src{i % 10}")
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(n), dtype="int64"),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": pd.array(
                [len(t) if t is not None else None for t in texts],
                dtype="Int64",
            ),
        }
    )


def _embeddings(n: int = 120, dim: int = 64) -> pd.DataFrame:
    vecs: list = []
    for i in range(n):
        if i == 0:
            v = np.zeros(dim, dtype=np.float32)       # zero-norm (guard path)
        elif i in (1, 2):
            v = np.arange(dim, dtype=np.float32) / dim  # identical pair (tie)
        elif i == 3:
            v = None                                   # NULL embedding
        elif i == 4:
            v = np.full(dim, 1.0e18, dtype=np.float32)  # huge magnitudes
        elif i == 5:
            v = np.full(dim, 1.0e-30, dtype=np.float32)  # denormal-scale
        elif i == 6:
            v = np.full(dim, np.nan, dtype=np.float32)   # all-NaN (corrupt)
        elif i == 7:
            v = np.arange(dim, dtype=np.float32)
            v[0] = np.nan                                # one NaN component
        elif i == 8:
            v = np.arange(dim, dtype=np.float32)
            v[0] = np.inf                                # +Inf component
        elif i == 9:
            v = np.arange(dim, dtype=np.float32)
            v[0] = -np.inf                               # -Inf component
        elif i == 10:
            # NULL ELEMENT inside the array (distinct from NaN!): Spark's
            # fold propagates it to a NULL cosine, but DuckDB's
            # list_aggregate SKIPS nulls and would score the damaged
            # vector as if whole — the shape that forced _cos_sql's
            # explicit NULL-element guard
            v = [None] + [float(x) for x in range(1, dim)]
            vecs.append(v)
            continue
        else:
            # deterministic pseudo-clustered: 8 centroid patterns + index jitter
            c = i % 8
            base = np.sin(np.arange(dim) * (c + 1) * 0.37).astype(np.float32)
            jit = np.cos(np.arange(dim) + i).astype(np.float32) * 0.05
            v = base + jit
            if i % 11 == 0:
                v = -v                                 # negative mirror
        vecs.append(None if v is None else v.tolist())
    return pd.DataFrame(
        {
            "vec_id": pd.array(range(n), dtype="int64"),
            "embedding": vecs,
            "label": pd.array(
                [None if i == 7 else i % 10 for i in range(n)], dtype="Int32"
            ),
        }
    )


def _events(n: int = 1600) -> pd.DataFrame:
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows: list = []
    types = ("view", "click", "purchase", "error", "signup")
    for i in range(n):
        uid: "int | None" = i % 40
        ts: "pd.Timestamp | None"
        if i % 97 == 0:
            ts = None                                  # NULL ts (asof guard)
        elif i % 13 == 0:
            ts = base + pd.Timedelta(minutes=(i // 13) * 7)  # shared-ts cluster
            uid = 7                                    # same user, EQUAL ts
        elif i % 17 == 0:
            # exact session-gap boundary: consecutive events 30 min apart
            ts = base + pd.Timedelta(minutes=30 * (i // 17))
            uid = 9
        else:
            ts = base + pd.Timedelta(seconds=37 * i % (86400 * 30))
        et = None if i % 101 == 0 else "" if i % 103 == 0 else types[i % 5]
        if i % 19 == 0:
            props = None                               # NULL props (P1 coalesce)
        elif i % 23 == 0:
            props = "not json"                         # malformed (F4)
        elif i % 29 == 0:
            props = '{"k": null}'
        elif i % 31 == 0:
            props = '{"k": "s`t`r"}'
        elif i % 37 == 0:
            props = '{"k": {"nested": [1, 2]}}'
        elif i % 41 == 0:
            props = "```json {\"k\": 1} ```"           # fence chars INSIDE props
        else:
            props = '{"k": %d}' % (i % 100)
        val = None if i % 43 == 0 else float(np.nan) if i % 211 == 0 else \
            round((i % 500) / 7.0 - 20.0, 3)
        rows.append(
            (i, ts, None if i % 53 == 0 else uid, et, val, props)
        )
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("Int64")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


def _tpch() -> "dict[str, pd.DataFrame]":
    region = pd.DataFrame(
        {"r_regionkey": pd.array(range(3), dtype="int32"),
         "r_name": ["AMERICA", "EUROPE", None]}
    )
    nation = pd.DataFrame(
        {"n_nationkey": pd.array(range(6), dtype="int32"),
         "n_name": ["US", "DE", "FR", None, "JP", "BR"],
         "n_regionkey": pd.array([0, 1, 1, 0, 2, 0], dtype="int32")}
    )
    nc = 40
    customer = pd.DataFrame(
        {
            "c_custkey": pd.array(range(nc), dtype="int64"),
            "c_name": [None if i == 5 else f"Customer#{i:03d}" for i in range(nc)],
            "c_nationkey": pd.array([i % 6 for i in range(nc)], dtype="int32"),
            "c_acctbal": [
                None if i == 7 else round(i * 31.17 - 400.0, 2) for i in range(nc)
            ],
            "c_mktsegment": [
                None if i % 11 == 0 else ("BUILDING", "MACHINERY", "AUTOMOBILE")[i % 3]
                for i in range(nc)
            ],
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": pd.array(range(12), dtype="int64"),
            "s_name": [f"Supplier#{i}" for i in range(12)],
            "s_nationkey": pd.array([i % 6 for i in range(12)], dtype="int32"),
            "s_acctbal": [None if i == 3 else i * 97.5 - 200 for i in range(12)],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": pd.array(range(30), dtype="int64"),
            "p_name": [None if i == 9 else f"part {TERMS[i % 12]}" for i in range(30)],
            "p_brand": [f"Brand#{i % 5}" for i in range(30)],
            "p_type": [("ANODIZED", "BURNISHED", None)[i % 3] for i in range(30)],
            "p_size": pd.array([i % 50 for i in range(30)], dtype="int32"),
            "p_retailprice": [round(900 + i * 10.01, 2) for i in range(30)],
        }
    )
    no = 120
    base = pd.Timestamp("1995-01-01")
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(no), dtype="int64"),
            # customers 35..39 place no orders; custkey 0 is hot (skew)
            "o_custkey": pd.array(
                [0 if i % 5 == 0 else i % 35 for i in range(no)], dtype="int64"
            ),
            "o_orderstatus": [("O", "F", "P")[i % 3] for i in range(no)],
            "o_totalprice": [
                None if i == 11 else round(1000 + i * 77.7, 2) for i in range(no)
            ],
            "o_orderdate": pd.to_datetime(
                [base + pd.Timedelta(days=i % 400) for i in range(no)]
            ).astype("datetime64[us]"),
            "o_orderpriority": [
                None if i % 13 == 0 else f"{i % 5 + 1}-PRIO" for i in range(no)
            ],
        }
    )
    nl = 600
    sbase = pd.Timestamp("1994-01-01")
    lineitem = pd.DataFrame(
        {
            # orders 100..119 have no lineitems; many lines per early order
            "l_orderkey": pd.array([i % 100 for i in range(nl)], dtype="int64"),
            "l_partkey": pd.array([i % 30 for i in range(nl)], dtype="int64"),
            "l_suppkey": pd.array([i % 12 for i in range(nl)], dtype="int64"),
            "l_linenumber": pd.array([i // 100 + 1 for i in range(nl)], dtype="int32"),
            # q6 boundary: quantity exactly 24 (predicate is < 24)
            "l_quantity": [float(24) if i % 25 == 0 else float(i % 49 + 1) for i in range(nl)],
            "l_extendedprice": [round(100 + (i % 997) * 3.14, 2) for i in range(nl)],
            # q6 boundary: discounts exactly at 0.05 / 0.07 (BETWEEN edges)
            "l_discount": [
                (0.05, 0.06, 0.07, 0.0, 0.1)[i % 5] for i in range(nl)
            ],
            "l_tax": [round((i % 9) / 100.0, 2) for i in range(nl)],
            # q1 groups by returnflag/linestatus: include NULL group keys
            "l_returnflag": [None if i % 59 == 0 else ("A", "N", "R")[i % 3] for i in range(nl)],
            "l_linestatus": [None if i % 61 == 0 else ("O", "F")[i % 2] for i in range(nl)],
            # q6 boundary: shipdate exactly 1994-01-01 and 1995-01-01
            "l_shipdate": pd.to_datetime(
                [sbase + pd.Timedelta(days=(i * 7) % 366) for i in range(nl)]
            ).astype("datetime64[us]"),
        }
    )
    return {
        "region": region, "nation": nation, "customer": customer,
        "supplier": supplier, "part": part, "orders": orders,
        "lineitem": lineitem,
    }


def _docs_skew(n: int = 2000) -> pd.DataFrame:
    """Skewed corpus: 30% of rows are ONE exact-duplicate text (a mega
    group for dedup/CC), 10% a second group, one source holds 70% of
    docs — the shapes that make naive dedup/groupBy plans quadratic or
    hot-partitioned at 100 TB."""
    texts = []
    for i in range(n):
        if i % 10 < 3:
            t = "join scan hash merge sort the fast table"     # mega group
        elif i % 10 == 3:
            t = "filter group window agg batch stream"          # second group
        else:
            k = i % 5 + 3
            t = " ".join(TERMS[(i + j) % len(TERMS)] for j in range(3 * k))
        texts.append(t)
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(n), dtype="int64"),
            "text": texts,
            "lang": [("en", "de", "fr", "es")[i % 4] for i in range(n)],
            "source": ["src0" if i % 10 < 7 else f"src{i % 10}" for i in range(n)],
            "n_chars": pd.array([len(t) for t in texts], dtype="Int64"),
        }
    )


def _embeddings_skew(n: int = 1000, dim: int = 64) -> pd.DataFrame:
    """50% of vectors are EXACTLY identical: one degenerate LSH/IVF bucket
    plus maximal top-k tie pressure (every member is every other member's
    perfect neighbor — deterministic id tie-breaks are load-bearing)."""
    hot = (np.sin(np.arange(dim) * 0.73) * 0.5).astype(np.float32)
    vecs = []
    for i in range(n):
        if i % 2 == 0:
            v = hot
        else:
            c = i % 8
            v = (np.sin(np.arange(dim) * (c + 1) * 0.37)
                 + np.cos(np.arange(dim) + i) * 0.05).astype(np.float32)
        vecs.append(v.tolist())
    return pd.DataFrame(
        {
            "vec_id": pd.array(range(n), dtype="int64"),
            "embedding": vecs,
            "label": pd.array([i % 10 for i in range(n)], dtype="Int32"),
        }
    )


def _events_skew(n: int = 20000) -> pd.DataFrame:
    """One user owns half the stream (hot session/asof partition), with
    long equal-timestamp runs inside it (tie-break pressure)."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    types = ("view", "click", "purchase", "error", "signup")
    for i in range(n):
        uid = 7 if i % 2 == 0 else i % 50
        # hot user: bursts of 20 events at the SAME timestamp
        ts = base + pd.Timedelta(minutes=(i // 40) * 3 if uid == 7 else i % 7200)
        rows.append(
            (i, ts, uid, types[i % 5],
             round((i % 500) / 7.0, 3), '{"k": %d}' % (i % 100))
        )
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


def write_skew(
    out_dir: str, n_docs: int = 2000, n_vecs: int = 1000, n_events: int = 20000
) -> None:
    """Skewed variant: same schemas, mass duplication / hot keys instead
    of NULL edges.  TPC-H tables reuse the NULL-edge generator (the skew
    queries only read documents/embeddings/events, but the full ten-table
    layout keeps cross_scale_check's view registration uniform)."""
    os.makedirs(out_dir, exist_ok=True)
    tables = {"documents": _docs_skew(n_docs),
              "embeddings": _embeddings_skew(n_vecs),
              "events": _events_skew(n_events), **_tpch()}
    _write_tables(tables, out_dir)


def _write_tables(tables: "dict[str, pd.DataFrame]", out_dir: str) -> None:
    for name, df in tables.items():
        if name == "embeddings":
            # build the list column directly (from_pandas=False): pandas
            # conversion treats float NaN as NULL, silently turning the
            # NaN-component vectors into NULL-element vectors — a
            # DIFFERENT hostile shape (both are covered, explicitly)
            tbl = pa.table(
                {
                    "vec_id": pa.array(
                        df["vec_id"].tolist(), type=pa.int64()
                    ),
                    "embedding": pa.array(
                        list(df["embedding"]),
                        type=pa.list_(pa.float32()),
                        from_pandas=False,
                    ),
                    "label": pa.array(df["label"], type=pa.int32()),
                }
            )
        else:
            tbl = pa.Table.from_pandas(df, preserve_index=False)
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {len(df)} rows")


def write_all(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tables = {"documents": _docs(), "embeddings": _embeddings(),
              "events": _events(), **_tpch()}
    _write_tables(tables, out_dir)


def write_empty(out_dir: str) -> None:
    """Zero-row tables with the EXACT column types of the populated ones
    (a naive `df.iloc[0:0]` loses object-column types and pyarrow infers
    INT, which poisons every downstream cast).  The empty-input edge is
    routine at scale — any filter can produce it — so every query must
    run and agree with its oracle on it."""
    os.makedirs(out_dir, exist_ok=True)
    tables = {"documents": _docs(), "embeddings": _embeddings(),
              "events": _events(), **_tpch()}
    for name, df in tables.items():
        schema_override = None
        if name == "embeddings":
            schema_override = pa.schema(
                [("vec_id", pa.int64()),
                 ("embedding", pa.list_(pa.float32())),
                 ("label", pa.int32())]
            )
        full = pa.Table.from_pandas(
            df, schema=schema_override, preserve_index=False
        )
        pq.write_table(full.slice(0, 0), os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: 0 rows")


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    variant = ("adversarial_skew" if "--skew" in flags
               else "adversarial_empty" if "--empty" in flags
               else "adversarial")
    out = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_data", variant,
    )
    fn = (write_skew if "--skew" in flags
          else write_empty if "--empty" in flags
          else write_all)
    fn(out)
