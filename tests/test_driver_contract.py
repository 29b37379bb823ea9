"""Layer-5 (SURVEY §5.5): run every __spark_entry__.queries() entry on Spark
and its oracle_sql() twin on DuckDB at sf0.01, compare row count + values
(order-insensitive, column-name aligned) — a local predictor of the driver's
CORRECTNESS gate."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# the FULL registry (contract + bench-only demo queries) so NON_CONTRACT
# entries keep their local oracle verification even while off the driver file
from scrapontologies_spark.plans import driver_queries as DQ

QUERY_NAMES = sorted(DQ.queries().keys())


def test_contract_fits_driver_cap():
    """The driver records at most 50 CORRECTNESS rows; every exposed query
    must land in the file (round 2 shipped 53 and 3 went unverified)."""
    q = E.queries()
    assert len(q) <= DQ.DRIVER_QUERY_CAP
    assert set(E.oracle_sql()) <= set(q)
    assert not set(q) & set(DQ.NON_CONTRACT)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    spark_df = DQ.queries()[name](spark, SF_DIR).toPandas()
    oracle = DQ.oracle_sql().get(name)
    if oracle is None:
        # rows-only check (non-SQL-expressible op): must be NON-EMPTY —
        # `>= 0` was a tautology that could never fail, so a broken
        # oracle-less query would pass green
        assert len(spark_df) > 0, f"{name}: rows-only query returned 0 rows"
        return
    duck_df = ddb.execute(oracle).fetchdf()
    assert len(spark_df) == len(duck_df), (
        f"{name}: rowcount spark={len(spark_df)} duckdb={len(duck_df)}"
    )
    a, b = _normalize(spark_df), _normalize(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    # The driver's value-hash renders values, so an int64/float64 divergence
    # (round-1 events_sessionize: 1 vs 1.0) hash-mismatches even when the
    # numbers are equal — require matching dtype KINDS, not just values.
    kinds_a = [a[c].dtype.kind for c in a.columns]
    kinds_b = [b[c].dtype.kind for c in b.columns]
    assert kinds_a == kinds_b, (
        f"{name}: dtype kinds diverge (driver hash would fail): "
        f"spark={list(zip(a.columns, kinds_a))} duckdb={list(zip(b.columns, kinds_b))}"
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-6)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["subj", "pred", "obj", "rel_type"]
