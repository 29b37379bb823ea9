"""Property-based cross-engine parity fuzzing.

Hypothesis generates documents tables over a deliberately hostile
alphabet — regex metacharacters, backslashes, quotes, newlines/tabs,
CJK, emoji, combining accents, `%`/`$`/backticks — and runs the most
boundary-sensitive query/oracle pairs on each example.  The hand-picked
adversarial fixtures (test_adversarial_parity) pin known shapes; this
module searches for UNKNOWN ones: any text where Spark's token-split /
regexp formulations and the DuckDB oracles disagree shrinks to a minimal
counterexample.

Examples are kept small (12 docs) and few (10) because each runs real
Spark jobs; the alphabet does the work, not the volume.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# hostile alphabet: ASCII words + every class that has bitten a
# cross-engine formulation before (plus the gazetteer terms so the
# mention/fold paths actually fire)
_PIECES = st.sampled_from(
    [
        "join", "scan", "hash", "query", "the", "fast",
        " ", "  ", "\t", "\n",
        ",", ".", ";", "(", ")", "[", "]", "{", "}",
        "\\", "\\b", "\\n", "$", "%", "^", "*", "+", "?", "|",
        "'", '"', "`", "``", "```",
        "é", "ü", "ß", "的", "和", "表", "🚀", "é",
        "_", "-", "0", "42", "join_x", "2join",
        "NA", "",
    ]
)
_TEXTS = st.lists(_PIECES, min_size=0, max_size=24).map("".join)

# the boundary-sensitive pairs worth fuzzing (all read only `documents`)
FUZZ_QUERIES = ("m1_term_mentions", "text_token_stats", "text_lang_id",
                "text_fingerprint")


def _docs_frame(texts: "list[str | None]") -> pd.DataFrame:
    n = len(texts)
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(n), dtype="int64"),
            "text": texts,
            "lang": [("en", "de", "fr", "es")[i % 4] for i in range(n)],
            "source": [f"src{i % 3}" for i in range(n)],
            "n_chars": pd.array(
                [len(t) if t is not None else None for t in texts],
                dtype="Int64",
            ),
        }
    )


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,  # stable CI: the search is seeded, failures replay
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.one_of(st.none(), _TEXTS), min_size=4, max_size=12))
def test_fuzzed_documents_match_oracles(spark, tmp_path_factory, texts):
    from scrapontologies_spark.plans import driver_queries as DQ

    d = str(tmp_path_factory.mktemp("fuzz"))
    # explicit schema: an all-None text column would otherwise infer as
    # the parquet NULL type, which DuckDB binds as INTEGER
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64())]
    )
    pq.write_table(
        pa.Table.from_pandas(_docs_frame(texts), schema=schema,
                             preserve_index=False),
        os.path.join(d, "documents.parquet"),
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        for name in FUZZ_QUERIES:
            sp = DQ.queries()[name](spark, d).toPandas()
            du = con.execute(DQ.oracle_sql()[name]).fetchdf()
            assert len(sp) == len(du), (name, texts, len(sp), len(du))
            cols = sorted(sp.columns)
            a = sp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
            b = du.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, atol=1e-6
                )
            except AssertionError as e:  # surface the shrunk corpus
                raise AssertionError(f"{name} diverged on {texts!r}: {e}")
    finally:
        con.close()


# props fuzzing: JSON fragments, fence markers, escapes — the shapes that
# stress the fence-extraction regex and the json_valid-guarded extractor.
# COMPLETE JSON documents appear only standalone, never concatenated:
# '{"k":1}{"k":1}' is a documented out-of-envelope class (Jackson
# prefix-parses it, strict validators reject — see the f4 oracle note),
# so the fuzzer must not generate it; fragment pieces cannot assemble a
# complete document followed by trailing content because '}' only closes
# what '{' opened within the same fragment string
_PROPS_FRAGMENTS = st.sampled_from(
    [
        "{", "}", '"', "\\", "```", "```json", " ", "\n", "\t",
        "not json", "null", "1", "k", ":", ",", "的", "🚀", "", "$.k", "$",
    ]
)
_PROPS_WHOLE = st.sampled_from(
    ['{"k": 1}', '{"k": null}', '{"k": "v"}', "{}", "[1, 2]",
     ' {"k": 2} ', '{"k": {"n": [1]}}']
)
_PROPS = st.one_of(
    _PROPS_WHOLE,
    st.lists(_PROPS_FRAGMENTS, min_size=0, max_size=8).map("".join).filter(
        # a fragment like '{' + '"' + ... could still luck into a complete
        # doc with trailing junk; cheap guard: reject anything whose
        # strict-parse prefix is a complete JSON value with a remainder
        lambda s: not _jackson_lenient_only(s)
    ),
)


def _jackson_lenient_only(s: str) -> bool:
    """True when s is NOT one valid JSON document but HAS a valid strict
    prefix (the engine-dependent prefix-parse class)."""
    import json

    try:
        json.loads(s)
        return False  # fully valid — both engines agree
    except json.JSONDecodeError:
        pass
    try:
        json.JSONDecoder().raw_decode(s.lstrip())
        return True  # valid prefix + remainder: Jackson-only territory
    except (json.JSONDecodeError, ValueError):
        return False  # invalid everywhere — both engines say NULL

EVENT_FUZZ_QUERIES = ("p1_fence_extract", "f4_json_extract")


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.one_of(st.none(), _PROPS), min_size=4, max_size=12))
def test_fuzzed_events_match_oracles(spark, tmp_path_factory, props):
    from scrapontologies_spark.plans import driver_queries as DQ

    d = str(tmp_path_factory.mktemp("fuzz_ev"))
    n = len(props)
    frame = pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime(
                [pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i)
                 for i in range(n)]
            ).astype("datetime64[us]"),
            "user_id": pd.array([i % 3 for i in range(n)], dtype="int64"),
            "event_type": ["view"] * n,
            "value": [float(i) for i in range(n)],
            "props": props,
        }
    )
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )
    pq.write_table(
        pa.Table.from_pandas(frame, schema=schema, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        for name in EVENT_FUZZ_QUERIES:
            sp = DQ.queries()[name](spark, d).toPandas()
            du = con.execute(DQ.oracle_sql()[name]).fetchdf()
            assert len(sp) == len(du), (name, props)
            cols = sorted(sp.columns)
            a = sp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
            b = du.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, atol=1e-6
                )
            except AssertionError as e:
                raise AssertionError(f"{name} diverged on {props!r}: {e}")
    finally:
        con.close()
