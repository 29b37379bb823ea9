"""Streaming MinHash-LSH near-dup suppression: the greedy
first-arrival-wins rule must match a sequential replay of the batch band
derivation, cross-batch suppression must flow through the persistent band
store, and checkpoint resume must not re-emit processed files."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from scrapontologies_spark.operators.dedup import (
    band_key_rows,
    minhash_signatures,
    shingles,
)
from scrapontologies_spark.streaming.neardup import (
    neardup_filter_batch,
    run_neardup_stream,
)

DOCS_SCHEMA = "doc_id BIGINT, text STRING"


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def _doc_bands(spark, rows):
    """doc_id -> frozenset of (band_idx, band_key) via the batch operators
    — the oracle's view of collisions, independent of the streaming code."""
    df = _mk_docs(spark, rows)
    bands = band_key_rows(
        minhash_signatures(shingles(df, distinct=False), num_hashes=8),
        num_hashes=8,
        band_size=2,
    )
    out: dict = {}
    for r in bands.collect():
        out.setdefault(r.doc_id, set()).add((r.band_idx, r.band_key))
    return {d: frozenset(b) for d, b in out.items()}


def _greedy_replay(batches_bands):
    """Sequential simulation of the documented rule: per batch, bucket
    owner = min doc_id; suppressed = store hit or in-batch loser; ALL batch
    bands enter the store."""
    store: set = set()
    emitted = []
    for batch in batches_bands:
        owners: dict = {}
        for doc in sorted(batch):
            for key in batch[doc]:
                owners.setdefault(key, doc)
        for doc in sorted(batch):
            hit_store = any(key in store for key in batch[doc])
            lost = any(owners[key] < doc for key in batch[doc])
            if not hit_store and not lost:
                emitted.append(doc)
        for doc in batch:
            store.update(batch[doc])
    return emitted


BATCH1 = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "one two three four five six seven eight nine ten"),
    # 2 shares every shingle with 0 -> same signature -> in-batch loser
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "xx"),  # < k tokens: no bands, always emitted
]
BATCH2 = [
    # copy of doc 1's text -> suppressed through the store
    (10, "one two three four five six seven eight nine ten"),
    (11, "red orange yellow green blue indigo violet colors wheel spin"),
    # copy of suppressed doc 2's text -> still suppressed (transitive)
    (12, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (13, "yy"),  # bandless again: emitted despite 3 being bandless too
]


def test_neardup_batch_matches_greedy_replay(spark, tmp_path):
    store = str(tmp_path / "store")
    got = []
    for bid, rows in enumerate((BATCH1, BATCH2)):
        novel = neardup_filter_batch(_mk_docs(spark, rows), store, bid)
        got.extend(sorted(r.doc_id for r in novel.collect()))

    expected = _greedy_replay(
        [_doc_bands(spark, BATCH1), _doc_bands(spark, BATCH2)]
    )
    # bandless docs (3, 13) never enter the band oracle; they are always
    # emitted by contract
    expected = sorted(set(expected) | {3, 13})
    assert sorted(got) == expected
    # the hand-known outcomes hold too
    assert 2 not in got and 10 not in got and 12 not in got
    assert {0, 1, 3, 11, 13} <= set(got)


def test_neardup_stream_resumes_and_suppresses_across_arrivals(
    spark, tmp_path
):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _mk_docs(spark, BATCH1).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
    q = run_neardup_stream(stream, out_dir, store, ckpt)
    assert q.awaitTermination(180)

    first = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert first == {0, 1, 3}

    # second arrival: same checkpoint -> only the new file is processed
    _mk_docs(spark, BATCH2).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
    q = run_neardup_stream(stream, out_dir, store, ckpt)
    assert q.awaitTermination(180)

    rows = spark.read.parquet(out_dir).collect()
    assert {r.doc_id for r in rows} == {0, 1, 3, 11, 13}
    # no re-emission: doc_ids stay unique across the two runs
    assert len(rows) == 5


def test_neardup_store_survives_for_new_batches(spark, tmp_path):
    """A third independent arrival colliding only with suppressed doc 10's
    text is still suppressed (the store holds bands of suppressed docs)."""
    store = str(tmp_path / "store")
    neardup_filter_batch(_mk_docs(spark, BATCH1), store, 0).collect()
    neardup_filter_batch(_mk_docs(spark, BATCH2), store, 1).collect()
    third = [(20, "one two three four five six seven eight nine ten")]
    novel = neardup_filter_batch(_mk_docs(spark, third), store, 2)
    assert novel.count() == 0


def test_neardup_retry_same_batch_id_reproduces_verdict(spark, tmp_path):
    """A foreachBatch retry re-runs the SAME batch_id after the failed
    attempt already appended its band keys: the probe excludes the current
    batch's own rows, so the retry must emit the same novel docs instead
    of suppressing the whole batch against its own keys."""
    store = str(tmp_path / "store")
    neardup_filter_batch(_mk_docs(spark, BATCH1), store, 0).collect()

    first = sorted(
        r.doc_id
        for r in neardup_filter_batch(_mk_docs(spark, BATCH2), store, 1).collect()
    )
    retry = sorted(
        r.doc_id
        for r in neardup_filter_batch(_mk_docs(spark, BATCH2), store, 1).collect()
    )
    assert first == retry == [11, 13]

    # and a LATER batch still sees batch 1's keys as prior
    again = neardup_filter_batch(
        _mk_docs(spark, [(30, BATCH2[1][1])]), store, 2
    )
    assert again.count() == 0


def test_neardup_multiple_microbatches_one_query(spark, tmp_path):
    """maxFilesPerTrigger=1 forces one micro-batch per file inside a single
    availableNow query: the band store must carry verdicts BETWEEN
    micro-batches of the same run (doc 10 dupes doc 1 across files)."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _mk_docs(spark, BATCH1).coalesce(1).write.mode("append").parquet(in_dir)
    _mk_docs(spark, BATCH2).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = run_neardup_stream(stream, out_dir, store, ckpt)
    assert q.awaitTermination(180)

    got = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    # file order is unspecified, but BATCH1/BATCH2 contents are symmetric
    # under the greedy rule: whichever lands first, exactly one of each
    # duplicate-text family survives plus both bandless docs
    assert len(got) == 5, got
    assert len({0, 2, 12} & set(got)) == 1, got  # alpha family: 1 survivor
    assert len({1, 10} & set(got)) == 1, got     # one-two family: 1 survivor
    assert {3, 13} <= set(got) and 11 in got, got


def test_checkpoint_reset_does_not_hide_old_batch_zero(spark, tmp_path):
    """foreachBatch batch_ids restart at 0 with a fresh checkpoint; the
    writer tag (derived from the checkpoint dir) must keep the OLD run's
    batch-0 keys visible as prior — otherwise every duplicate of the old
    first arrival re-admits."""
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    out_dir, store = str(tmp_path / "out"), str(tmp_path / "store")

    _mk_docs(spark, BATCH1).coalesce(1).write.parquet(in1)
    q = run_neardup_stream(
        spark.readStream.schema(DOCS_SCHEMA).parquet(in1),
        out_dir, store, str(tmp_path / "ckpt1"),
    )
    assert q.awaitTermination(180)

    # NEW checkpoint (reset), same store; BATCH2 arrives as ITS batch 0
    _mk_docs(spark, BATCH2).coalesce(1).write.parquet(in2)
    q = run_neardup_stream(
        spark.readStream.schema(DOCS_SCHEMA).parquet(in2),
        out_dir, store, str(tmp_path / "ckpt2"),
    )
    assert q.awaitTermination(180)

    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    # 10 and 12 duplicate batch-0 texts of the FIRST run and must stay out
    assert got == {0, 1, 3, 11, 13}


def test_compact_band_store_preserves_suppression(spark, tmp_path):
    """Compaction rewrites the store as distinct untagged rows; future
    batches must still see every prior key (NULL tags count as prior)."""
    from scrapontologies_spark.streaming.neardup import compact_band_store

    store = str(tmp_path / "store")
    neardup_filter_batch(_mk_docs(spark, BATCH1), store, 0).collect()
    neardup_filter_batch(_mk_docs(spark, BATCH2), store, 1).collect()
    n = compact_band_store(spark, store)
    assert n > 0

    dup = [(40, BATCH1[0][1]), (41, "totally novel words appear here now ok")]
    novel = neardup_filter_batch(_mk_docs(spark, dup), store, 2)
    assert {r.doc_id for r in novel.collect()} == {41}
