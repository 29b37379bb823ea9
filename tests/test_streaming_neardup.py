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


# ---------------------------------------------------------------------------
# bucketed catalog-table store (the scale layout) + compaction crash safety
# ---------------------------------------------------------------------------


@pytest.fixture
def bucketed_store(spark):
    """A BucketedBandStore on a fresh table, dropped (with any compaction
    leftovers) after the test."""
    from scrapontologies_spark.streaming.neardup import BucketedBandStore

    store = BucketedBandStore("nd_test_store", n_buckets=8)
    for t in ("nd_test_store", "nd_test_store__old", "nd_test_store__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield store
    for t in ("nd_test_store", "nd_test_store__old", "nd_test_store__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_store_matches_greedy_replay(spark, bucketed_store):
    """The bucketed layout must reach the exact verdicts of the parquet
    layout: same greedy-replay oracle as the dir-store test."""
    got = []
    for bid, rows in enumerate((BATCH1, BATCH2)):
        novel = neardup_filter_batch(_mk_docs(spark, rows), bucketed_store, bid)
        got.extend(sorted(r.doc_id for r in novel.collect()))
    expected = _greedy_replay(
        [_doc_bands(spark, BATCH1), _doc_bands(spark, BATCH2)]
    )
    assert sorted(got) == sorted(set(expected) | {3, 13})


def test_bucketed_store_probe_no_exchange_on_store_side(spark, bucketed_store):
    """The whole point of the bucketed layout: the every-batch semi-join
    probe must NOT shuffle the store.  The store-side subtree of the join
    is a bucketed FileScan (+Sort); every Exchange in the plan sits on the
    small batch side (the ':'-prefixed left branch in the plan tree)."""
    import pyspark.sql.functions as F

    from scrapontologies_spark.streaming.neardup import _batch_band_keys

    neardup_filter_batch(_mk_docs(spark, BATCH1), bucketed_store, 0).collect()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bands = _batch_band_keys(
            _mk_docs(spark, BATCH2), "text", "doc_id", 3, 8, 2
        )
        prior = (
            bucketed_store.read(spark)
            .filter(F.col("writer").isNotNull())
            .select("band_idx", "band_key")
        )
        hits = bands.join(prior, ["band_idx", "band_key"], "left_semi")
        plan = hits._sc._jvm.PythonSQLUtils.explainString(
            hits._jdf.queryExecution(), "simple"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
    exchange_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchange_lines, plan  # the batch side legitimately shuffles
    for ln in exchange_lines:  # ... but the store branch never does
        assert ln.lstrip().startswith(":"), plan


def test_bucketed_store_compaction_swap_and_crash_recovery(spark, bucketed_store):
    """Catalog-rename compaction: suppression preserved after the rewrite;
    a crash between the two renames (live table gone, aside present) makes
    probes FAIL LOUDLY instead of silently restarting an empty store, and
    re-running compact auto-restores."""
    from scrapontologies_spark.streaming.neardup import compact_band_store

    neardup_filter_batch(_mk_docs(spark, BATCH1), bucketed_store, 0).collect()
    neardup_filter_batch(_mk_docs(spark, BATCH2), bucketed_store, 1).collect()
    n = compact_band_store(spark, bucketed_store)
    assert n > 0
    assert not spark.catalog.tableExists("nd_test_store__old")
    assert not spark.catalog.tableExists("nd_test_store__compacting")

    dup = [(40, BATCH1[0][1]), (41, "totally novel words appear here now ok")]
    novel = neardup_filter_batch(_mk_docs(spark, dup), bucketed_store, 2)
    assert {r.doc_id for r in novel.collect()} == {41}

    # simulate the mid-swap crash: live renamed aside, promote never ran
    spark.sql("ALTER TABLE nd_test_store RENAME TO nd_test_store__old")
    with pytest.raises(RuntimeError, match="compaction"):
        bucketed_store.read(spark)
    n2 = compact_band_store(spark, bucketed_store)  # auto-restores + rewrites
    assert n2 >= n  # restored state + batch-2's novel keys, nothing lost
    # NOTHING was lost to the crash: 40 still hits batch-1 keys, and 41 is
    # now suppressed by its own batch-2 arrival (whose keys the restore kept)
    novel = neardup_filter_batch(_mk_docs(spark, dup), bucketed_store, 3)
    assert novel.count() == 0


def test_parquet_compaction_crash_recovery(spark, tmp_path):
    """The dir-store compaction is a rename-aside swap: after a simulated
    crash between renames the probe raises instead of treating the store
    as first-batch, and re-running compact restores the full state."""
    import os

    from scrapontologies_spark.streaming.neardup import compact_band_store

    store = str(tmp_path / "store")
    neardup_filter_batch(_mk_docs(spark, BATCH1), store, 0).collect()
    os.rename(store, store + "__old")  # crash point: aside exists, live gone
    with pytest.raises(RuntimeError, match="compaction"):
        neardup_filter_batch(_mk_docs(spark, BATCH2), store, 1).collect()
    n = compact_band_store(spark, store)  # auto-restores the aside first
    assert n > 0
    assert not os.path.exists(store + "__old")
    dup = [(50, BATCH1[0][1])]
    assert neardup_filter_batch(_mk_docs(spark, dup), store, 2).count() == 0


def test_writer_tag_normalizes_checkpoint_spelling(tmp_path):
    """Equivalent spellings of one checkpoint must map to one writer tag,
    or a restart that respells the path would treat a retried batch's own
    partial append as PRIOR keys and suppress the whole batch."""
    import os

    from scrapontologies_spark.streaming.neardup import _writer_tag

    ck = str(tmp_path / "ck")
    assert _writer_tag(ck) == _writer_tag(ck + "/")
    assert _writer_tag(ck) == _writer_tag(ck + "//")
    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        assert _writer_tag("ck") == _writer_tag(ck)  # relative == absolute
    finally:
        os.chdir(cwd)
    # URI spellings shed trailing slashes but keep their scheme
    assert _writer_tag("s3a://bkt/ck/") == _writer_tag("s3a://bkt/ck")
    assert _writer_tag("s3a://bkt/ck") != _writer_tag(ck)
    # distinct checkpoints stay distinct
    assert _writer_tag(ck) != _writer_tag(str(tmp_path / "other"))


def test_compact_never_written_store_is_a_noop(spark, tmp_path):
    """Maintenance compaction that runs before the stream's first batch (or
    against a mistyped path / never-created table) must return 0, not die
    on read()'s None with an AttributeError."""
    from scrapontologies_spark.streaming.neardup import (
        BucketedBandStore,
        compact_band_store,
    )

    assert compact_band_store(spark, str(tmp_path / "never_written")) == 0

    spark.sql("DROP TABLE IF EXISTS nd_never_written")
    assert BucketedBandStore("nd_never_written").compact(spark) == 0
    assert not spark.catalog.tableExists("nd_never_written")


def test_neardup_null_and_short_text_pass_through(spark, tmp_path):
    """A doc whose text yields no shingles (NULL, empty, or fewer tokens
    than k) has no bands, so it can never be suppressed NOR suppress
    anything — it must pass through every batch untouched rather than
    crash the plan or silently vanish (fingerprint-less rows are exact
    dedup's job, upstream)."""
    store = str(tmp_path / "store")
    rows = [(1, None), (2, ""), (3, "one two"), (4, "a b c d e f g h")]
    out0 = neardup_filter_batch(
        _mk_docs(spark, rows), store, batch_id=0, writer_id="t"
    )
    assert {r.doc_id for r in out0.collect()} == {1, 2, 3, 4}
    # same fingerprint-less docs again (new ids): still emitted — nothing
    # was stored for them, and the real doc 4's repeat IS suppressed
    rows1 = [(11, None), (12, ""), (13, "one two"), (14, "a b c d e f g h")]
    out1 = neardup_filter_batch(
        _mk_docs(spark, rows1), store, batch_id=1, writer_id="t"
    )
    assert {r.doc_id for r in out1.collect()} == {11, 12, 13}
