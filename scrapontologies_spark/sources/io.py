"""Warehouse: stage-checkpointed storage + lineage metrics + resume.

The reference mutates parser-global state in place with no checkpointing
(SURVEY §4: failure handling = skip/raise/retry, no resume).  At corpus
scale every stage boundary instead writes a table + a manifest marker, so a
restarted job skips completed stages and produces identical output
(BASELINE north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Format: parquet in this sandbox; the writer goes through ``format(...)`` so
an Iceberg catalog (``df.writeTo(table).using("iceberg")``) is a config
switch, not a rewrite — no Iceberg jars ship in this container.

Metrics: one row per completed stage (stage, rows, wall_ms, fingerprint)
under ``_metrics/stage=<name>`` (overwritten per attempt — a crashed
attempt leaves no orphan rows); fingerprint is an order-independent
MODULAR SUM of row hashes (Σ xxhash64(row) mod 2⁶³), so cross-run output
equality is checkable without a diff.  Sum, not xor: xor cancels rows with
even multiplicity, so {A,A,C} and {B,B,C} would collide — exactly the
duplication bugs a dedup engine's fingerprint must catch.

Lineage: one row per checkpoint FILE under ``_lineage/stage=<name>`` —
the per-partition lineage rows of the north_rule.  The file is the durable
partition unit (what a restarted reader re-reads); stage totals are
derived from the same aggregation (count sums; the modular sum is
associative), so lineage and metrics can never disagree.  Per-stage
overwrite means a retry after a crash between lineage write and marker
commit replaces the orphan rows instead of appending next to them.

Resume is guarded by a CONFIG TOKEN: ``run_stage(..., config=...)`` stores
a canonical-JSON token in the stage marker and rebuilds when the stored
token differs — re-running a job with changed parameters (filters,
chunking) cannot silently serve a stale checkpoint.  The token covers
declared parameters only; the warehouse root is per-corpus by contract
(input data is snapshot-immutable, as on Iceberg).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageInfo:
    name: str
    rows: int
    wall_ms: int
    fingerprint: int
    skipped: bool = False


_FP_MOD = 2 ** 63

# Optional hook: called as stage_observer(stage_name, "start"|"end") around
# every non-skipped run_stage build+write.  Diagnostics only (the sf1 bench
# installs a heap sampler here to attribute driver-JVM peaks per stage);
# the job's behavior must never depend on it.
stage_observer: Optional[Callable[[str, str], None]] = None


def _config_token(config) -> Optional[str]:
    """Canonical-JSON token for a stage's declared parameters (frozensets
    and sets serialize as sorted lists; None → no token)."""
    if config is None:
        return None

    def default(o):
        if isinstance(o, (set, frozenset)):
            return sorted(o)
        raise TypeError(f"unserializable config value: {o!r}")

    return json.dumps(config, sort_keys=True, default=default)


class Warehouse:
    def __init__(self, root: str, fmt: str = "parquet"):
        if "://" in root and not root.startswith("file:"):
            # manifest markers use driver-local POSIX I/O; a remote root
            # would silently decouple resume state from the data.  At
            # cluster scale the sanctioned storage layer is an Iceberg
            # catalog (SURVEY §1.4), not this local-FS warehouse.
            raise NotImplementedError(
                f"non-local warehouse root {root!r}: the manifest is "
                "driver-local; use an Iceberg catalog for remote storage"
            )
        if root.startswith("file:"):
            # resolve to the POSIX path: Spark resolves the file: URI for
            # the DATA while os.makedirs would treat 'file:///x' as a
            # cwd-RELATIVE dir named 'file:', scattering resume markers
            # per-cwd away from the data — the decoupling the guard above
            # exists to prevent
            from urllib.parse import urlparse

            u = urlparse(root)
            if u.netloc not in ("", "localhost"):
                raise NotImplementedError(
                    f"file: root with a host is not local: {root!r}"
                )
            root = u.path or "/"
        self.root = root.rstrip("/")
        self.fmt = fmt
        os.makedirs(f"{self.root}/_manifest", exist_ok=True)

    # -- manifest ------------------------------------------------------------

    def _marker(self, name: str) -> str:
        return f"{self.root}/_manifest/{name}.json"

    def _read_marker(self, name: str) -> Optional[dict]:
        try:
            with open(self._marker(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def is_complete(self, name: str, config_token: Optional[str] = None) -> bool:
        """Stage complete AND built with the same declared parameters.
        A marker written with a different (or, conservatively, no) token
        than the one now expected does not count as complete."""
        meta = self._read_marker(name)
        if meta is None:
            return False
        return config_token is None or meta.get("config") == config_token

    def _commit(self, info: StageInfo, config_token: Optional[str] = None) -> None:
        tmp = self._marker(info.name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "stage": info.name,
                    "rows": info.rows,
                    "wall_ms": info.wall_ms,
                    "fingerprint": info.fingerprint,
                    "config": config_token,
                },
                f,
            )
        os.replace(tmp, self._marker(info.name))  # atomic: marker is the commit point

    # -- stage I/O -----------------------------------------------------------

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def write_stage(
        self,
        df: DataFrame,
        name: str,
        partition_by: Optional[Iterable[str]] = None,
        config_token: Optional[str] = None,
    ) -> StageInfo:
        t0 = time.monotonic()
        # invalidate any prior marker BEFORE touching the data: a rebuild
        # that crashes mid-overwrite must leave the stage "incomplete" —
        # with the old marker still present, a re-run under the ORIGINAL
        # config would find its token matching and silently serve the
        # half-rebuilt data
        try:
            os.remove(self._marker(name))
        except FileNotFoundError:
            pass
        pb = list(partition_by or [])
        w = df.write.mode("overwrite").format(self.fmt)
        if pb:
            w = w.partitionBy(*pb)
        w.save(self.path(name))
        spark = df.sparkSession
        out = spark.read.format(self.fmt).load(self.path(name))
        # per-file lineage rows; stage totals fold out of the SAME rows
        # (count sums; the modular hash-sum is associative), so _lineage
        # and _metrics cannot disagree.  Per-file fingerprint = Σ
        # xxhash64(row) mod 2⁶³ — multiplicity-sensitive where bit_xor
        # cancels even-multiplicity rows (see module docstring); summed as
        # decimal so the bigint sum cannot overflow under ANSI mode.
        lin = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.count("*").alias("rows"),
                F.pmod(
                    F.sum(F.xxhash64(*out.columns).cast("decimal(38,0)")),
                    F.lit(str(_FP_MOD)).cast("decimal(38,0)"),
                )
                .cast("long")
                .alias("fingerprint"),
            )
            .persist()
        )
        # per-stage partition dir, OVERWRITTEN per attempt: a crash between
        # this write and the marker commit leaves rows a retry replaces,
        # never orphans appended next to live rows.  Readers recover the
        # `stage` column from partition discovery.
        lin.write.mode("overwrite").format(self.fmt).save(
            f"{self.root}/_lineage/stage={name}"
        )
        agg = lin.agg(
            F.sum("rows").alias("n"),
            F.pmod(
                F.sum(F.col("fingerprint").cast("decimal(38,0)")),
                F.lit(str(_FP_MOD)).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("h"),
        ).collect()[0]
        lin.unpersist()
        info = StageInfo(
            name=name,
            rows=agg["n"] if agg["n"] is not None else 0,
            wall_ms=int((time.monotonic() - t0) * 1000),
            fingerprint=agg["h"] if agg["h"] is not None else 0,
        )
        self._append_metrics(spark, info)
        self._commit(info, config_token)
        return info

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str,
        n_buckets: int,
        sort: bool = True,
    ) -> None:
        """Catalog table bucketed (and sorted) by ``bucket_col`` — the
        cross-RUN co-location lever: two tables bucketed the same way
        (same column, same ``n_buckets``) join on that column with NO
        exchange on either side (plan-asserted in tests), so the nightly
        reconcile of entities_prev ⋈ entities_new skips both corpus-sized
        shuffles.  This is the parquet stand-in for Iceberg's
        ``bucket(N, id)`` hidden partitioning named in SURVEY §1.4/§4.

        Bucketing metadata lives in the session catalog (saveAsTable);
        the data itself is plain ``self.fmt`` files under the warehouse
        root, one directory per table."""
        w = (
            df.write.mode("overwrite")
            .format(self.fmt)
            .option("path", self.path(table))
            .bucketBy(n_buckets, bucket_col)
        )
        if sort:
            w = w.sortBy(bucket_col)
        w.saveAsTable(table)

    def read_stage(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format(self.fmt).load(self.path(name))

    def _append_metrics(self, spark: SparkSession, info: StageInfo) -> None:
        row = [(info.rows, info.wall_ms, info.fingerprint)]
        spark.createDataFrame(
            row, "rows long, wall_ms long, fingerprint long"
        ).write.mode("overwrite").format(self.fmt).save(
            f"{self.root}/_metrics/stage={info.name}"
        )

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.format(self.fmt).load(f"{self.root}/_metrics")

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.format(self.fmt).load(f"{self.root}/_lineage")

    # -- resumable orchestration ----------------------------------------------

    def run_stage(
        self,
        spark: SparkSession,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: Optional[Iterable[str]] = None,
        config=None,
    ) -> tuple[DataFrame, StageInfo]:
        """Build-and-write unless the manifest already marks the stage
        complete WITH the same ``config`` (any JSON-serializable value of
        the parameters this stage's output depends on); either way return
        the stored DataFrame (so downstream stages read the checkpoint, not
        the lineage — restart-safe).  A marker from a run with different
        parameters triggers a rebuild instead of serving stale data.

        ``partition_by`` is folded into the token: the stage's on-disk
        LAYOUT is part of its output (partition pruning, bucketed-join
        co-location), so changing it must rebuild rather than silently
        serve the old layout — the same stale-checkpoint class the config
        token exists to prevent."""
        # materialize once: a generator ``partition_by`` consumed here would
        # read as exhausted-but-truthy in write_stage and silently write
        # unpartitioned while the token records the requested layout
        pb = list(partition_by or [])
        token = _config_token({"cfg": config, "partition_by": pb, "fmt": self.fmt})
        meta = self._read_marker(name)
        if meta is not None and meta.get("config") == token:
            return (
                self.read_stage(spark, name),
                StageInfo(name, meta["rows"], 0, meta["fingerprint"], skipped=True),
            )
        # tag the Spark UI / event log with the warehouse stage name, and
        # tell any installed observer (scripts/sf1_bench.py heap profiler)
        # which stage the jobs about to run belong to
        spark.sparkContext.setJobDescription(f"warehouse stage: {name}")
        if stage_observer is not None:
            stage_observer(name, "start")
        try:
            info = self.write_stage(build(), name, pb, config_token=token)
        finally:
            if stage_observer is not None:
                stage_observer(name, "end")
            spark.sparkContext.setJobDescription(None)
        return self.read_stage(spark, name), info
