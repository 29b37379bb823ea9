"""SparkSession builder with the engine's scale-oriented defaults.

The reference's only environment probe is ``is_poppler_installed``
(pdf_parser.py:37-43, SURVEY §2.1 S4); our analog validates the session
config at build time.  Defaults are chosen for the 100 TB design point and
scaled down by the session's core count for sandbox runs:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (every Python-side operator is a batched pandas UDF)
- explicit shuffle partition count (callers size it to cluster cores)
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def _default_shuffle_partitions(master: str, local_cores: int) -> int:
    """2× the session's core count: parsed from an explicit ``local[N]``
    (also ``local[*]`` and ``local[N,maxFailures]``) master so
    ``build_session(master="local[32]")`` is not undersized to the
    ``local_cores`` default's 16."""
    m = re.fullmatch(r"local\[(\d+|\*)(?:,\d+)?\]", master)
    if m:
        if m.group(1) == "*":
            return 2 * (os.cpu_count() or local_cores)
        return 2 * int(m.group(1))
    return 2 * local_cores


def build_session(
    app_name: str = "scrapontologies-spark",
    master: str | None = None,
    local_cores: int = 8,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = (extra_conf or {}).get("spark.master") or master or f"local[{local_cores}]"
    settings = {
        "spark.master": master,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            if shuffle_partitions is not None
            else _default_shuffle_partitions(master, local_cores)
        ),
        # 128 MB scan splits: the 100 TB default; harmless locally.
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    }
    # extra_conf wins over the defaults (applied last, and reflected in the
    # validation below so a fresh session configured via extra_conf never
    # draws a spurious warning)
    settings.update({k: str(v) for k, v in (extra_conf or {}).items()})

    # getActiveSession() is thread-local; getOrCreate reuses the
    # PROCESS-global session (and an existing bare SparkContext), so check
    # those to catch reuse from any thread
    from pyspark import SparkContext

    pre_existing = (
        getattr(SparkSession, "_instantiatedSession", None) is not None
        or getattr(SparkContext, "_active_spark_context", None) is not None
    )

    b = SparkSession.builder.appName(app_name)
    for k, v in settings.items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    # S4-style validation.  getOrCreate applies modifiable SQL confs to a
    # pre-existing session, but STATIC settings (spark.master, driver
    # memory and friends) keep their creation-time values — and the conf
    # MAP cannot be trusted to detect this: Spark 4 copies every requested
    # option into it even when the option did not take effect (verified:
    # conf.get('spark.master') reports the requested value while
    # sparkContext.master still holds the real one).  So check the master
    # through the SparkContext, and for static extra_conf keys warn on the
    # pre-existing-session condition itself.
    import warnings

    actual_master = spark.sparkContext.master
    if actual_master != master:
        warnings.warn(
            f"build_session: live SparkSession runs master={actual_master!r}, "
            f"requested {master!r} — fixed at session creation; stop the "
            "existing session first if it matters",
            RuntimeWarning,
            stacklevel=2,
        )
    # "spark.sql." confs are usually runtime-modifiable, but a few are
    # fixed at session creation despite the prefix
    static_sql = {
        "spark.sql.warehouse.dir",
        "spark.sql.extensions",
        "spark.sql.catalogImplementation",
    }
    static_keys = [
        k
        for k in (extra_conf or {})
        if not k.startswith("spark.sql.") or k in static_sql
    ]
    if pre_existing and static_keys:
        warnings.warn(
            "build_session: reusing a live SparkSession — static settings "
            f"{static_keys} from extra_conf are NOT applied to an existing "
            "session (only runtime SQL confs are); stop it first if they "
            "matter",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark
