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

import re

from pyspark.sql import SparkSession


def _default_shuffle_partitions(master: str, local_cores: int) -> int:
    """2× the session's core count: parsed from an explicit ``local[N]``
    master so ``build_session(master="local[32]")`` is not undersized to
    the ``local_cores`` default's 16."""
    m = re.fullmatch(r"local\[(\d+)\]", master)
    if m:
        return 2 * int(m.group(1))
    return 2 * local_cores


def build_session(
    app_name: str = "scrapontologies-spark",
    master: str | None = None,
    local_cores: int = 8,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{local_cores}]"
    settings = {
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

    b = SparkSession.builder.appName(app_name).master(master)
    for k, v in settings.items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    # S4-style validation.  getOrCreate DOES apply modifiable SQL confs to
    # a pre-existing session (applyModifiableSettings), but STATIC settings
    # — spark.master above all, plus driver memory and friends passed via
    # extra_conf — stay whatever the live session was created with.  Warn
    # when a load-bearing requested value did not take effect, instead of
    # silently benchmarking / running under the wrong configuration.
    import warnings

    for key in ("spark.master", *(extra_conf or {})):
        want = master if key == "spark.master" else settings[key]
        got = spark.conf.get(key, None)
        if got is not None and got != want:
            warnings.warn(
                f"build_session: live SparkSession has {key}={got!r}, "
                f"requested {want!r} — this setting is fixed at session "
                "creation; stop the existing session first if it matters",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark
