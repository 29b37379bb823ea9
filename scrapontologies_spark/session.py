"""SparkSession builder with the engine's scale-oriented defaults.

The reference's only environment probe is ``is_poppler_installed``
(pdf_parser.py:37-43, SURVEY §2.1 S4); our analog validates the session
config at build time.  Defaults are chosen for the 100 TB design point and
scaled down by ``local_cores`` for sandbox runs:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (every Python-side operator is a batched pandas UDF)
- explicit shuffle partition count (callers size it to cluster cores)
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "scrapontologies-spark",
    master: str | None = None,
    local_cores: int = 8,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{local_cores}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else 2 * local_cores),
        )
        # 128 MB scan splits: the 100 TB default; harmless locally.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # getOrCreate returns any pre-existing session UNCHANGED — the S4-style
    # validation: warn when the live session's load-bearing settings differ
    # from what this call requested, instead of silently benchmarking /
    # running under the wrong configuration.
    import warnings

    checks = {
        "spark.master": master,
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions if shuffle_partitions is not None else 2 * local_cores
        ),
    }
    for key, want in checks.items():
        got = spark.conf.get(key, None)
        if got is not None and got != want:
            warnings.warn(
                f"build_session: existing SparkSession has {key}={got!r}, "
                f"requested {want!r} — getOrCreate cannot reconfigure a "
                "live session; stop it first if the setting matters",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark
