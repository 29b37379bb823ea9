"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline (SURVEY.md §3 EP2:
chunk → M1 extraction → order-sensitive per-doc fold → triples) over the
driver's ``documents`` table treated as the corpus.  ``queries`` /
``oracle_sql`` expose each implemented operator from SURVEY.md §2 with a
DuckDB-checkable ANSI-SQL oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → corpus shape
    (repo, path, commit, lang, content) per BASELINE input_hint."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("path"),
        F.md5(F.col("text")).alias("commit"),
        F.lit("text").alias("lang"),
        F.col("text").alias("content"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline on sf0.001 documents → (subj, pred, obj,
    rel_type) triples.  The driver checks rows>0 and a stable schema."""
    from scrapontologies_spark.plans.pipeline import run_pipeline

    corpus = _documents_as_corpus(spark, SF0001)
    res = run_pipeline(corpus, chunk_bytes=1024, with_schemas=False)
    return res.triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scrapontologies_spark.plans import driver_queries

    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    from scrapontologies_spark.plans import driver_queries

    return driver_queries.oracle_sql()
