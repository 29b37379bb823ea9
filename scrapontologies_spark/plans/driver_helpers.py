"""Shared helpers for driver-contract queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's documents table — the ONE reader both query families
    share, so a layout change (e.g. a partitioned documents dir) cannot
    silently give them different inputs."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def emb_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's embeddings table (same single-reader rationale)."""
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's events table (same single-reader rationale)."""
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → the corpus shape
    (repo, path, commit, lang, content) per BASELINE input_hint, with
    lang='text' so the prose gazetteer applies."""
    from ..operators.util import spread

    # the driver tables are single parquet files — spread so the fused
    # Python extraction pass downstream isn't serialized on one split
    docs = spread(docs_table(spark, sf_dir), "doc_id")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("path"),
        F.md5(F.col("text")).alias("commit"),
        F.lit("text").alias("lang"),
        F.col("text").alias("content"),
    )
