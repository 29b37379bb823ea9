"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k via JVM-side higher-order functions
(zip_with + aggregate — no Python in the loop).  Scale path: LSH bucketing
with deterministic random-hyperplane signs derived from md5 (seedable,
rerun-stable), so only same-bucket pairs are scored — the IVF-style
candidate reduction for the 100 TB design point.

All arithmetic is double-precision with fixed left-to-right array order, so
results are reproducible and DuckDB-checkable to 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query row (queries ⊆ embeddings
    schema).  Broadcast the (small) query side; rank deterministically by
    (-similarity, neighbor id).  Returns (query_id, neighbor_id, cosine,
    rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qvec"), F.col("nvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("nvec")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "lsh",
) -> DataFrame:
    """Sign-LSH bucket per vector: plane p's weight for dimension d is
    +1/-1 from bit parity of md5(seed#p#d) — deterministic, no stored model.
    Returns (vec_id, bucket string of n_planes sign bits).

    At scale: bucketing is a narrow transform; the downstream same-bucket
    self-join replaces the full cross join (candidates only).
    """
    vec = F.col(vec_col)
    dims = F.size(vec)
    sign_bits = []
    for p in range(n_planes):
        # weight_d = +1 if first hex nibble of md5("seed#p#d") is even
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), dims - 1),
                lambda x, d: x.cast("double")
                * F.when(
                    (
                        F.conv(
                            F.substring(F.md5(F.concat_ws("#", F.lit(seed), F.lit(p), d)), 1, 1),
                            16,
                            10,
                        ).cast("int")
                        % 2
                    )
                    == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sign_bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.concat(*sign_bits).alias("bucket")
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only pairs that share a bucket in ANY of
    ``n_tables`` independent sign-LSH tables (multi-probe union — the
    standard recall lever; one table alone is far too lossy).  Returns
    (query_id, neighbor_id, cosine, rank); recall < 1 by construction —
    compare against cosine_topk_bruteforce to measure it.

    Scale shape: candidate generation is n_tables narrow bucket hashes +
    same-bucket self-joins on short string keys; the distance computation
    touches candidates only.  Tuning n_planes trades bucket size (compute)
    against recall."""
    buckets = None
    for t in range(n_tables):
        bt = hyperplane_bucket(
            embeddings, n_planes, id_col, vec_col, seed=f"lsh{t}"
        ).select(
            F.col("vec_id").alias("_bid"),
            F.concat(F.lit(f"{t}|"), F.col("bucket")).alias("bucket"),
        )
        buckets = bt if buckets is None else buckets.unionByName(bt)
    left = buckets.select(F.col("_bid").alias("query_id"), "bucket")
    right = buckets.select(F.col("_bid").alias("neighbor_id"), "bucket")
    cand = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    e_q = embeddings.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e_n = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        cand.join(e_q, "query_id")
        .join(e_n, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qvec"), F.col("nvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("nvec")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
