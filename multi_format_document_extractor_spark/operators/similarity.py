"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline; a sign-bit LSH
bucketed variant as the scale path (candidate generation shrinks the
pairwise space from O(n·m) to per-bucket). Dot products run as native
``F.aggregate`` folds (JVM-side higher-order functions — no Python).

Scale notes: at 100 TB the brute-force path broadcast-joins a small query
set against the corpus (one scan, no shuffle); the LSH path shuffles once
on the bucket key. An IVF upgrade would replace sign buckets with learned
centroids — same plan shape (bucket column + equi-join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right fold (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set against
    the corpus — a single scan with no shuffle of the big side; the top-k is
    a per-query window (TakeOrdered under AQE). Deterministic tiebreak on id."""
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        rnd(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def sign_lsh_bucket(vec: Column, dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41, 49, 57)) -> Column:
    """Coordinate-sign LSH: one bit per probed dimension (1-indexed).
    Deterministic, engine-portable; a production variant would use seeded
    random hyperplanes (same plan shape, literal hyperplanes inlined)."""
    bucket = F.lit(0)
    for i, d in enumerate(dims):
        bucket = bucket + F.when(
            F.element_at(vec, d) >= 0, F.lit(1 << i)
        ).otherwise(0)
    return bucket.cast("int")


def lsh_ann_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Approximate near-neighbor pairs: bucket by sign-LSH, score cosine
    only within buckets. One shuffle on the bucket key."""
    b = vectors.select(
        F.col(id_col), F.col(vec_col), sign_lsh_bucket(F.col(vec_col)).alias("bucket")
    )
    l = b.select(
        F.col("bucket"), F.col(id_col).alias("a"), F.col(vec_col).alias("va")
    )
    r = b.select(
        F.col("bucket"), F.col(id_col).alias("b"), F.col(vec_col).alias("vb")
    )
    return (
        l.join(r, "bucket")
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            rnd(cosine(F.col("va"), F.col("vb")), 4).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
