"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline; a sign-bit LSH
bucketed variant as the scale path (candidate generation shrinks the
pairwise space from O(n·m) to per-bucket). Dot products run as native
``F.aggregate`` folds (JVM-side higher-order functions — no Python).

Scale notes: at 100 TB the brute-force path broadcast-joins a small query
set against the corpus (one scan, no shuffle); the LSH path shuffles once
on the bucket key; the IVF path broadcast-assigns every vector to its
nearest centroid cell and searches only the query's cell — candidate count
drops by ~K with one equi-join on the cell id.
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


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    centroid_vec_col: str = "cv",
    n_best: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_best`` nearest centroids by
    dot-product rank (IVF coarse quantizer; n_best=1 is the storage
    assignment, n_best=nprobe is the query-side probe set). Centroids
    broadcast (K is small); the rank is a per-id window with a
    deterministic tiebreak on cell id, so assignment is reproducible
    across engines. Output: vectors + ``cell`` (one row per kept cell).

    At scale this is a map-side-only operation: broadcast join + window
    over K rows per vector (AQE keeps it one stage); the corpus is never
    shuffled for assignment."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(cell_col),
        dot(F.col(vec_col), F.col(centroid_vec_col)).alias("_cscore"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cscore").desc(), F.col(cell_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_best)
        .drop("_rn", "_cscore")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    nprobe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: score cosine only inside the query's
    ``nprobe`` nearest centroid cells. Same output shape as
    brute_force_topk; recall < 1.0 by construction — the exactness
    baseline quantifies it, and recall rises monotonically with nprobe
    (each probe adds a disjoint candidate cell; candidates stay unique
    because every corpus vector lives in exactly one cell). Candidate
    cost scales as nprobe/K of the corpus — the standard IVF
    recall-vs-cost dial."""
    cand = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    qcells = ivf_assign(
        queries,
        centroids,
        id_col=query_id_col,
        vec_col=query_vec_col,
        n_best=nprobe,
    )
    joined = cand.join(
        F.broadcast(
            qcells.select(
                query_id_col, "cell", F.col(query_vec_col)
            )
        ),
        "cell",
    )
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
