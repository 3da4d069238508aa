"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → per-band min-hash → bucket
join → Jaccard verify), SimHash, and n-gram Jaccard. All built from native
Spark SQL primitives (+ md5 as the portable hash) so the full chain is
DuckDB-oracle-checkable and stays inside whole-stage codegen.

Scale notes:
- Exact dedup is one shuffle on the fingerprint — the minimum possible.
- MinHash/LSH turns the O(n²) all-pairs problem into per-bucket candidate
  pairs; bucket keys are uniformly distributed md5 strings, so the shuffle
  has no intrinsic skew (identical documents DO collide by design — a
  near-dup-heavy corpus needs a bucket-size cap, exposed as ``max_bucket``).
- Jaccard verification joins token sets only for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd

from ..functions.textstats import fingerprint, words

SHINGLE_K = 3


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups over normalized-text md5. Returns one row per
    distinct content hash: (text_hash, n_docs, keeper_id)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def drop_exact_dups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id document per identical content (one shuffle)."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles_of(w: Column, k: int = SHINGLE_K) -> Column:
    """Word k-shingles from an ALREADY-MATERIALIZED word-array column.

    ``w`` must be a bound column (projected in a previous select), never an
    inline ``split(...)`` expression: Spark does not CSE expressions inside
    higher-order-function lambdas, so an inline split would re-tokenize the
    document for every ``element_at`` — O(words²) per doc (measured 40×
    slowdown on the dedup path)."""
    n = F.size(w)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exploded (id, shingle) pairs — the base relation for MinHash and
    Jaccard. Shuffle-free (narrow explode); tokenization happens exactly
    once per document (see shingles_of)."""
    return (
        df.select(
            F.col(id_col).alias("doc"), words(F.col(text_col)).alias("w")
        )
        .select("doc", F.explode(shingles_of(F.col("w"))).alias("shingle"))
    )


def minhash_bands(
    df: DataFrame, text_col: str, id_col: str, n_bands: int = 4
) -> DataFrame:
    """Per-document banded MinHash signature.

    Band b's hash is ``min(md5(b || ':' || shingle))`` — k independent
    permutations approximated by salted hashes; lexicographic min over md5
    hex is engine-portable. Returns (doc, band, band_min). One shuffle
    (groupBy doc)."""
    sh = doc_shingles(df, text_col, id_col)
    per_band = [
        F.min(F.md5(F.concat(F.lit(f"{b}:"), F.col("shingle")))).alias(f"b{b}")
        for b in range(n_bands)
    ]
    sig = sh.groupBy("doc").agg(*per_band)
    bands = F.explode(
        F.array(
            *[
                F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("band_min"))
                for b in range(n_bands)
            ]
        )
    ).alias("x")
    return sig.select("doc", bands).select("doc", "x.band", "x.band_min")


def lsh_buckets(bands: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Candidate buckets: (band, band_min) cells holding >1 document.
    ``max_bucket`` caps pathological cells (boilerplate-identical corpora)."""
    out = bands.groupBy("band", "band_min").agg(
        F.count("*").alias("n_docs"), F.sort_array(F.collect_list("doc")).alias("docs")
    ).where(F.col("n_docs") > 1)
    if max_bucket is not None:
        out = out.where(F.col("n_docs") <= max_bucket)
    return out


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (a, b) doc pairs sharing any LSH bucket, a < b.
    Self-equi-join on the bucket key — broadcast-free, AQE-skew-splittable."""
    l = bands.alias("l")
    r = bands.alias("r")
    return (
        l.join(r, ["band", "band_min"])
        .where(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, df: DataFrame, text_col: str, id_col: str, threshold: float = 0.8
) -> DataFrame:
    """Exact word-set Jaccard for candidate pairs only.
    Returns (a, b, jaccard) for pairs ≥ threshold."""
    toks = (
        df.select(F.col(id_col).alias("doc"), F.explode(words(F.col(text_col))).alias("w"))
        .distinct()
    )
    sizes = toks.groupBy("doc").agg(F.count("*").alias("n"))
    ta = toks.select(F.col("doc").alias("a"), "w")
    tb = toks.select(F.col("doc").alias("b"), "w")
    inter = (
        pairs.join(ta, "a").join(tb, ["b", "w"]).groupBy("a", "b").agg(
            F.count("*").alias("inter")
        )
    )
    na = sizes.select(F.col("doc").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            rnd(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash per document from word-level md5 bits.

    Bit j is the sign of Σ_tokens (±1), +1 when hex digit j of md5(token)
    has its high bit set. Engine-portable (md5 + CASE + SUM only).
    Returns (doc, simhash INT)."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(words(F.col(text_col))).alias("w")
    )
    h = F.md5(F.col("w"))
    bit_sums = [
        F.sum(
            F.when(F.substring(h, j, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(1, 17)
    ]
    agg = toks.groupBy("doc").agg(*bit_sums)
    sim = sum(
        (
            F.when(F.col(f"s{j}") >= 0, F.lit(1 << (16 - j))).otherwise(0)
            for j in range(1, 17)
        ),
        F.lit(0),
    )
    return agg.select("doc", sim.cast("int").alias("simhash"))
