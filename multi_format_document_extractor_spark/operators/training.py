"""Training-set assembly for LLM data pipelines (engine extension).

The reference ends at per-document extraction; a pretraining pipeline then
needs corpus-level assembly: quality gating, language selection, dedup
keeper selection, deterministic train/val/test splitting, and fixed-token
sequence packing. All of it is native Column arithmetic over the enriched
table — no UDFs, no extra Arrow stages — and every step is engine-portable
(md5-derived hashing only), so the full chain is DuckDB-oracle-checkable.

Scale notes:
- Every step is a projection/filter or a bucket-partitioned window — the
  only shuffles are the exact-dedup groupBy and the packing window's
  hash partitioning, both on uniform md5-derived keys (no skew).
- ``pack_sequences`` packs within hash buckets, not via one global-order
  window: a global ordered cumsum would serialize onto a single
  partition. Greedy concat-and-chunk packing is bucket-local by design;
  packing efficiency is unaffected (buckets are corpus-scale) and the
  window parallelizes across buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textstats as TS

# enough headroom that (bucket, bin) packs into one BIGINT sequence id
_PACK_BINS_PER_BUCKET = 1_000_000_000


def hash_bucket(col: Column, n: int) -> Column:
    """Deterministic, engine-portable bucket in [0, n): first 8 md5 hex
    chars of the stringified value, mod n. (xxhash64 would be faster but is
    Spark-only; md5 keeps the DuckDB oracle exact.)"""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash: stable across runs and cluster sizes, no sampling state. Adds a
    ``split`` column ('train' | 'val' | 'test')."""
    b = hash_bucket(F.col(id_col), 100)
    return df.withColumn(
        "split",
        F.when(b < test_pct, "test")
        .when(b < test_pct + val_pct, "val")
        .otherwise("train"),
    )


def quality_gate(
    df: DataFrame,
    text_col: str,
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
) -> DataFrame:
    """Pretraining quality gate: composite quality floor, language allow-
    list (heuristic lang_id), and token-count band. Adds the enrichment
    columns (quality, lang_pred, n_tokens) and filters — all inside one
    codegen span, evaluated at the scan when the source is columnar."""
    t = F.col(text_col)
    out = df.withColumn("quality", TS.quality_score(t)).withColumn(
        "lang_pred", TS.lang_id(t)
    ).withColumn("n_tokens", TS.token_count_ws(t))
    out = out.where(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
    )
    if langs is not None:
        out = out.where(F.col("lang_pred").isin(langs))
    return out


def dedup_keepers(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one document per identical normalized content (lowest
    id wins) — one shuffle on the md5 fingerprint."""
    w = Window.partitionBy(TS.fingerprint(F.col(text_col))).orderBy(
        F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic order (hash bucket, then id) and cut into fixed
    ``budget``-token sequences; each document is assigned the sequence its
    FIRST token lands in (standard pretraining packing, where documents
    straddling a boundary are split by the tokenizer downstream).

    Adds ``seq_id`` (globally unique BIGINT), ``seq_offset`` (the
    document's starting token offset within its sequence). The window
    partitions by bucket — parallel, skew-free — never by a global order.
    """
    b = hash_bucket(F.col(id_col), n_buckets)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("_bucket", b)
        .withColumn("_cum", F.sum(F.col(token_col)).over(w))
        .withColumn("_start", F.col("_cum") - F.col(token_col))
    )
    return (
        out.withColumn(
            "seq_id",
            F.col("_bucket") * F.lit(_PACK_BINS_PER_BUCKET)
            + F.floor(F.col("_start") / budget),
        )
        .withColumn(
            "seq_offset", F.col("_start") - F.floor(F.col("_start") / budget) * budget
        )
        .drop("_bucket", "_cum", "_start")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
) -> DataFrame:
    """Deterministic per-group quota sample: within each group, rank rows
    by the md5 of their id (a fixed pseudo-random order — same sample
    every run, no sampling state, engine-portable) and keep the first
    ``n_per_group``. The balanced-corpus primitive (e.g. equal documents
    per language); one shuffle on the group key, with the rank evaluated
    map-side."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def assemble_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    pack_budget: int | None = None,
) -> DataFrame:
    """The composed corpus-assembly chain: quality gate → exact-dedup
    keepers → deterministic split (→ optional sequence packing)."""
    out = quality_gate(
        docs,
        text_col,
        min_quality=min_quality,
        langs=langs,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
    )
    out = dedup_keepers(out, text_col, id_col)
    out = hash_split(out, id_col)
    if pack_budget is not None:
        out = pack_sequences(out, id_col, "n_tokens", pack_budget)
    return out
