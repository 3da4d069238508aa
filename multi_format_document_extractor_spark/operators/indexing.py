"""Inverted-index construction (serving-side search artifact).

One public function shared by the registry query (`plans/queries_web.py
inverted_index`) and its cap-exactness pytest, so the capped-posting
logic cannot drift between what ships and what is tested (the registry
composition rule applied to test code).

Scale shape (see PLANS.md §16): three linear Exchanges over slim
(token, doc)-grain rows — the (token, doc) tf aggregation (map-side
combined), the posting-rank window on (token, subbucket) so a stopword's
posting set splits across ``n_sub`` tasks instead of sorting
corpus-cardinality rows on one, and the final token aggregation whose
partial aggregation bounds per-map state to one scalar row plus
≤ cap·n_sub candidate structs per token. df/tf_total stay exact over ALL
rows; only the posting SAMPLE is capped (the anchor_texts bounded-agg
rule — an uncapped collect_list on a stopword is an OOM).

Cap exactness under subbucketing: every global top-``cap`` row (by
(md5(doc), doc)) is top-``cap`` within its own subbucket, so sorting the
≤ cap·n_sub survivors and slicing ``cap`` reproduces the unpartitioned
window's answer — the DuckDB oracle computes that single window
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_inverted_index(
    tok: DataFrame, cap: int = 8, n_sub: int = 16
) -> DataFrame:
    """(doc_id, token) occurrence rows → one row per token:
    (token, df, tf_total, postings) with ``postings`` the first ``cap``
    doc ids in deterministic (md5(doc), doc) order, comma-joined.
    Scale ``n_sub`` to the cluster (tasks per stopword posting set)."""
    td = tok.groupBy("token", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    td = td.withColumn(
        "m", F.md5(F.col("doc_id").cast("string"))
    ).withColumn("_sub", F.pmod(F.col("doc_id"), F.lit(n_sub)))
    w = Window.partitionBy("token", "_sub").orderBy("m", "doc_id")
    rk = td.withColumn("rk", F.row_number().over(w))
    return rk.groupBy("token").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("tf_total"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rk") <= cap,
                                F.struct(F.col("m"), F.col("doc_id")),
                            )
                        )
                    ),
                    1,
                    cap,
                ),
                lambda x: x["doc_id"].cast("string"),
            ),
            ",",
        ).alias("postings"),
        # the cap this index was built with, carried AS DATA so it
        # survives any store/reload and the merge can enforce its
        # precondition (ADVICE r3: an unrecorded cap made the merge's
        # head-containment argument unenforceable)
        F.first(F.lit(cap)).cast("int").alias("build_cap"),
    )


def merge_inverted_indexes(
    a: DataFrame, b: DataFrame, cap: int = 8
) -> DataFrame:
    """Merge two inverted indexes built over DISJOINT doc-id sets into
    the index of the union — the incremental-maintenance step: a crawl
    batch indexes only its own delta (corpus-scale work proportional to
    the BATCH), then this aggregate-level merge folds it into the stored
    index without ever re-scanning the old corpus.

    Exactness: df/tf_total add (disjoint docs), and the merged posting
    sample equals the from-scratch build's because each side's capped
    list is its md5-order head — the union head of two heads is the head
    of the union (same superset argument as the subbucket cap in
    ``build_inverted_index``; the oracle checks merge ≡ full rebuild).
    The md5 sort keys are recomputed from the posting ids with a nested
    HOF — pure codegen, no explode. Shape: ONE full-outer equi-join on
    the token key over index-sized (not corpus-sized) rows.

    PRECONDITION: ``cap`` must not exceed the cap either input was built
    with — the union-head argument only covers the stored heads, so a
    larger slice would claim positions the inputs never carried. Indexes
    from ``build_inverted_index`` record their cap in the ``build_cap``
    column, and the merge ENFORCES the precondition against it: a
    violating call raises at execution (``raise_error`` guard — constant-
    folded to zero cost when the caps are plan-time literals, a cheap
    per-index-row check when the index was reloaded from storage). A
    hand-shaped frame without ``build_cap`` keeps the documented-
    precondition behavior (nothing to validate against). Rows with an
    empty postings string (not producible by ``build_inverted_index``,
    but the operator accepts arbitrary index-shaped frames) contribute
    nothing to the merged head."""

    empty = F.array().cast("array<struct<m:string,doc:bigint>>")

    def keyed(df, side):
        # "d1,d2" -> array<struct<m,doc>> in stored (md5-sorted) order;
        # '' -> [] (F.split('', ',') is [''], which would smuggle a
        # NULL-doc struct into a head slot)
        col = F.col("postings")
        arr = F.when(col == "", empty).otherwise(
            F.transform(
                F.split(col, ","),
                lambda x: F.struct(
                    F.md5(x).alias("m"), x.cast("bigint").alias("doc")
                ),
            )
        )
        if "build_cap" in df.columns:
            arr = F.when(
                F.col("build_cap") < F.lit(cap),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"merge_inverted_indexes(cap={cap}) exceeds the "
                            f"{side} input's build cap "
                        ),
                        F.col("build_cap").cast("string"),
                        F.lit(
                            ": the stored posting heads cannot back a "
                            "larger head"
                        ),
                    )
                ).cast("array<struct<m:string,doc:bigint>>"),
            ).otherwise(arr)
        return arr

    la = a.select(
        "token",
        F.col("df").alias("_dfa"),
        F.col("tf_total").alias("_tfa"),
        keyed(a, "left").alias("_pa"),
    )
    lb = b.select(
        "token",
        F.col("df").alias("_dfb"),
        F.col("tf_total").alias("_tfb"),
        keyed(b, "right").alias("_pb"),
    )
    j = la.join(lb, "token", "full_outer")
    merged = F.slice(
        F.array_sort(
            F.concat(
                F.coalesce(F.col("_pa"), empty),
                F.coalesce(F.col("_pb"), empty),
            )
        ),
        1,
        cap,
    )
    return j.select(
        "token",
        (
            F.coalesce(F.col("_dfa"), F.lit(0))
            + F.coalesce(F.col("_dfb"), F.lit(0))
        ).cast("bigint").alias("df"),
        (
            F.coalesce(F.col("_tfa"), F.lit(0))
            + F.coalesce(F.col("_tfb"), F.lit(0))
        ).cast("bigint").alias("tf_total"),
        F.array_join(
            F.transform(merged, lambda x: x["doc"].cast("string")), ","
        ).alias("postings"),
        # merged index is only good for this cap (chained merges validate
        # against it like build outputs)
        F.lit(cap).cast("int").alias("build_cap"),
    )


__all__ = ["build_inverted_index", "merge_inverted_indexes"]
