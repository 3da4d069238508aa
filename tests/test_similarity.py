"""Scale-hazard regression tests for the similarity path (round-2 VERDICT
#1/#3): map-side IVF assignment (no corpus shuffle, argmax correctness)
and bounded sign-LSH candidate generation on adversarial same-bucket
corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_format_document_extractor_spark.operators import similarity


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_lsh_dims_spread_and_bounds():
    assert similarity.lsh_dims(8) == (1, 9, 17, 25, 33, 41, 49, 57)
    assert similarity.lsh_dims(4, 16) == (1, 5, 9, 13)
    assert len(set(similarity.lsh_dims(20, 64))) == 20
    with pytest.raises(ValueError):
        similarity.lsh_dims(0)
    with pytest.raises(ValueError):
        similarity.lsh_dims(65, 64)


def test_sign_lsh_bucket_rejects_int_overflow(spark):
    with pytest.raises(ValueError, match="31 probe bits"):
        similarity.sign_lsh_bucket(
            F.col("embedding"), dims=similarity.lsh_dims(32)
        )


def test_ivf_assign_matches_bruteforce_argmax(spark):
    """The literal-centroid fold must pick the same cell as an explicit
    per-vector dot-product argmax (tiebreak: score desc, cell asc)."""
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.7, 0.7, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.0, 0.0, 0.0]),  # score 0 vs every centroid → tie → cell 1
    ]
    cents = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])]
    v = _vecs(spark, vecs)
    c = spark.createDataFrame(cents, "cell int, cv array<double>")
    got = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assign(v, c).collect()
    }
    expect = {}
    for vid, vv in vecs:
        scored = sorted(
            ((-sum(a * b for a, b in zip(vv, cv)), cell) for cell, cv in cents)
        )
        expect[vid] = scored[0][1]
    assert got == expect
    assert got[4] == 1  # deterministic tiebreak on smallest cell id


def test_ivf_assign_nprobe_is_map_side_and_ordered(spark):
    """n_best>1 returns the top cells in rank order with zero Exchange —
    assignment must never shuffle the corpus (round-2 VERDICT #1)."""
    v = _vecs(spark, [(0, [1.0, 0.5, 0.0])])
    c = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])],
        "cell int, cv array<double>",
    )
    out = similarity.ivf_assign(v, c, n_best=2)
    cells = [r["cell"] for r in out.collect()]
    assert cells == [1, 2]
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_lsh_ann_pairs_capped_on_degenerate_bucket(spark):
    """An identical-vector mass in one bucket must not go quadratic: with
    max_bucket the hot bucket is excluded from the self-join while a
    near-dup pair in a cold bucket survives (round-2 VERDICT #3)."""
    hot = [1.0] * 64  # bucket 255 (every probed dim positive)
    cold_a = [-1.0] + [1.0] * 63  # dim 1 negative → different bucket
    cold_b = [-1.0] + [1.0] * 62 + [0.9]
    rows = [(i, hot) for i in range(100)]
    rows += [(200, cold_a), (201, cold_b)]
    df = _vecs(spark, rows)
    capped = {
        (r["a"], r["b"])
        for r in similarity.lsh_ann_pairs(
            df, threshold=0.95, max_bucket=50
        ).collect()
    }
    assert capped == {(200, 201)}
    n_uncapped = similarity.lsh_ann_pairs(df, threshold=0.95).count()
    assert n_uncapped >= 4950  # C(100,2) — the hazard is real


def test_lsh_ann_pairs_bucket_count_dial(spark):
    """More hyperplane bits split the space: a pair split by the extra
    probed dimension stops being a candidate at higher n_bits."""
    a = [1.0] * 64
    # differs in sign on dim 5: probed by lsh_dims(16) = (1, 5, 9, ...),
    # NOT by lsh_dims(8) = (1, 9, 17, ...)
    b = [1.0] * 4 + [-1.0] + [1.0] * 59
    df = _vecs(spark, [(1, a), (2, b)])
    coarse = similarity.lsh_ann_pairs(
        df, threshold=0.5, dims=similarity.lsh_dims(8)
    ).count()
    fine = similarity.lsh_ann_pairs(
        df, threshold=0.5, dims=similarity.lsh_dims(16)
    ).count()
    assert coarse == 1
    assert fine == 0


def test_kmeans_deterministic_and_empty_cell_fallback(spark):
    """Two builds yield bit-identical centroids (fixed-point quantization
    makes distributed means order-independent); a cell that attracts no
    vectors keeps its previous centroid instead of vanishing."""
    vecs = _vecs(
        spark,
        [
            (0, [1.0, 0.1, 0.0]),
            (1, [0.9, 0.0, 0.1]),
            (2, [0.0, 1.0, 0.1]),
            (3, [0.1, 0.9, 0.0]),
        ],
    )
    vq = vecs.select(
        "vec_id", similarity.quantize_vec(F.col("embedding")).alias("embedding")
    )
    init = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, -1.0, -1.0]),  # attracts nothing (all dots negative)
        ],
        "cell int, cv array<double>",
    )
    a = {
        r["cell"]: list(r["cv"])
        for r in similarity.kmeans_centroids(vq, init, n_iter=2, dim=3).collect()
    }
    b = {
        r["cell"]: list(r["cv"])
        for r in similarity.kmeans_centroids(vq, init, n_iter=2, dim=3).collect()
    }
    assert a == b
    assert a[3] == [-1.0, -1.0, -1.0]  # empty cell: previous centroid kept
    # trained cells moved toward their members' means
    assert a[1][0] > 0.8 and a[2][1] > 0.8
    spark.catalog.clearCache()


# --- Product quantization ---------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def _pq_parts(spark):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    return q["pq_encode"](spark, SF_DIR), q["pq_adc_topk"](spark, SF_DIR), q[
        "ann_topk"
    ](spark, SF_DIR)


def test_pq_encode_codebook_vectors_reconstruct_exactly(spark):
    """A vector that IS a codebook source must encode with zero
    reconstruction error (its own subvectors win every subspace argmin)
    — the self-consistency anchor of the encode fold; and codes must be
    diverse (an encode that collapses to one key is a broken argmin)."""
    enc, _, _ = _pq_parts(spark)
    rows = {r["vec_id"]: r for r in enc.collect()}
    assert rows[10]["recon_err"] == 0.0, rows[10]
    keys = {r["code_key"] for r in rows.values()}
    assert len(keys) > len(rows) // 2, f"code collapse: {len(keys)} keys"
    # every code_key is M dash-separated sub-codes within [0, ksub)
    for key in keys:
        parts = key.split("-")
        assert len(parts) == similarity.PQ_M
        assert all(0 <= int(p) < similarity.PQ_KSUB for p in parts)


def test_pq_adc_recall_floor_vs_exact(spark):
    """ADC top-10 must overlap the exact brute-force top-10 well above
    chance (10/n ≈ 2%): the sampled 16×32 codebook measures ~0.5 recall
    on this corpus; pin a floor of 0.4 so codebook/argmin regressions
    show up without flaking on rounding ties."""
    _, adc_df, brute_df = _pq_parts(spark)
    brute = {(r["query_id"], r["vec_id"]) for r in brute_df.collect()}
    adc = {(r["query_id"], r["vec_id"]) for r in adc_df.collect()}
    recall = len(brute & adc) / len(brute)
    assert recall >= 0.4, recall


def test_pq_rerank_beats_adc_and_clears_floor(spark):
    """Exact re-ranking of the 50-candidate ADC shortlist must dominate
    raw ADC recall and clear 0.8 (measured ~0.93): the two-stage
    contract — stage 1 may be lossy, stage 2 must recover everything the
    shortlist contains."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    brute = {
        (r["query_id"], r["vec_id"])
        for r in q["ann_topk"](spark, SF_DIR).collect()
    }
    adc = {
        (r["query_id"], r["vec_id"])
        for r in q["pq_adc_topk"](spark, SF_DIR).collect()
    }
    rer = {
        (r["query_id"], r["vec_id"])
        for r in q["pq_rerank_topk"](spark, SF_DIR).collect()
    }
    r_adc = len(brute & adc) / len(brute)
    r_rer = len(brute & rer) / len(brute)
    assert r_rer >= r_adc, (r_rer, r_adc)
    assert r_rer >= 0.8, r_rer


def test_semdedup_keeps_exactly_one_of_each_same_cell_pair(spark):
    """SemDedup contract on the injected clone pairs: (a) the output
    covers every input row, (b) every (original, perturbed-clone) pair
    that lands in the SAME cell keeps exactly one member, and (c) the
    farthest-from-centroid rule genuinely decides — some dropped rows
    are originals AND some are clones, so the outcome is not the id
    tiebreak in disguise. Cross-cell clone pairs are the documented
    SemDedup recall limitation (assignment flips the argmax cell) and
    are exempt from (b)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["semdedup"](spark, SF_DIR).collect()
    by_id = {r["vec_id"]: r for r in rows}
    n_clones = len([v for v in by_id if v >= 1000000])
    assert len(rows) == 500 + n_clones and n_clones == 25, len(rows)
    same_cell_pairs = 0
    for v, r in by_id.items():
        if v >= 1000000 and (v - 1000000) in by_id:
            o = by_id[v - 1000000]
            if o["cell"] == r["cell"]:
                same_cell_pairs += 1
                assert o["kept"] != r["kept"], (v, o["kept"], r["kept"])
    assert same_cell_pairs >= 20, same_cell_pairs
    dropped = [v for v, r in by_id.items() if not r["kept"]]
    assert any(v < 1000000 for v in dropped), dropped
    assert any(v >= 1000000 for v in dropped), dropped


def test_semdedup_capped_cell_passes_through_kept(spark):
    """max_cell is a recall cap, not a row filter: a cell over the cap
    must skip the pairwise pass and return ALL its rows kept=true (an
    over-cap verdict that deleted the cell would corrupt the corpus
    downstream of a kept-filter). Two cells: cell 0 holds 3 near-
    identical vectors (over a max_cell of 2 — passes through undeduped),
    cell 1 holds 2 near-identical vectors (under the cap — dedups to
    one kept)."""
    base0 = [1.0] + [0.0] * 63
    base1 = [0.0, 1.0] + [0.0] * 62
    rows = [
        (1, base0),
        (2, [0.999] + [0.001] * 63),
        (3, [0.998, 0.002] + [0.0] * 62),
        (10, base1),
        (11, [0.002, 0.999] + [0.001] * 62),
    ]
    cents = spark.createDataFrame(
        [(0, base0), (1, base1)], "cell int, cv array<double>"
    )
    out = similarity.semdedup(
        _vecs(spark, rows), cents, threshold=0.9, max_cell=2
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3, 10, 11}, sorted(by_id)
    assert all(by_id[v]["kept"] for v in (1, 2, 3)), [
        (v, by_id[v]["kept"]) for v in (1, 2, 3)
    ]
    kept_small = [v for v in (10, 11) if by_id[v]["kept"]]
    assert len(kept_small) == 1, kept_small
