"""Scale-hazard regression tests for the dedup path (VERDICT round 1 #3):
bounded candidate generation on adversarial boilerplate corpora, b×r
banding discrimination, and the simhash Hamming-band pigeonhole."""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F

from multi_format_document_extractor_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_candidate_pairs_capped_on_identical_boilerplate(spark):
    """One boilerplate mega-bucket must not go quadratic: with max_bucket,
    the identical-content mass is excluded from the self-join while real
    near-dup pairs outside it survive."""
    boiler = "terms of service apply to all pages copyright notice " * 6
    rows = [(i, boiler) for i in range(200)]
    # a genuine near-dup pair with distinct content
    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    rows.append((1000, base))
    rows.append((1001, base + " trailing marker"))
    df = _docs(spark, rows)
    bands = dedup.minhash_bands(df, "text", "doc_id").cache()
    try:
        capped = dedup.candidate_pairs(bands, max_bucket=50)
        got = {(r["a"], r["b"]) for r in capped.collect()}
        # the 200-doc identical mass (C(200,2)=19900 pairs) is dropped...
        assert len(got) <= 5, len(got)
        # ...but the near-dup pair outside the mega-bucket is still found
        assert (1000, 1001) in got
        # uncapped, the same bands explode quadratically — the hazard is real
        n_uncapped = dedup.candidate_pairs(bands).count()
        assert n_uncapped >= 19900
    finally:
        bands.unpersist()


def test_banding_discriminates_mid_similarity(spark):
    """8 bands × 4 rows: a ~95%-Jaccard pair is a candidate; a ~30% pair is
    not (at r=1 nearly everything was — the round-1 permissiveness bug)."""
    common = [f"tok{i}" for i in range(100)]
    hi_a = " ".join(common)
    hi_b = " ".join(common[:97] + ["x1", "x2", "x3"])
    lo_a = " ".join(common[:30] + [f"a{i}" for i in range(70)])
    lo_b = " ".join(common[:30] + [f"b{i}" for i in range(70)])
    df = _docs(spark, [(1, hi_a), (2, hi_b), (3, lo_a), (4, lo_b)])
    bands = dedup.minhash_bands(df, "text", "doc_id")
    got = {(r["a"], r["b"]) for r in dedup.candidate_pairs(bands).collect()}
    assert (1, 2) in got
    assert (3, 4) not in got


def test_simhash_hamming_pairs_match_bruteforce(spark):
    """The banded segment-equality join is EXHAUSTIVE for hamming ≤ 3
    (pigeonhole over 4 segments) — verified against all-pairs brute force
    on synthetic segments."""
    segs = [
        (1, 0x1234, 0x00FF, 0x7A7A, 0x0F0F),
        (2, 0x1234, 0x00FF, 0x7A7A, 0x0F0E),  # hamming 1 vs doc 1
        (3, 0x1234, 0x00FD, 0x7A7A, 0x0F0C),  # hamming 1+0+2... vs doc 1
        (4, 0x4321, 0xFF00, 0xA7A7, 0xF0F0),  # far from everything
        (5, 0x1234, 0x00FF, 0x7A7A, 0x0F0F),  # identical to doc 1
    ]
    df = spark.createDataFrame(
        segs, "doc int, seg0 int, seg1 int, seg2 int, seg3 int"
    )
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(df, max_hamming=3).collect()
    }
    expect = {}
    for (a, *sa), (b, *sb) in itertools.combinations(segs, 2):
        h = sum(bin(x ^ y).count("1") for x, y in zip(sa, sb))
        if h <= 3:
            expect[(a, b)] = h
    assert got == expect
    assert got[(1, 5)] == 0 and got[(1, 2)] == 1


def test_connected_components_basic(spark):
    """Chain + separate pair + convergence semantics."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (10, 12)],
        "a long, b long",
    )
    got = {
        r["doc"]: r["comp"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}
    spark.catalog.clearCache()


def test_connected_components_long_chain_strict(spark):
    """A 30-node chain (diameter 29) converges within default rounds; a
    tiny max_iter raises instead of returning wrong components."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a long, b long"
    )
    got = {
        r["doc"]: r["comp"]
        for r in dedup.connected_components(pairs, max_iter=40).collect()
    }
    assert set(got.values()) == {0} and len(got) == 31
    with pytest.raises(ValueError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=3)
    spark.catalog.clearCache()


def test_drop_near_dups_keeps_one_per_component(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.drop_near_dups(docs, pairs, "doc_id").collect()
    )
    # components {1,2,3}→keep 1, {5,6}→keep 5; singletons untouched
    assert kept == [0, 1, 4, 5, 7, 8, 9]
    spark.catalog.clearCache()


def test_simhash_hamming_pairs_capped_on_hot_cells(spark):
    """A boilerplate fingerprint mass (identical segments) must not go
    quadratic: with max_bucket its cells are excluded from the self-join,
    while a near pair in a cold cell survives (round-2 VERDICT #5)."""
    mass = [(i, 0x1234, 0x00FF, 0x7A7A, 0x0F0F) for i in range(100)]
    survivors = [
        (200, 0x4321, 0xAA00, 0x1111, 0x2222),
        (201, 0x4321, 0xAA00, 0x1111, 0x2223),  # hamming 1, cold cells
    ]
    df = spark.createDataFrame(
        mass + survivors, "doc int, seg0 int, seg1 int, seg2 int, seg3 int"
    )
    capped = {
        (r["a"], r["b"])
        for r in dedup.simhash_hamming_pairs(
            df, max_hamming=3, max_bucket=50
        ).collect()
    }
    assert capped == {(200, 201)}
    # uncapped, the identical mass emits C(100,2) pairs — the hazard is real
    n_uncapped = dedup.simhash_hamming_pairs(df, max_hamming=3).count()
    assert n_uncapped >= 4950


def test_drop_near_dups_has_no_forced_broadcast(spark):
    """The loser set may be corpus-scale on web corpora (30-50% dup rates),
    so the anti-join must carry NO explicit broadcast hint — AQE decides at
    runtime (round-2 VERDICT #2)."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    out = dedup.drop_near_dups(docs, pairs, "doc_id")
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in optimized, optimized
    spark.catalog.clearCache()


def test_simhash_hamming_guard_rejects_unsound_bound(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 1, 2, 3, 4)], "doc int, seg0 int, seg1 int, seg2 int, seg3 int"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_hamming_pairs(df, max_hamming=4)


def test_simhash64_segments_independent(spark):
    """Identical docs agree on all segments; the 4 segments of one doc are
    not copies of each other (distinct md5 bit-planes)."""
    df = _docs(spark, [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")])
    rows = dedup.simhash64(df, "text", "doc_id").collect()
    r1, r2 = sorted(rows, key=lambda r: r["doc"])
    assert [r1[c] for c in ("seg0", "seg1", "seg2", "seg3")] == [
        r2[c] for c in ("seg0", "seg1", "seg2", "seg3")
    ]
    assert len({r1["seg0"], r1["seg1"], r1["seg2"], r1["seg3"]}) > 1


def test_exact_substring_dedup_span_coverage(spark):
    """ExactSubstr semantics: a duplicated 8+-token passage embedded at an
    arbitrary offset is cut from the LATER doc only; tokens outside the
    covered spans survive; short docs (<8 tokens) are untouched."""
    passage = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 toks
    unique2 = "one two three four five six seven eight nine ten"
    df = _docs(
        spark,
        [
            (1, passage),
            # passage at offset 3 inside otherwise-unique text
            (2, "x1 x2 x3 " + passage + " " + unique2),
            (3, "tiny doc"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(df, "text", "doc_id").collect()
    }
    # first occurrence keeps everything
    assert out[1]["n_dup_tokens"] == 0
    assert out[1]["text_dedup"] == passage
    # later occurrence loses exactly the 8 covered tokens
    assert out[2]["n_dup_tokens"] == 8
    assert passage not in out[2]["text_dedup"]
    assert out[2]["text_dedup"] == "x1 x2 x3 " + unique2
    # sub-width doc: no windows, no removal
    assert out[3]["n_dup_tokens"] == 0
    assert out[3]["text_dedup"] == "tiny doc"


def test_exact_substring_dedup_catches_any_offset(spark):
    """Stride-1 windows catch a shared passage even when both docs embed
    it at different offsets (the case fixed-chunk paragraph_dedup can
    miss when the chunk boundary splits the passage)."""
    shared = "november oscar papa quebec romeo sierra tango uniform victor"
    df = _docs(
        spark,
        [
            (1, "pre " + shared + " tail1"),
            (2, "a b c d e " + shared + " tail2 tail3"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(df, "text", "doc_id").collect()
    }
    assert out[1]["n_dup_tokens"] == 0
    assert out[2]["n_dup_tokens"] == 9
    assert shared not in out[2]["text_dedup"]
    assert out[2]["text_dedup"].startswith("a b c d e")
    assert out[2]["text_dedup"].endswith("tail2 tail3")


def test_exact_substring_dedup_long_duplicated_passage(spark):
    """A long fully-duplicated passage collapses to ONE covered interval
    (stride-1 windows merge), and the later doc loses every token of it
    while its frame survives — the case where a per-window coverage scan
    would go quadratic."""
    passage = " ".join(f"tok{i}" for i in range(400))  # 400 tokens
    df = _docs(
        spark,
        [
            (1, passage),
            (2, "head " + passage + " tail"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(df, "text", "doc_id").collect()
    }
    assert out[1]["n_dup_tokens"] == 0
    assert out[2]["n_dup_tokens"] == 400
    assert out[2]["text_dedup"] == "head tail"


def test_canonical_pick_keeps_longest_member(spark):
    """The cluster keeper must be the byte-longest member (min doc_id on
    ties), must belong to its own cluster, and must genuinely differ from
    the min-label canonical on part of the corpus (the near-dup clones
    carry appended marker tokens, so longest-wins is a real decision, not
    min-id in disguise)."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    sf = "/root/testdata/sf0.001"
    comp = {
        (r["doc_id"], r["component"])
        for r in q["neardup_components"](spark, sf).collect()
    }
    members = {}
    for doc, c in comp:
        members.setdefault(c, set()).add(doc)
    picks = q["canonical_pick"](spark, sf).collect()
    assert {r["component"] for r in picks} == set(members)
    assert all(r["keeper"] in members[r["component"]] for r in picks)
    assert all(r["n_members"] == len(members[r["component"]]) for r in picks)
    assert any(r["keeper"] != r["component"] for r in picks)


def test_incremental_neardup_matches_recrawls_not_fresh(spark):
    """The batch-vs-index join must (a) match EVERY re-crawled doc back to
    its own original, (b) match the md5-unique fresh pages to nothing,
    and (c) emit only new×old pairs — never old×old or new×new."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["incremental_neardup"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(r["new_id"] >= 3000000 > r["old_id"] for r in rows)
    matched_self = {
        r["new_id"] - 3000000
        for r in rows
        if r["new_id"] - 3000000 == r["old_id"]
    }
    import duckdb

    n_docs = duckdb.sql(
        "select count(*) from '/root/testdata/sf0.001/documents.parquet'"
        " where doc_id % 10 = 0"
    ).fetchone()[0]
    assert len(matched_self) == n_docs, (len(matched_self), n_docs)
    assert not any((r["new_id"] - 3000000) % 10 == 5 for r in rows)


def test_winnowing_local_match_guarantee(spark):
    """The winnowing guarantee (Schleimer et al. §3): two documents
    sharing a token run of length ≥ w+k−1 (= 8 at k=5, w=4) MUST share
    at least one fingerprint, wherever the run sits and whatever
    surrounds it; documents with no shared 5-gram must share none."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"nine ten {shared} eleven twelve thirteen fourteen"),
        (3, f"{shared} trailing words here"),
        (4, "totally disjoint content with no overlap at all kappa"),
        (5, "more disjoint filler unrelated tokens everywhere lambda mu"),
    ]
    fps = {}
    out = dedup.winnow_fingerprints(
        _docs(spark, rows), "text", "doc_id", k=5, w=4
    ).collect()
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    for a, b in [(1, 2), (1, 3), (2, 3)]:
        assert fps[a] & fps[b], (a, b)
    for a in (1, 2, 3):
        assert not (fps[a] & fps[4]) and not (fps[a] & fps[5])
    assert not (fps[4] & fps[5])
    # storage bound: far fewer fingerprints than k-grams survive
    n_tokens = len(rows[0][1].split())
    assert len(fps[1]) <= n_tokens - 4
