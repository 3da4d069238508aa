"""Training-set assembly operators (operators/training.py): packing
invariants vs a Python model, split determinism/proportions, dedup keeper
semantics, and the composed chain."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from multi_format_document_extractor_spark.operators import training


def _bucket(v, n):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % n


def test_pack_sequences_matches_python_model(spark):
    rows = [(i, (i * 37) % 900 + 10) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in training.pack_sequences(
            df, "doc_id", "n_tokens", 1024, n_buckets=8
        ).collect()
    }
    # python model: per bucket, ordered by id, running start offset
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for i, nt in rows:
        by_bucket.setdefault(_bucket(i, 8), []).append((i, nt))
    expect = {}
    for b, docs in by_bucket.items():
        start = 0
        for i, nt in sorted(docs):
            expect[i] = (b * 1_000_000_000 + start // 1024, start % 1024)
            start += nt
    assert got == expect


def test_pack_sequences_offsets_bounded(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(200)], "doc_id long, n_tokens long"
    )
    out = training.pack_sequences(df, "doc_id", "n_tokens", 512).collect()
    assert all(0 <= r["seq_offset"] < 512 for r in out)
    # ~5 docs of 100 tokens start inside each 512-token sequence
    from collections import Counter

    sizes = Counter(r["seq_id"] for r in out)
    assert max(sizes.values()) <= 6


def test_hash_split_deterministic_and_proportioned(spark):
    df = spark.createDataFrame([(i,) for i in range(20000)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in training.hash_split(df, "doc_id", 5, 5).collect()}
    b = {r["doc_id"]: r["split"] for r in training.hash_split(df, "doc_id", 5, 5).collect()}
    assert a == b  # stable across runs
    n = len(a)
    frac_test = sum(1 for s in a.values() if s == "test") / n
    frac_val = sum(1 for s in a.values() if s == "val") / n
    assert 0.04 < frac_test < 0.06 and 0.04 < frac_val < 0.06
    # python model agreement on the bucket rule
    for i in (0, 1, 17, 9999):
        bkt = _bucket(i, 100)
        want = "test" if bkt < 5 else ("val" if bkt < 10 else "train")
        assert a[i] == want


def test_dedup_keepers_lowest_id_per_content(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),  # same normalized content → dropped
            (3, "different doc"),
            (4, "HELLO\tWORLD\n"),  # same again → dropped
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in training.dedup_keepers(df, "text", "doc_id").collect()
    )
    assert kept == [1, 3]


def test_stratified_sample_deterministic_quota(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = training.stratified_sample(df, "lang", "doc_id", 10)
    got = {}
    for r in a.collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert all(len(v) == 10 for v in got.values()) and len(got) == 3
    # same sample on a second run (no sampling state)
    b = {
        (r["lang"], r["doc_id"])
        for r in training.stratified_sample(df, "lang", "doc_id", 10).collect()
    }
    assert b == {(l, d) for l, ds in got.items() for d in ds}
    # matches the python model of the md5 rank
    for lang, ds in got.items():
        members = [i for i, l in rows if l == lang]
        expect = set(
            sorted(members, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:10]
        )
        assert ds == expect


def test_assemble_training_corpus_chain(spark):
    rows = [
        (
            i,
            f"document number {i} here "
            + "the quick brown fox jumps over the lazy dog and it is fine " * 4,
        )
        for i in range(50)
    ]
    rows += [(100 + i, "zz") for i in range(5)]  # fails token/quality gate
    rows += [(200, rows[0][1])]  # exact dup of doc 0 → dropped
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = training.assemble_training_corpus(df, pack_budget=256)
    got = out.collect()
    ids = {r["doc_id"] for r in got}
    assert 200 not in ids and not any(i >= 100 for i in ids)
    assert len(ids) == 50
    assert {"quality", "n_tokens", "split", "seq_id", "seq_offset"} <= set(
        out.columns
    )


def test_bpe_train_learns_hand_computable_merges(spark):
    """On a corpus where pair frequencies are hand-countable, the learned
    merge list is exactly the canonical greedy sequence, including the
    merged symbol participating in later merges."""
    from multi_format_document_extractor_spark.operators.training import (
        bpe_train,
    )

    # 'aab' x3, 'ab' x2  →  pairs: (a,b)=5, (a,a)=3  → merge1 = 'a b'
    # after merge1: 'a ab' x3, 'ab' x2 → pairs: (a,ab)=3 → merge2 = 'a ab'
    docs = spark.createDataFrame(
        [(1, "aab aab aab ab ab")], "doc_id int, text string"
    )
    merges = bpe_train(docs, "text", n_merges=2)
    assert merges == [(1, "a b", 5), (2, "a ab", 3)]


def test_bpe_encode_hand_computable_and_byte_preserving(spark):
    """Encoding with a trained merge list: hand-checkable token counts,
    sequential-apply == the trainer's own final vocab state, and the
    byte-conservation invariant (sum(len(token)·n) == non-ws chars)."""
    from multi_format_document_extractor_spark.operators.training import (
        bpe_encode_counts,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "aab aab aab ab ab")], "doc_id int, text string"
    )
    merges = [p for _r, p, _n in bpe_train(docs, "text", n_merges=2)]
    got = {
        r["token"]: r["n"]
        for r in bpe_encode_counts(docs, "text", merges).collect()
    }
    # 'aab' → a|ab (merge1 b→ab... merge1 'a b': ' a  a  b '→' a  ab ';
    # merge2 'a ab': → ' aab '); 'ab' → ' ab '
    assert got == {"aab": 3, "ab": 2}
    total_chars = 3 * 3 + 2 * 2
    assert sum(len(t) * n for t, n in got.items()) == total_chars
    # zero merges degrades to character counts
    chars = {
        r["token"]: r["n"]
        for r in bpe_encode_counts(docs, "text", []).collect()
    }
    assert chars == {"a": 8, "b": 5}


def test_cluster_split_closes_the_near_dup_leak(spark):
    """Leakage-free split contract: every EXACT clone (+1M, Jaccard 1.0
    ⇒ always a verified edge) shares its original's rep AND split; near
    clones (+2M) share whenever clustering linked them (short docs can
    legitimately fall under the 0.8 Jaccard bar — that's the verifier's
    call, not the split's); the assignment is non-degenerate (all three
    splits occur); and the channel it closes is real — at least one
    linked clone pair would STRADDLE splits under plain per-id
    hash_split but is held together here."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["cluster_split"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(by_id) == 540  # 500 + 20 exact + 20 near clones

    def plain_split(doc_id):
        b = _bucket(doc_id, 100)
        return "test" if b < 5 else ("val" if b < 10 else "train")

    straddlers = 0
    for v, r in by_id.items():
        if v < 1000000:
            continue
        orig = by_id[v - (1000000 if v < 2000000 else 2000000)]
        if v < 2000000:  # exact clone: must be linked
            assert r["rep"] == orig["rep"], (v, r["rep"], orig["rep"])
        if r["rep"] == orig["rep"]:
            assert r["split"] == orig["split"], (v, r["split"])
            if plain_split(v) != plain_split(orig["doc_id"]):
                straddlers += 1
    assert straddlers > 0  # hash_split WOULD have leaked these
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    # singletons (no component) fall back to their own id
    singles = [r for r in rows if r["rep"] == r["doc_id"]]
    assert singles


def test_chunk_documents_coverage_overlap_and_stageless_plan(spark):
    """Chunking contract: chunk_ids dense from 0; starts advance by the
    stride; every chunk but the last is full-size; the last chunk ends
    exactly at the doc's token count (full coverage, nothing past the
    end); consecutive chunks share exactly `overlap` tokens. Plan: zero
    Exchange — chunking is row-parallel codegen."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["doc_chunks"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 500
    multi = 0
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for i, c in enumerate(chunks):
            assert c["start_tok"] == i * 16
            assert len(c["chunk_text"].split(" ")) == c["n_tok"]
            if i < len(chunks) - 1:
                assert c["n_tok"] == 24
                # shared overlap: last 8 tokens == next chunk's first 8
                assert (
                    c["chunk_text"].split(" ")[16:]
                    == chunks[i + 1]["chunk_text"].split(" ")[:8]
                )
        last = chunks[-1]
        n_doc_tokens = last["start_tok"] + last["n_tok"]
        assert last["n_tok"] >= 1
        if len(chunks) > 1:
            multi += 1
            assert n_doc_tokens > len(chunks[0]["chunk_text"].split(" "))
    assert multi > 100  # the corpus genuinely exercises multi-chunk docs
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_batch_assembly_bucket_bounds_and_single_exchange(spark):
    """Batching contract: every batch holds only lengths from its bucket
    ((bucket-1)*8 < len <= bucket*8 ⇒ sum/max bounds), batches are full
    (16) except at most one ragged tail per (bucket, subbucket), and the
    whole job pays exactly ONE hash Exchange (the skew-proofed
    (bucket, subbucket) window; the aggregation reuses it)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["batch_assembly"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    ragged = {}
    for r in rows:
        lo, hi = (r["bucket"] - 1) * 8, r["bucket"] * 8
        assert lo < r["max_tok"] <= hi, r
        assert r["sum_tok"] > r["n_items"] * lo, r
        assert r["sum_tok"] <= r["n_items"] * r["max_tok"], r
        assert 0.0 <= r["padding_frac"] < 1.0
        if r["n_items"] < 16:
            key = (r["bucket"], (r["batch_id"] // 1_000_000_000) % 8)
            assert key not in ragged, (key, r)
            ragged[key] = r["batch_id"]
    p = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert p.count("Exchange hashpartitioning") == 1, p
