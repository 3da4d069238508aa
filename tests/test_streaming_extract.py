"""Streaming extraction: file-stream source → foreachBatch → idempotent
warehouse commit. Exactly-once layering: checkpoint (source) + anti-join
(sink)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from multi_format_document_extractor_spark.corpus import write_corpus
from multi_format_document_extractor_spark.streaming.ingest import (
    streaming_extract,
)


def _split_corpus(tmp_path, n=120):
    """One deterministic corpus split into two arrival files with disjoint
    urls — simulates two crawl drops landing in the watched directory."""
    src = str(tmp_path / "gen")
    write_corpus(src, n, seed=11)
    t = pq.read_table(os.path.join(src, "pages.parquet"))
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    half = n // 2
    pq.write_table(t.slice(0, half), str(incoming / "drop_a.parquet"))
    return str(incoming), t, half


def test_streaming_extract_incremental_no_duplicates(spark, tmp_path):
    incoming, t, half = _split_corpus(tmp_path)
    wh_dir = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    # drop A only
    recs = streaming_extract(spark, incoming, wh_dir, ckpt)
    assert sum(r["n_docs"] for r in recs) == half

    # drop B arrives; same checkpoint → only the new file is processed
    pq.write_table(
        t.slice(half), os.path.join(incoming, "drop_b.parquet")
    )
    recs2 = streaming_extract(spark, incoming, wh_dir, ckpt)
    assert sum(r["n_docs"] for r in recs2) == t.num_rows - half

    # third drain with nothing new → zero extracted rows
    recs3 = streaming_extract(spark, incoming, wh_dir, ckpt)
    assert sum(r["n_docs"] for r in recs3) == 0

    from multi_format_document_extractor_spark.sinks import Warehouse

    out = Warehouse(wh_dir).read_extracted(spark)
    assert out.count() == t.num_rows
    assert out.select("url").distinct().count() == t.num_rows


def test_streaming_extract_replay_is_idempotent(spark, tmp_path):
    """A lost checkpoint (worst-case replay: every file reprocessed) must
    not duplicate warehouse rows — the anti-join absorbs the replay."""
    incoming, t, half = _split_corpus(tmp_path)
    wh_dir = str(tmp_path / "wh")

    streaming_extract(spark, incoming, wh_dir, str(tmp_path / "ckpt1"))
    # fresh checkpoint: the source replays drop_a from scratch
    recs = streaming_extract(spark, incoming, wh_dir, str(tmp_path / "ckpt2"))
    assert sum(r["n_docs"] for r in recs) == 0  # all urls already committed

    from multi_format_document_extractor_spark.sinks import Warehouse

    out = Warehouse(wh_dir).read_extracted(spark)
    assert out.count() == half
    assert out.select("url").distinct().count() == half
