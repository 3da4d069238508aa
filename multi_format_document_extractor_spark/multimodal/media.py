"""Multimodal columns: opaque BINARY payloads + typed metadata.

Images/audio/video ride the same input-table shape as HTML/PDF pages —
a ``payload BINARY`` column with magic-byte sniffing (the reference's OCR
path treats images as opaque bytes too, src/parsers/ocr_parser.py:59-62).
The Spark-side plumbing (schemas, Arrow batch shape, per-partition decoder
pool) is real and tested; the actual codec step is STUBBED because the
sandbox has no image/audio libraries — ``decode_image_stub`` produces a
deterministic fake "decode" and a clearly-marked NotImplementedError hook
shows where pillow/ffmpeg would plug in on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    import pandas as pd

MEDIA_META_DDL = (
    "doc_id long, media_type string, n_bytes long, digest string, "
    "width int, height int"
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
}


def sniff_media(payload: bytes | None) -> str:
    if not payload:
        return "unknown"
    for magic, mt in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return mt
    return "application/octet-stream"


def decode_image(payload: bytes) -> tuple[int, int]:
    """REAL-CLUSTER HOOK: decode with pillow/libvips and return (w, h).
    Not available in this sandbox."""
    raise NotImplementedError("image codec not available in this environment")


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from a content digest —
    stable across runs/executors, exercising the full Arrow round-trip."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _meta_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    # per-partition decoder pool slot (mirrors operators/extract.ParserPool)
    for pdf in batches:
        payloads = list(pdf["payload"])
        dims = [
            decode_image_stub(p) if p is not None else (0, 0) for p in payloads
        ]
        out = pdf[["doc_id"]].copy()
        out["media_type"] = [sniff_media(p) for p in payloads]
        out["n_bytes"] = [len(p) if p is not None else 0 for p in payloads]
        out["digest"] = [
            hashlib.sha256(p).hexdigest()[:16] if p is not None else ""
            for p in payloads
        ]
        out["width"] = [d[0] for d in dims]
        out["height"] = [d[1] for d in dims]
        yield out


def media_metadata(df: DataFrame) -> DataFrame:
    """df(doc_id, payload BINARY) → typed metadata table via one
    mapInPandas stage (same pattern as the page extractor)."""
    return df.select("doc_id", "payload").mapInPandas(
        _meta_batches, schema=MEDIA_META_DDL
    )
