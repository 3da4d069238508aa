"""Multimodal columns: opaque BINARY payloads + typed metadata.

Images/audio/video ride the same input-table shape as HTML/PDF pages —
a ``payload BINARY`` column with magic-byte sniffing (the reference's OCR
path treats images as opaque bytes too, src/parsers/ocr_parser.py:59-62).
The Spark-side plumbing (schemas, Arrow batch shape, per-partition decoder
pool) is real and tested. PNG, GIF, and JPEG decode FOR REAL via the stdlib
codecs in oracle.py; the remaining codec steps (resize resampling, audio,
video) are STUBBED because the sandbox has no image/audio libraries —
``decode_image_stub`` produces a deterministic fake "decode" and a
clearly-marked NotImplementedError hook shows where pillow/ffmpeg would
plug in on a real cluster.
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
    """Decode and return (w, h). PNG, GIF, and JPEG all decode FOR REAL
    via the stdlib codecs in oracle.py (v4 retired the S8 stub for PNG,
    v5 for GIF, v6 for JPEG — jpeg_dims reads geometry from any SOFn
    header, so color/progressive JPEGs the full pixel decoder refuses
    still report real dimensions here)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..oracle import png_decode_gray8

        w, h, _ = png_decode_gray8(payload)
        return w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..oracle import gif_decode_gray

        w, h, _ = gif_decode_gray(payload)
        return w, h
    if payload[:3] == b"\xff\xd8\xff":
        from ..oracle import jpeg_dims

        return jpeg_dims(payload)
    raise NotImplementedError(
        "image codec for this container not available in this environment"
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode for containers with no stdlib codec
    (e.g. webp/tiff carried as octet-stream): dimensions derived from a
    content digest — stable across runs/executors, exercising the full
    Arrow round-trip."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _dims_of(p: bytes | None) -> tuple[int, int]:
    """Real dims for decodable PNGs/GIFs/JPEGs, digest-stub dims for
    unknown containers, (0, 0) for null/corrupt payloads — never an
    exception (the error-as-data rule)."""
    if p is None:
        return 0, 0
    if (
        p[:8] == b"\x89PNG\r\n\x1a\n"
        or p[:4] == b"GIF8"
        or p[:3] == b"\xff\xd8\xff"
    ):
        try:
            return decode_image(p)
        except Exception:  # noqa: BLE001 — corrupt container, dims unknown
            return 0, 0
    return decode_image_stub(p)


def _meta_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    # per-partition decoder pool slot (mirrors operators/extract.ParserPool)
    for pdf in batches:
        payloads = list(pdf["payload"])
        dims = [_dims_of(p) for p in payloads]
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


# ---------------------------------------------------------------------------
# Resize / frame-sample / feature-extract: the remaining multimodal stages.
# Same contract as metadata: REAL plumbing (schemas, Arrow batch shape,
# per-partition pool, exploded row counts), STUBBED codec behind a
# deterministic fake + a NotImplementedError hook.
# ---------------------------------------------------------------------------

RESIZED_DDL = "doc_id long, width int, height int, payload binary"
FRAMES_DDL = "doc_id long, frame_idx int, ts_ms long, frame_payload binary"
FEATURES_DDL = "doc_id long, embedding array<float>"


def resize_image(payload: bytes, w: int, h: int) -> bytes:
    """REAL-CLUSTER HOOK: pillow/libvips resample to (w, h)."""
    raise NotImplementedError("image codec not available in this environment")


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    # deterministic fake: content digest keyed by target dims — output bytes
    # differ per (payload, w, h) exactly like a real resample would
    seed = hashlib.sha256(payload + w.to_bytes(4, "big") + h.to_bytes(4, "big"))
    return seed.digest()


def resize_images(df: DataFrame, w: int, h: int) -> DataFrame:
    """df(doc_id, payload) → resized payloads, one mapInPandas stage.
    1:1 row mapping; the binary column stays binary through Arrow (never
    coerced to str — the byte-identity hazard of SURVEY.md §7)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = pdf[["doc_id"]].copy()
            out["width"] = w
            out["height"] = h
            out["payload"] = [
                _resize_stub(p, w, h) if p is not None else None
                for p in pdf["payload"]
            ]
            yield out

    return df.select("doc_id", "payload").mapInPandas(batches, schema=RESIZED_DDL)


def sample_frames_real(payload: bytes, every_ms: int):
    """REAL-CLUSTER HOOK: ffmpeg/pyav keyframe sampling."""
    raise NotImplementedError("video codec not available in this environment")


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """df(doc_id, payload) → one row PER SAMPLED FRAME (UDTF-shaped fan-out
    inside mapInPandas; output cardinality = Σ min(max_frames, dur/every_ms)).
    Frame count derives deterministically from the payload digest so tests
    can assert exact exploded row counts."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd_  # worker-side import

        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue
                h = hashlib.sha256(p).digest()
                n = 1 + h[2] % max_frames  # fake "duration" → frame count
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(hashlib.sha256(p + i.to_bytes(4, "big")).digest())
            yield pd_.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame_payload": frames}
            )

    return df.select("doc_id", "payload").mapInPandas(batches, schema=FRAMES_DDL)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """df(doc_id, payload) → embedding array<float> (the input shape the
    similarity/ANN operators consume). Fake featurizer: sha256 bytes scaled
    to [-1, 1); a real model would run here via the predict_batch pattern
    (one model per partition, batched Arrow input)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = pdf[["doc_id"]].copy()
            embs = []
            for p in pdf["payload"]:
                if p is None:
                    embs.append(None)
                    continue
                h = hashlib.sha256(p).digest()
                embs.append([(h[i % 32] - 128) / 128.0 for i in range(dim)])
            out["embedding"] = embs
            yield out

    return df.select("doc_id", "payload").mapInPandas(batches, schema=FEATURES_DDL)
