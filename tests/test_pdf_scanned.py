"""Scanned-PDF pages: raster image XObjects decoded + glyph-classified
(oracle._pdf_image_gray / _pdf_image_spans — the reference's OCR scenario,
src/parsers/ocr_parser.py:59-217, src/ai_pipeline.py:343-388). The corpus
byte-identity sweep covers the generated mix; these tests pin each sample
encoding, the reading-order interleave, and the degrade-not-raise
contract on corrupt/hostile images."""

from __future__ import annotations

import random
import zlib

from multi_format_document_extractor_spark import oracle
from multi_format_document_extractor_spark.corpus import (
    _build_pdf,
    _make_scanned_pdf,
)
from multi_format_document_extractor_spark.oracle import (
    GLYPH_H,
    _render_ink_pixels,
    extract_pdf,
    render_jpeg,
)


def _gray_image(lines, invert=False):
    w, h, ink = _render_ink_pixels(lines)
    bg, fg = (0, 255) if invert else (255, 0)
    buf = bytearray(bytes([bg]) * (w * h))
    for x, y in ink:
        buf[y * w + x] = fg
    return w, h, bytes(buf)


def _scan_pdf(head: str, data: bytes, w: int, h: int, name="Im0") -> bytes:
    place = f"q {w * 2} 0 0 {h * 2} 50 {720 - h * 2} cm /{name} Do Q"
    return _build_pdf([place.encode()], images={name: (head.encode(), data)})


def test_flate_gray8_image_page():
    lines = ["HELLO WORLD", "SECOND LINE"]
    w, h, buf = _gray_image(lines)
    p = _scan_pdf(
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(buf),
        w,
        h,
    )
    text, n = extract_pdf(p)
    assert text == b"HELLO WORLD\nSECOND LINE" and n == 1


def test_decode_inverted_gray():
    lines = ["INVERTED INK"]
    w, h, buf = _gray_image(lines, invert=True)
    p = _scan_pdf(
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode /Decode [1 0]",
        zlib.compress(buf),
        w,
        h,
    )
    assert extract_pdf(p)[0] == b"INVERTED INK"


def test_png_predictor_image():
    lines = ["PREDICTED ROWS"]
    w, h, buf = _gray_image(lines)
    pred = bytearray()
    prev = bytes(w)
    for r in range(0, len(buf), w):
        row = buf[r : r + w]
        pred.append(2)  # Up filter per row
        pred += bytes((row[i] - prev[i]) & 0xFF for i in range(w))
        prev = row
    p = _scan_pdf(
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode"
        f" /DecodeParms << /Predictor 12 /Columns {w} >>",
        zlib.compress(bytes(pred)),
        w,
        h,
    )
    assert extract_pdf(p)[0] == b"PREDICTED ROWS"


def test_one_bit_stencil():
    lines = ["ONE BIT DEEP"]
    w, h, ink = _render_ink_pixels(lines)
    stride = (w + 7) // 8
    raster = bytearray(b"\xff" * (stride * h))
    for x, y in ink:  # sample 0 = black in DeviceGray
        raster[y * stride + (x >> 3)] &= ~(1 << (7 - (x & 7)))
    p = _scan_pdf(
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 1 /Filter /FlateDecode",
        zlib.compress(bytes(raster)),
        w,
        h,
    )
    assert extract_pdf(p)[0] == b"ONE BIT DEEP"


def test_dctdecode_jpeg_body():
    lines = ["JPEG SCAN PAGE"]
    w = max(len(ln) for ln in lines) * 6
    h = len(lines) * GLYPH_H
    p = _scan_pdf(
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /DCTDecode",
        render_jpeg(lines),
        w,
        h,
    )
    assert extract_pdf(p)[0] == b"JPEG SCAN PAGE"


def test_header_above_scan_interleaves_in_reading_order():
    lines = ["SCANNED BODY"]
    w, h, buf = _gray_image(lines)
    place = (
        f"BT 1 0 0 1 50 740 Tm (typed header) Tj ET\n"
        f"q {w * 2} 0 0 {h * 2} 50 {720 - h * 2} cm /Im0 Do Q"
    )
    head = (
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode"
    )
    p = _build_pdf(
        [place.encode()], images={"Im0": (head.encode(), zlib.compress(buf))}
    )
    assert extract_pdf(p)[0] == b"typed header\nSCANNED BODY"


def test_corrupt_image_degrades_not_raises():
    # valid container, truncated Flate body: the image contributes
    # nothing, the page still parses (error-as-data, no exception)
    lines = ["GONE"]
    w, h, buf = _gray_image(lines)
    good = zlib.compress(buf)
    p = _scan_pdf(
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode",
        good[: len(good) // 2],
        w,
        h,
    )
    text, n = extract_pdf(p)
    assert text == b""
    r = oracle.extract(p)
    assert r.format == "pdf" and r.ok


def test_hostile_dims_and_short_data_skipped():
    # absurd /Width×/Height → guard trips; short sample data → skipped
    p1 = _scan_pdf(
        "/Width 100000 /Height 100000 /ColorSpace /DeviceGray"
        " /BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(b"\xff" * 64),
        10,
        10,
    )
    assert extract_pdf(p1)[0] == b""
    p2 = _scan_pdf(
        "/Width 60 /Height 40 /ColorSpace /DeviceGray"
        " /BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(b"\xff" * 16),  # 16 bytes for a 2400-px image
        60,
        40,
    )
    assert extract_pdf(p2)[0] == b""


def test_rotated_placement_skipped():
    # 90°-rotated cm (b/c nonzero): span emission declines — column
    # heuristics assume upright content, same stance as rotated type
    lines = ["UPRIGHT ONLY"]
    w, h, buf = _gray_image(lines)
    place = f"q 0 {w * 2} {-h * 2} 0 300 100 cm /Im0 Do Q"
    head = (
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode"
    )
    p = _build_pdf(
        [place.encode()], images={"Im0": (head.encode(), zlib.compress(buf))}
    )
    assert extract_pdf(p)[0] == b""


def test_string_containing_operator_words_is_inert():
    # a literal string with "cm"/"Do"/"q" inside must not drive the
    # image-placement interpreter
    lines = ["REAL SCAN"]
    w, h, buf = _gray_image(lines)
    place = (
        f"BT 1 0 0 1 50 740 Tm (watch q 9 9 9 9 9 9 cm /Im0 Do Q here) Tj ET\n"
        f"q {w * 2} 0 0 {h * 2} 50 {720 - h * 2} cm /Im0 Do Q"
    )
    head = (
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode"
    )
    p = _build_pdf(
        [place.encode()], images={"Im0": (head.encode(), zlib.compress(buf))}
    )
    assert (
        extract_pdf(p)[0]
        == b"watch q 9 9 9 9 9 9 cm /Im0 Do Q here\nREAL SCAN"
    )


def test_q_Q_restores_ctm():
    # the Do after Q must see the OUTER matrix, not the popped one
    lines = ["STACKED STATE"]
    w, h, buf = _gray_image(lines)
    place = (
        f"q 2 0 0 2 0 0 cm"
        f" q 999 0 0 999 0 0 cm Q"
        f" {w} 0 0 {h} 25 {(720 - h * 2) / 2} cm /Im0 Do Q"
    )
    head = (
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
        f" /BitsPerComponent 8 /Filter /FlateDecode"
    )
    p = _build_pdf(
        [place.encode()], images={"Im0": (head.encode(), zlib.compress(buf))}
    )
    assert extract_pdf(p)[0] == b"STACKED STATE"


def test_generator_fuzz_roundtrip():
    for seed in range(40):
        payload, exp, n_pages = _make_scanned_pdf(random.Random(seed))
        text, n = extract_pdf(payload)
        assert text == exp.encode("utf-8"), seed
        assert n == n_pages, seed


def test_pdf_scanned_registry_query_all_match(spark):
    """The registry face extracts every seeded scanned PDF byte-
    identically (the driver's rows-only check sees cardinality; this
    pins the `matches` column it can't)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["pdf_scanned"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(r.matches for r in rows)
    assert all(r.n_pages in (1, 2) and r.out_bytes > 0 for r in rows)
