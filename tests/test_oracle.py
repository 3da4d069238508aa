"""M0: the single-node extractor honors the generator's golden expectations
(two independent implementations of the contract — FIXTURES.md §1-2)."""

from __future__ import annotations

import zlib

from multi_format_document_extractor_spark import oracle


def test_sniff_format():
    assert oracle.sniff_format(None) == "unknown"
    assert oracle.sniff_format(b"") == "unknown"
    assert oracle.sniff_format(b"%PDF-1.4\n...") == "pdf"
    assert oracle.sniff_format(b"<!DOCTYPE html><html>") == "html"
    assert oracle.sniff_format(b"  \n\t<html><body>") == "html"
    assert oracle.sniff_format(b"plain words here") == "text"
    assert oracle.sniff_format(b"\xff\xfe binary-ish") == "text"


def test_classify_block_rules():
    # density must win over length: long but link-heavy block is boilerplate
    assert not oracle.classify_block(text_chars=2000, link_chars=1500, n_tags=40)
    # short block is boilerplate even with zero links
    assert not oracle.classify_block(text_chars=10, link_chars=0, n_tags=0)
    # tag soup (low text density) is boilerplate
    assert not oracle.classify_block(text_chars=100, link_chars=0, n_tags=30)
    # real content
    assert oracle.classify_block(text_chars=300, link_chars=10, n_tags=2)


def test_html_edge_cases():
    # empty body
    t, n, _ = oracle.extract_html(b"<html><head><title>x</title></head><body></body></html>")
    assert t == b"" and n == 0
    # single content paragraph with nested inline tags
    words = "alpha beta gamma delta " * 10
    page = f"<html><body><p>{words[:50]}<b>bold</b> {words[50:]}</p></body></html>"
    t, n, _ = oracle.extract_html(page.encode())
    assert n == 1 and b"bold" in t


def test_pdf_two_column_reading_order():
    from multi_format_document_extractor_spark.corpus import _build_pdf

    stream = (
        b"BT /F1 12 Tf\n"
        b"320 720 Td (right top) Tj\n"
        b"50 720 Td (left top) Tj\n"
        b"50 704 Td (left bottom) Tj\n"
        b"320 704 Td (right bottom) Tj\n"
        b"ET"
    )
    payload = _build_pdf([stream])
    t, n_pages = oracle.extract_pdf(payload)
    assert n_pages == 1
    assert t == b"left top\nleft bottom\nright top\nright bottom"


def test_pdf_escapes():
    from multi_format_document_extractor_spark.corpus import _build_pdf, _pdf_escape

    s = "parens (x) and \\backslash"
    stream = f"BT /F1 12 Tf\n50 720 Td ({_pdf_escape(s)}) Tj\nET".encode()
    t, _ = oracle.extract_pdf(_build_pdf([stream]))
    assert t.decode() == s


def test_corpus_golden_byte_identity(corpus_rows):
    for r in corpus_rows:
        e = oracle.extract(r.html)
        assert e.format == r.format, r.url
        assert e.text == r.text_expected, r.url
        assert e.checksum == zlib.crc32(r.text_expected)


def test_error_path_is_data():
    e = oracle.extract(None)
    assert not e.ok and e.format == "unknown" and e.text == b""


def test_docx_paragraphs_and_tables():
    from multi_format_document_extractor_spark.corpus import _W_XMLNS, _zip_bytes

    doc = (
        f'<w:document xmlns:w="{_W_XMLNS}"><w:body>'
        "<w:p/>"  # leading empty paragraph: trimmed
        "<w:p><w:r><w:t xml:space=\"preserve\">hello </w:t></w:r>"
        "<w:r><w:t>split run</w:t></w:r></w:p>"
        "<w:p/>"  # interior empty: kept as blank line
        "<w:p><w:r><w:t>second   para</w:t></w:r></w:p>"
        "<w:tbl>"
        "<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr>"
        "<w:tr><w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>d</w:t></w:r></w:p></w:tc></w:tr>"
        "</w:tbl>"
        "</w:body></w:document>"
    )
    payload = _zip_bytes([("word/document.xml", doc)])
    e = oracle.extract(payload)
    assert e.format == "zip" and e.ok
    assert e.text == b"hello split run\n\nsecond para\n\na | b\nc | d"
    assert e.n_blocks == 2 + 2  # two non-empty paragraphs + two table rows


def test_xlsx_shared_inline_and_numeric_cells():
    from multi_format_document_extractor_spark.corpus import _X_XMLNS, _zip_bytes

    members = [
        (
            "xl/workbook.xml",
            f'<workbook xmlns="{_X_XMLNS}"><sheets>'
            '<sheet name="Order_Info" sheetId="1"/>'
            '<sheet name="Notes" sheetId="2"/></sheets></workbook>',
        ),
        (
            "xl/sharedStrings.xml",
            f'<sst xmlns="{_X_XMLNS}"><si><t>alpha</t></si>'
            "<si><t>beta</t></si></sst>",
        ),
        (
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{_X_XMLNS}"><sheetData>'
            '<row r="1"><c t="s"><v>1</v></c><c><v>12.50</v></c></row>'
            '<row r="2"><c t="inlineStr"><is><t>inline</t></is></c>'
            '<c t="s"><v>0</v></c></row>'
            "</sheetData></worksheet>",
        ),
        (
            "xl/worksheets/sheet2.xml",
            f'<worksheet xmlns="{_X_XMLNS}"><sheetData>'
            '<row r="1"><c><v>7</v></c></row></sheetData></worksheet>',
        ),
    ]
    e = oracle.extract(_zip_bytes(members))
    assert e.format == "zip" and e.ok
    assert e.text == (
        b"## Order_Info\nbeta | 12.50\ninline | alpha\n\n## Notes\n7"
    )
    assert e.n_blocks == 3


def test_xlsx_sheets_resolve_via_rels_not_position():
    """Real Excel numbering: after a delete, workbook order and member
    numbers diverge — resolution must follow workbook.xml.rels r:id."""
    from multi_format_document_extractor_spark.corpus import _X_XMLNS, _zip_bytes

    r_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    members = [
        (
            "xl/workbook.xml",
            f'<workbook xmlns="{_X_XMLNS}" xmlns:r="{r_ns}"><sheets>'
            '<sheet name="A" sheetId="1" r:id="rId1"/>'
            '<sheet name="C" sheetId="3" r:id="rId2"/></sheets></workbook>',
        ),
        (
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="{r_ns}/worksheet" Target="worksheets/sheet1.xml"/>'
            f'<Relationship Id="rId2" Type="{r_ns}/worksheet" Target="worksheets/sheet3.xml"/>'
            "</Relationships>",
        ),
        (
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{_X_XMLNS}"><sheetData>'
            '<row r="1"><c t="inlineStr"><is><t>alpha</t></is></c></row>'
            "</sheetData></worksheet>",
        ),
        (
            "xl/worksheets/sheet3.xml",
            f'<worksheet xmlns="{_X_XMLNS}"><sheetData>'
            '<row r="1"><c t="inlineStr"><is><t>gamma</t></is></c></row>'
            "</sheetData></worksheet>",
        ),
    ]
    e = oracle.extract(_zip_bytes(members))
    assert e.ok and e.text == b"## A\nalpha\n\n## C\ngamma"
    # a listed sheet whose member is MISSING is an error row, never silence
    e2 = oracle.extract(_zip_bytes(members[:3]))
    assert not e2.ok and "worksheet member" in e2.error


def test_unsupported_zip_and_corrupt_zip_are_error_rows():
    from multi_format_document_extractor_spark.corpus import _zip_bytes

    plain = oracle.extract(_zip_bytes([("readme.txt", "hi")]))
    assert plain.format == "zip" and not plain.ok
    assert "unsupported zip container" in plain.error
    corrupt = oracle.extract(b"PK\x03\x04" + b"\x00" * 40)
    assert corrupt.format == "zip" and not corrupt.ok and corrupt.text == b""


def test_image_routes_to_media_path():
    for magic, sub in [
        (b"\x89PNG\r\n\x1a\n", "png"),
        (b"\xff\xd8\xff\xe0", "jpeg"),
        (b"GIF89a", "gif"),
    ]:
        e = oracle.extract(magic + b"\x01\x02\x03")
        assert e.format == "image" and not e.ok and e.text == b""
        assert sub in e.error and "media path" in e.error


def test_csv_sniff_and_extract():
    """Structural CSV probe + normalization: stripped cells joined ' | ',
    n_blocks = data rows, CRLF and latin-1 payloads handled via the
    encoding chain."""
    doc = b"order_id,client,qty\r\nORD-1, acme ,3\r\n ORD-2,globex,7\r\n"
    assert oracle.sniff_format(doc) == "csv"
    t, n, enc = oracle.extract_csv(doc)
    assert t == b"order_id | client | qty\nORD-1 | acme | 3\nORD-2 | globex | 7"
    assert n == 2 and enc == "utf-8"
    # latin-1 payload: recovered text, not U+FFFD
    l1 = "id,client,total\n1,café,9\n".encode("latin-1")
    t2, n2, enc2 = oracle.extract_csv(l1)
    assert enc2 == "latin-1" and "café".encode("utf-8") in t2 and n2 == 1
    # full dispatch routes csv + records the encoding
    r = oracle.extract(l1)
    assert r.format == "csv" and r.ok and r.encoding == "latin-1"
    # non-table text with commas but inconsistent counts stays text
    assert oracle.sniff_format(b"one, two, three\njust one, comma\n") == "text"
    # single line is never csv
    assert oracle.sniff_format(b"a,b,c") == "text"


def test_pbm_render_decode_roundtrip():
    """The pixel→text path: render with FONT5X7, decode by glyph-cell
    classification — byte-identical text back, garbage → error row."""
    from multi_format_document_extractor_spark.oracle import (
        FONT5X7,
        _GLYPH_REV,
        extract_pbm,
        render_pbm,
    )

    assert len(_GLYPH_REV) == len(FONT5X7)  # glyphs pairwise distinct
    lines = ["HELLO WORLD", "SPARK SCAN", "A"]
    t, n = extract_pbm(render_pbm(lines))
    assert t == b"HELLO WORLD\nSPARK SCAN\nA" and n == 3
    r = oracle.extract(render_pbm(["DENSITY LAYOUT"]))
    assert r.format == "pbm" and r.ok and r.encoding is None
    assert r.text == b"DENSITY LAYOUT" and r.n_blocks == 1
    # truncated raster / malformed header are error rows, never exceptions
    bad = oracle.extract(b"P4\n100 100\n\x00\x01")
    assert bad.format == "pbm" and not bad.ok and "PBM" in bad.error
    bad2 = oracle.extract(b"P4\nxx\n")
    assert bad2.format == "pbm" and not bad2.ok
    # PNG/JPEG/GIF still route to the media path (no deterministic codec)
    assert not oracle.extract(b"\x89PNG\r\n\x1a\nxxxx").ok
