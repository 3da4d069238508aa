"""Font-metric glyph-advance word spacing (corpus v16).

The reference parses arbitrary real PDFs via pdfplumber
(src/parsers/pdf_parser.py:30-59), whose word assembly compares x-gaps
between positioned characters. This engine's equivalent is pen tracking
in oracle._pdf_text_spans: glyph advances from the embedded width
tables (/FirstChar+/Widths+/MissingWidth, CID /DescendantFonts→/DW+/W),
the ISO 32000 §9.4.4 advance formula (Tf size, Tc/Tw/Tz), and gap
classification against the font's own space advance. These tests pin
the parser halves, the classifier bands, and the legacy metric-less
posture staying bit-identical.
"""

import random

import pytest

from multi_format_document_extractor_spark import oracle
from multi_format_document_extractor_spark.corpus import (
    _build_pdf,
    _tounicode_cmap,
)

# uniform 500/1000-em glyphs, 250 space: adv(char) = 6pt, sp_adv = 3pt
# at Tf 12 — hand-computable positions throughout
W500 = [250 if c == 32 else 500 for c in range(32, 127)]


def _pdf(stream: bytes, **kw) -> bytes:
    return _build_pdf([stream], f1_widths=W500, **kw)


def _text(payload: bytes) -> str:
    return oracle.extract_pdf(payload)[0].decode()


# --------------------------------------------------------------------------
# Width-table parsing
# --------------------------------------------------------------------------


def test_simple_widths_direct_and_indirect_and_missing_width():
    for ind in (False, True):
        p = _pdf(b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (x) Tj ET",
                 widths_indirect=ind)
        pages = oracle._pdf_page_contents(p)
        assert pages is not None
        fonts = pages[0][1]
        f = fonts[b"/F1"]
        assert f.widths is not None and f.widths[32] == 250
        assert f.widths[ord("x")] == 500
        assert f.default_w == 500  # /MissingWidth from the descriptor
        assert f.space_w == 250
        assert f.cmap is None  # simple font: bytes are the text


def test_parse_cid_w_both_forms_and_hostile_range():
    w = oracle._parse_cid_w(b"[ 256 [ 500 600 700 ] 300 302 650 ]")
    assert w == {256: 500, 257: 600, 258: 700, 300: 650, 301: 650, 302: 650}
    with pytest.raises(ValueError):
        oracle._parse_cid_w(b"[ 0 70000 500 ]")


def test_cid_descendant_widths_resolved():
    charmap = {" ": 0x0100, "h": 0x0101, "i": 0x0102}
    cmap = _tounicode_cmap(charmap, random.Random(0))
    p = _build_pdf(
        [b"BT /F2 12 Tf 1 0 0 1 50 700 Tm <01010102> Tj ET"],
        cid_font=("F2", cmap),
        cid_widths=(b"[ 256 [ 300 400 500 ] ]", 777),
    )
    fonts = oracle._pdf_page_contents(p)[0][1]
    f = fonts[b"/F2"]
    assert f.nbytes == 2 and f.widths == {256: 300, 257: 400, 258: 500}
    assert f.default_w == 777
    assert f.space_w == 300  # the code whose ToUnicode value is " "
    assert _text(p) == "hi"


def test_corrupt_w_degrades_to_no_metrics_not_failure():
    charmap = {" ": 0x0100, "h": 0x0101, "i": 0x0102}
    cmap = _tounicode_cmap(charmap, random.Random(0))
    p = _build_pdf(
        [b"BT /F2 12 Tf 1 0 0 1 50 700 Tm <01010102> Tj ET"],
        cid_font=("F2", cmap),
        cid_widths=(b"[ 0 99999 500 ]", 1000),  # hostile range span
    )
    fonts = oracle._pdf_page_contents(p)[0][1]
    f = fonts[b"/F2"]
    assert f.widths is None  # metrics dropped, CMap survives
    assert _text(p) == "hi"


# --------------------------------------------------------------------------
# Gap classification: kern merge / word space / layout break
# --------------------------------------------------------------------------
# adv("hello") = 5·6 = 30pt; sp_adv = 3pt; space threshold 1.5pt,
# word-gap ceiling 18pt (6 space advances)


def test_word_positioned_spaces_reconstructed():
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (hello) Tj "
         b"33 0 Td (world) Tj ET")  # 30 advance + 3 (one space advance)
    assert _text(_pdf(s)) == "hello world"
    # without metrics the same stream reads as two separate boxes —
    # the pre-v16 posture, kept bit-identical for metric-less files
    assert _text(_build_pdf([s])) == "hello\nworld"


def test_midword_split_merges_seamlessly():
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (hel) Tj "
         b"18.4 0 Td (lo) Tj ET")  # adv(hel)=18 + 0.4pt kern < 1.5
    assert _text(_pdf(s)) == "hello"


def test_wide_gap_is_a_layout_jump_not_a_space():
    # 30 advance + 25pt gap > 6 space-advances: tab stop → two boxes
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (hello) Tj "
         b"55 0 Td (world) Tj ET")
    assert _text(_pdf(s)) == "hello\nworld"


def test_backtrack_breaks_the_span():
    # overstrike: pen at 80, move LEFT to 60 → new span, no merge
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (hello) Tj "
         b"-20 0 Td (world) Tj ET")
    assert _text(_pdf(s)) == "world\nhello"  # x-sorted reading order


def test_different_baseline_never_merges():
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (hello) Tj "
         b"33 -16 Td (world) Tj ET")
    assert _text(_pdf(s)) == "hello\nworld"


def test_gap_classification_through_tm_rescale():
    # Tm re-set mid-line at 2x scale: origin 116 = pen 80 + device gap
    # 36; gap_text = 36/2 = 18 ≥ 6·sp — break. At 83 the device gap of
    # 3 reads as 1.5 text units = 0.5·sp → exactly the word threshold.
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (hello) Tj "
         b"2 0 0 2 83 700 Tm (world) Tj ET")
    assert _text(_pdf(s)) == "hello world"


# --------------------------------------------------------------------------
# The §9.4.4 advance terms: Tc / Tw / Tz / " operator
# --------------------------------------------------------------------------


def test_tz_halves_advances():
    # Tz 50: adv(hello) = 15, sp = 1.5 → Td 16.5 lands one space later
    s = (b"BT /F1 12 Tf 50 Tz 1 0 0 1 50 700 Tm (hello) Tj "
         b"16.5 0 Td (world) Tj ET")
    assert _text(_pdf(s)) == "hello world"
    # the same Td WITHOUT Tz is a backtrack (adv 30 > 16.5) → break
    s2 = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (hello) Tj "
          b"16.5 0 Td (world) Tj ET")
    assert _text(_pdf(s2)) == "hello\nworld"


def test_tc_adds_per_glyph():
    # Tc 1: adv(hello) = 35, sp = 4 → Td 39 = one space advance
    s = (b"BT /F1 12 Tf 1 Tc 1 0 0 1 50 700 Tm (hello) Tj "
         b"39 0 Td (world) Tj ET")
    assert _text(_pdf(s)) == "hello world"


def test_tw_adds_per_space_glyph_and_raises_the_threshold():
    # Tw 4: shown space advances 3+4=7; adv("a b") = 6+7+6 = 19 → a
    # Td of 19 is a seamless continuation (gap 0)
    s = (b"BT /F1 12 Tf 4 Tw 1 0 0 1 50 700 Tm (a b) Tj "
         b"19 0 Td (c) Tj ET")
    assert _text(_pdf(s)) == "a bc"


def test_quote_operator_sets_tw_tc():
    # ": aw=4 ac=1 — afterwards sp_adv = 3+1+4 = 8, threshold 4pt, so
    # a 3pt gap (a SPACE without the "-set state) reads as a kern
    s = (b"BT /F1 12 Tf 12 TL 1 0 0 1 50 700 Tm (head) Tj "
         b"4 1 (line) \" "
         b"27 0 Td (x) Tj ET")  # adv(line)=4*(6+1)=28? no: see below
    # adv("line") with tc=1: 4·(6+1) = 28; Td 27 is a 1pt BACKTRACK →
    # break. Use 31: gap 3 < 4 → seamless merge proves tw/tc were set
    s = s.replace(b"27 0 Td", b"31 0 Td")
    assert _text(_pdf(s)) == "head\nlinex"


def test_metric_tj_kern_scales_with_the_font():
    # metric TJ: threshold = 0.5·250 = 125 thousandths — a -140 kern
    # (below the fixed -150) still reads as a space WITH metrics...
    s = b"BT /F1 12 Tf 1 0 0 1 50 700 Tm [(a) -140 (b)] TJ ET"
    assert _text(_pdf(s)) == "a b"
    # ...and stays a kern without them (legacy fixed threshold)
    assert _text(_build_pdf([s])) == "ab"
    # a wide-space font flips the reading the other way: threshold
    # 0.5·900 = 450, so -300 is sub-space kerning WITH metrics
    wide = [900 if c == 32 else 500 for c in range(32, 127)]
    s2 = b"BT /F1 12 Tf 1 0 0 1 50 700 Tm [(a) -300 (b)] TJ ET"
    assert _text(_build_pdf([s2], f1_widths=wide)) == "ab"
    assert _text(_build_pdf([s2])) == "a b"


def test_metrics_die_at_a_metric_less_show():
    # mid-line switch to the inline (width-less) /F2... here: a font
    # NOT in the resource dict — pen dies, later moves break spans
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (he) Tj /F9 12 Tf (llo) Tj "
         b"33 0 Td (world) Tj ET")
    assert _text(_pdf(s)) == "hello\nworld"


def test_missing_width_used_for_uncovered_codes():
    # DEL (127) is past /LastChar 126 → /MissingWidth 500 → adv 6pt
    s = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (\x7f) Tj "
         b"9 0 Td (x) Tj ET")  # 6 + one 3pt space advance
    assert _text(_pdf(s)) == "\x7f x"


# --------------------------------------------------------------------------
# Generator ↔ decoder lockstep across the whole v16 feature mix
# --------------------------------------------------------------------------


def test_corpus_v16_roundtrip_sweep():
    from multi_format_document_extractor_spark.corpus import _make_pdf

    n_metric = n_loadbearing = 0
    for seed in range(120):
        rng = random.Random(seed)
        payload, want, n_pages = _make_pdf(rng)
        got, np_ = oracle.extract_pdf(payload)
        assert got.decode() == want and np_ == n_pages, seed
        if b"/Widths" not in payload:
            continue
        n_metric += 1
        # metrics must be load-bearing, not decorative: a reader that
        # ignores the width tables gets different text on most
        # metric files (word-positioned spaces lost)
        broken = payload.replace(b"/Widths", b"/Xidths").replace(
            b"/W ", b"/X "
        )
        if oracle.extract_pdf(broken)[0].decode() != want:
            n_loadbearing += 1
    assert n_metric >= 15, n_metric
    assert n_loadbearing >= n_metric // 2, (n_loadbearing, n_metric)
