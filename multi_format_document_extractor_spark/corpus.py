"""Deterministic Common-Crawl-style page corpus generator (SURVEY.md §7 M0).

Generates the ``pages`` input table of BASELINE.json's input_hint shape
``(url, warc_ts, html BINARY, text, lang)`` plus the golden ``expected``
table (url, format, text_expected BINARY, n_blocks, checksum). The generator
*constructs* the main content, so expected bytes come from its own knowledge
— not from running the oracle — which makes the byte-identical pytest (T1)
a real two-implementation check.

Row mix per FIXTURES.md §1 (extended round 2): ~60% HTML, ~13% PDF, ~8%
plain text, ~5% DOCX + ~5% XLSX (real PK-zip containers), ~4% binary
image (decodable PBM/PNG/GIF/JPEG + noise payloads on the error path),
~3% empty/null payload (error path), ~2%
oversized (≥1 MB, skew path). Host
distribution is Zipf-like (host0 ≈ 30% of urls) to exercise salting (T4).
All randomness flows from one seed.
"""

from __future__ import annotations

import base64
import io
import random
import zipfile
import zlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

# Bump when generator output changes for a given (n, seed): cache dirs
# (bench.py, scaling_bench) embed this so a stale corpus is never reused.
CORPUS_VERSION = 21  # v21: ~22% of PDFs are SCANNED documents — page
# content is a raster image XObject (gray/1-bit/RGB Flate ± PNG
# predictor ± /Decode inversion, or /DCTDecode JPEG) whose text exists
# only as FONT5X7 pixels, some pages with a typeset header above the
# scan; extraction must decode the raster and glyph-classify it in
# reading order (oracle._pdf_image_spans). v20: the charset layer covers the unicameral
# scripts — Arabic (windows-1256), Hebrew (windows-1255), Thai
# (windows-874) pages appear BOTH declared and undeclared; undeclared
# ones exercise the detector's caseless-coherence branch (no lowercase
# signal exists in those scripts). v19: ~4% of HTML pages are UNDECLARED legacy pages
# (no BOM, no meta charset — codec from the statistically-detectable set:
# cp1251/koi8-r/greek/sjis/euc-kr/gbk/big5/iso-2022-jp) that only
# oracle.detect_encoding (charset_normalizer-class deterministic
# detection: script-class letter evidence, case coherence, frequency
# markers, the iso-2022 ESC signature) recovers — the reference chain
# reads them as latin-1 mojibake; the Japanese vocab gains kana function
# words (real text is never kanji-only, and the detector keys on kana).
# v18: the declared-charset mix widens to 11 legacy
# codecs — iso-2022-jp (STATEFUL escape-coded Japanese: ESC $ B / ESC ( B
# shifts mid-stream, the one decode class the others never exercise),
# euc-jp, gb18030, and big5 (TRADITIONAL Chinese — its repertoire is
# disjoint enough from gbk's simplified vocab that a wrong-table decode
# cannot round-trip) join the v17 set.
# v17: ~10% of HTML pages are DECLARED-CHARSET pages
# (windows-1251/koi8-r Cyrillic, shift_jis Japanese, gbk Chinese,
# euc-kr Korean, iso-8859-7 Greek, windows-1252 accented Latin) carrying
# a <meta charset>/<meta http-equiv> declaration under a random WHATWG
# label + random case, encoded in that codec — only the BOM/meta-prescan
# sniff (oracle.decode_web) recovers them; plus utf-16le/be BOM pages
# (whole doc in utf-16, BOM wins over any meta). v16: ~45% of
# single-column PDFs carry real font
# metrics (/Widths, CID /W) and ~60% of their pages typeset
# WORD-POSITIONED — spaces exist only as glyph-advance Td gaps / TJ
# kerns sized from the embedded width tables, so only metric-aware pen
# tracking reconstructs them. v15: ~12% of PNGs carry tRNS transparency with
# DARK paper (color-keyed gray/RGB or zero-alpha palette index) — only
# a tRNS-honoring reader recovers the page. v14: ~15% of PNGs are
# SUB-BYTE depth (1/2/4-bit
# gray fax + palette icon shapes, packed-byte filter taps). v13: ~25%
# of PNGs are Adam7-INTERLACED and ~15%
# are 16-bit depth (MSB reduction) — on top of the v10 color-type mix.
# v12: ~30% of JPEGs are PROGRESSIVE (SOF2, the
# full successive-approximation scan script, gray + color mix). v11:
# ~30% of PDF pages typeset at a text-matrix SCALE (Tm a/d = 0.5 or 2,
# Td/TD deltas in text space) — only a full-affine reader lands them.
# v10: COLOR rasters — ~55% of PNGs carry color
# types 2/3/4/6 (truecolor / palette / gray+alpha / RGBA with
# transparent backgrounds), ~60% of JPEGs are 3-component YCbCr at
# 4:4:4 / 4:2:2 / 4:2:0 with optional DRI restart intervals. v9: CID
# fonts + word-space kerns in PDF TJ arrays (LZW/AHx/A85/RL + chains),
# predictor-packed xref streams, hex-string and octal-escape show
# operands, ~18% CID subset fonts readable only via the /ToUnicode CMap

_VOCAB = (
    "data spark table query scan filter join merge sort window agg group "
    "batch stream row column key value hash part order line customer fast "
    "slow small big the a vector extract parse block density layout page "
    "content crawl web text format detect score valid route sample"
).split()

_LANGS = ["en", "de", "hi", "fr"]

_WS = " "


@dataclass
class PageRow:
    url: str
    warc_ts: datetime
    html: bytes | None
    text: str
    lang: str
    # golden expectation
    format: str
    text_expected: bytes
    n_blocks: int


def _words(rng: random.Random, n: int) -> str:
    return _WS.join(rng.choice(_VOCAB) for _ in range(n))


def _sprinkle_ws(rng: random.Random, s: str) -> str:
    """Inject messy whitespace into HTML source; expected text stays
    collapsed (oracle collapses runs of whitespace)."""
    out = []
    for w in s.split(" "):
        out.append(w)
        r = rng.random()
        out.append("  " if r < 0.1 else ("\n    " if r < 0.15 else " "))
    return "".join(out).rstrip()


# ---------------------------------------------------------------------------
# HTML pages
# ---------------------------------------------------------------------------

# v17 declared-charset pages: per-script vocabularies, every word encodable
# in the target codec (the generator round-trips each at import is overkill;
# the corpus tests cover it). Keys are WHATWG canonical names — labels and
# python codecs come from oracle.WHATWG_ENCODINGS, so the corpus can never
# declare a label the sniffer does not know.
_CHARSET_VOCABS: dict[str, tuple[str, ...]] = {
    "windows-1251": tuple(
        "москва слово город время человек жизнь работа система вопрос "
        "ответ книга вода земля небо день новость статья поиск".split()
    ),
    "koi8-r": tuple(
        "россия язык страница сервер сеть файл данные таблица запрос "
        "фильтр окно строка столбец ключ значение поток".split()
    ),
    "shift_jis": tuple(
        "日本 東京 言葉 時間 世界 技術 情報 文書 記事 内容 検索 画面 "
        "利用 場合 必要 説明 結果 方法 "
        # kana function words (v19): real Japanese is never kanji-only,
        # and the statistical detector keys on kana presence
        "の です ます こと これ する した もの ため いる".split()
    ),
    "gbk": tuple(
        "中国 北京 时间 世界 技术 信息 文档 文章 内容 搜索 使用 需要 "
        "系统 问题 回答 数据 表格 查询".split()
    ),
    "euc-kr": tuple(
        "한국 서울 시간 세계 기술 정보 문서 기사 내용 검색 사용 필요 "
        "시스템 질문 답변 데이터".split()
    ),
    "iso-8859-7": tuple(
        "αθήνα λέξη χρόνος κόσμος τεχνολογία πληροφορία κείμενο άρθρο "
        "ζωή νερό γη ουρανός μέρα νύχτα δρόμος".split()
    ),
    "windows-1252": tuple(
        "café naïve résumé jalapeño señor fiancée crème brûlée déjà "
        "façade piñata smörgås über göteborg zürich".split()
    ),
}

# v18 codecs: the Japanese list re-encodes cleanly in both JIS framings
# (iso-2022-jp is the stateful escape-coded one — a decode class the
# others never exercise); gb18030 is a superset of gbk so the simplified
# list carries over; big5 gets its own TRADITIONAL list (encodability of
# every word in its codec is pinned in tests/test_encoding.py).
_CHARSET_VOCABS["iso-2022-jp"] = _CHARSET_VOCABS["shift_jis"]
_CHARSET_VOCABS["euc-jp"] = _CHARSET_VOCABS["shift_jis"]
_CHARSET_VOCABS["gb18030"] = _CHARSET_VOCABS["gbk"]
_CHARSET_VOCABS["big5"] = tuple(
    "台灣 時間 世界 技術 資訊 文件 文章 內容 搜尋 使用 需要 系統 "
    "問題 資料 網頁 語言".split()
)
# v20 unicameral scripts (Arabic, Hebrew, Thai) — the detector's caseless
# coherence branch; every word round-trip-pinned like the rest
_CHARSET_VOCABS["windows-1256"] = tuple(
    "السلام عليكم مدينة كتاب ماء سماء يوم خبر مقال بحث نظام سؤال "
    "جواب وقت عالم".split()
)
_CHARSET_VOCABS["windows-1255"] = tuple(
    "שלום עולם עיר ספר מים שמים יום חדשות מאמר חיפוש מערכת שאלה "
    "תשובה זמן".split()
)
_CHARSET_VOCABS["windows-874"] = tuple(
    "กรุงเทพ เมือง หนังสือ น้ำ ฟ้า วัน ข่าว บทความ ค้นหา ระบบ คำถาม "
    "คำตอบ เวลา โลก".split()
)

# utf-16 page content mixes scripts (the codec covers all of Unicode)
_U16_VOCAB = (
    _CHARSET_VOCABS["windows-1251"][:6]
    + _CHARSET_VOCABS["shift_jis"][:6]
    + _CHARSET_VOCABS["iso-8859-7"][:6]
    + ("data", "spark", "table", "page")
)


# undeclared pages draw only from codecs the statistical detector covers
# (oracle.detect_encoding candidates + the iso-2022 ESC signature)
_DETECTABLE = (
    "windows-1251", "koi8-r", "iso-8859-7",
    "shift_jis", "euc-kr", "gbk", "big5", "iso-2022-jp",
    "windows-1256", "windows-1255", "windows-874",  # unicameral (v20)
)


def _make_charset_html(
    rng: random.Random, declared: bool = True
) -> tuple[bytes, str, int]:
    """A declared-charset page (corpus v17): real-script content encoded in
    a legacy web codec, recoverable ONLY via the WHATWG meta-prescan /
    BOM sniff (oracle.sniff_encoding) — the reference chain would decode
    these as latin-1 mojibake. Declaration shapes rotate across
    ``<meta charset=X>`` (bare/quoted) and
    ``<meta http-equiv="Content-Type" content="text/html; charset=X">``
    under a random WHATWG label with random case; ~1 in 8 pages is
    instead a BOM'd utf-16le/be document (BOM wins over any meta).

    With ``declared=False`` (corpus v19): an UNDECLARED legacy page — no
    BOM, no charset anywhere (a decoy charset-free ``<meta>`` instead),
    codec drawn from the statistically-detectable set — only
    ``oracle.detect_encoding`` (or the iso-2022 ESC signature) recovers
    it. Returns (payload, expected_text, n_blocks)."""
    from .oracle import WHATWG_ENCODINGS

    if not declared:
        name = rng.choice(_DETECTABLE)
        codec = WHATWG_ENCODINGS[name][0]
        vocab = _CHARSET_VOCABS[name]
        meta = rng.choice((
            '<meta name="viewport" content="width=device-width">',
            '<meta name="robots" content="index, follow">',
            "",
        ))
        bom = b""
    elif rng.random() < 0.125:
        name = rng.choice(("utf-16le", "utf-16be"))
        codec = "utf-16-le" if name == "utf-16le" else "utf-16-be"
        vocab = _U16_VOCAB
        # a misleading meta on some BOM pages: the BOM must win
        meta = (
            '<meta charset="windows-1251">' if rng.random() < 0.5 else
            '<meta charset="utf-8">'
        )
        bom = b"\xff\xfe" if name == "utf-16le" else b"\xfe\xff"
    else:
        name = rng.choice(tuple(_CHARSET_VOCABS))
        codec = WHATWG_ENCODINGS[name][0]
        vocab = _CHARSET_VOCABS[name]
        label = rng.choice(WHATWG_ENCODINGS[name][1])
        # labels match case-insensitively after ASCII-whitespace trim
        label = "".join(
            c.upper() if rng.random() < 0.5 else c for c in label
        )
        style = rng.random()
        if style < 0.4:
            meta = f'<meta charset="{label}">'
        elif style < 0.6:
            meta = f"<meta charset={label}>"
        else:
            meta = (
                '<meta http-equiv="Content-Type" '
                f'content="text/html; charset={label}">'
            )
        bom = b""

    nav = "".join(f'<a href="/c{i}">{_words(rng, 2)}</a> ' for i in range(6))
    k = rng.randint(1, 4)
    paragraphs: list[str] = []
    para_html: list[str] = []
    for _ in range(k):
        words = [rng.choice(vocab) for _ in range(rng.randint(30, 70))]
        plain = _WS.join(words)
        paragraphs.append(plain)
        para_html.append(f"<p>{_sprinkle_ws(rng, plain)}</p>")
    doc = (
        "<!DOCTYPE html>\n<html><head><title>"
        + _words(rng, 3)
        + "</title>"
        + meta
        + f"</head><body><nav>{nav}</nav>"
        + "".join(f"<div class='c'>{p}</div>" for p in para_html)
        + f"<footer>{_words(rng, 8)}</footer></body></html>"
    )
    return bom + doc.encode(codec), "\n\n".join(paragraphs), len(paragraphs)


def _make_html(rng: random.Random, oversized: bool = False) -> tuple[bytes, str, int]:
    """Returns (payload, expected_text, n_blocks)."""
    title = _words(rng, 3)
    nav_links = "".join(
        f'<a href="/{rng.choice(_VOCAB)}">{_words(rng, 2)}</a> ' for _ in range(6)
    )
    menu_links = "".join(
        f'<a href="/m{i}">{_words(rng, rng.randint(1, 3))}</a> | ' for i in range(8)
    )
    k = rng.randint(1, 5)
    if oversized:
        k = 40
    paragraphs: list[str] = []  # expected normalized content text per block
    para_html: list[str] = []
    for i in range(k):
        n = rng.randint(30, 90) if not oversized else rng.randint(2000, 3000)
        words = [rng.choice(_VOCAB) for _ in range(n)]
        style = rng.random()
        if style < 0.3:
            # nested inline tags in content (edge case: nesting must not
            # break density classification)
            j = rng.randrange(0, n - 3)
            plain = _WS.join(words)
            inner = (
                _WS.join(words[:j])
                + (" " if j else "")
                + f"<b>{words[j]}</b> <em>{_WS.join(words[j + 1 : j + 3])}</em> "
                + _WS.join(words[j + 3 :])
            )
            html_p = f"<p>{_sprinkle_ws(rng, inner)}</p>"
            expected = plain
        elif style < 0.5:
            # content block with exactly one inline link (link density low)
            j = rng.randrange(0, n - 1)
            plain = _WS.join(words)
            inner = (
                _WS.join(words[:j])
                + (" " if j else "")
                + f'<a href="/x">{words[j]}</a> '
                + _WS.join(words[j + 1 :])
            )
            html_p = f"<p>{inner}</p>"
            expected = plain
        else:
            plain = _WS.join(words)
            html_p = f"<p>{_sprinkle_ws(rng, plain)}</p>"
            expected = plain
        paragraphs.append(expected)
        para_html.append(html_p)

    # sidebar: the longest block on ~10% of pages is boilerplate by link
    # density (edge case: density must win over length)
    sidebar_n = 40 if rng.random() < 0.1 else 8
    sidebar = "<div class='related'>" + "".join(
        f'<a href="/r{i}">{_words(rng, 4)}</a> ' for i in range(sidebar_n)
    ) + "</div>"

    body = (
        f"<nav>{nav_links}</nav>"
        f"<div class='menu'>{menu_links}</div>"
        + "".join(f"<div class='c'>{p}</div>" for p in para_html)
        + sidebar
        + f"<footer>{_words(rng, 10)} &copy; 2026</footer>"
    )
    if rng.random() < 0.03:
        body = ""  # empty-body edge case
        paragraphs = []
    doc = (
        "<!DOCTYPE html>\n<html><head><title>"
        + title
        + '</title><meta charset="utf-8"></head><body>'
        + body
        + "</body></html>"
    )
    expected_text = "\n\n".join(paragraphs)
    return doc.encode("utf-8"), expected_text, len(paragraphs)


# ---------------------------------------------------------------------------
# PDF pages (real container + real text-op vocabulary; oracle.extract_pdf)
# ---------------------------------------------------------------------------


# --- corpus v16: synthetic-but-varied font metrics (thousandths of text
# space). Non-uniform per glyph so word-positioned typography genuinely
# depends on per-glyph advances (a monospace table would let a cheater
# count characters); the decoder reads these same numbers back from the
# embedded /Widths and /W tables.
PDF_F1_SPACE_W = 278  # the Helvetica space width


def _f1_width(ch: int) -> int:
    """Glyph width of byte ``ch`` in the metric /F1 font (32..126)."""
    return PDF_F1_SPACE_W if ch == 32 else 400 + (ch * 7) % 300


def _cid_width(code: int) -> int:
    """Glyph width of CID ``code`` in the metric /F2 font: varied over
    the first 16 codes (listed form in /W), constant 650 beyond (range
    form) — both ISO 32000 §9.7.4.3 forms stay load-bearing."""
    return 500 + (code * 11) % 250 if code < 0x0110 else 650


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


# --- PDF stream-filter ENCODERS (corpus v8) --------------------------------
# Each is the exact inverse of the oracle's decoder (oracle.py §7.4 filter
# chain); the pairing is validated by roundtrip + hand-derived-vector
# pytest, not by sharing code, so it stays a two-implementation check.


def _lzw_encode(data: bytes) -> bytes:
    """PDF LZW with EarlyChange=1 (ISO 32000 §7.4.4): 9→12-bit codes,
    CLEAR emitted up front and again when the table nears 4095."""
    out = bytearray()
    buf = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, bits
        buf = (buf << width) | code
        bits += width
        while bits >= 8:
            bits -= 8
            out.append((buf >> bits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # EarlyChange=1: widen one code early, mirroring the decoder's
        # len(table) >= (1 << width) - 1 rule (decoder appends one entry
        # later than the encoder, hence the +1 offset here)
        if width < 12 and next_code >= (1 << width):
            width += 1
        if next_code >= 4093:  # table nearly full: reset like real writers
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])  # the unmatched byte carries into the new phrase
    if w:
        emit(table[w], width)
    emit(257, width)
    if bits:
        out.append((buf << (8 - bits)) & 0xFF)
    return bytes(out)


def _asciihex_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def _ascii85_encode(data: bytes) -> bytes:
    return base64.a85encode(data) + b"~>"


def _runlength_encode(data: bytes) -> bytes:
    """Greedy /RunLengthDecode inverse: repeat runs ≥3 become (257-n,
    byte); everything else accumulates into ≤128-byte literal runs."""
    out = bytearray()
    i, n = 0, len(data)
    lit = bytearray()

    def flush_lit() -> None:
        p = 0
        while p < len(lit):
            chunk = lit[p : p + 128]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            p += 128
        lit.clear()

    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            flush_lit()
            out.append(257 - run)
            out.append(data[i])
        else:
            lit += data[i:j]
        i = j
    flush_lit()
    out.append(128)
    return bytes(out)


# name → (encoder, /Filter dict fragment); "a85+flate" stores
# a85encode(deflate(raw)) so the decoder's in-order chain
# [/ASCII85Decode /FlateDecode] inverts it
_PDF_STREAM_FILTERS: dict[str, tuple] = {
    "flate": (zlib.compress, b"/FlateDecode"),
    "lzw": (_lzw_encode, b"/LZWDecode"),
    "ahx": (_asciihex_encode, b"/ASCIIHexDecode"),
    "a85": (_ascii85_encode, b"/ASCII85Decode"),
    "rl": (_runlength_encode, b"/RunLengthDecode"),
    "a85+flate": (
        lambda d: _ascii85_encode(zlib.compress(d)),
        b"[/ASCII85Decode /FlateDecode]",
    ),
}


def _tounicode_cmap(charmap: dict[str, int], rng: random.Random) -> bytes:
    """ToUnicode CMap stream body for a code→char map (2-byte codes):
    consecutive code runs whose unicode also increments become scalar
    ``bfrange`` entries, other consecutive runs the array form, and a
    deterministic-random share stays as ``bfchar`` singletons — so all
    three CMap mapping syntaxes are load-bearing in the corpus."""
    pairs = sorted((code, ch) for ch, code in charmap.items())
    runs: list[list[tuple[int, str]]] = []
    for code, ch in pairs:
        if runs and code == runs[-1][-1][0] + 1 and len(runs[-1]) < 64:
            runs[-1].append((code, ch))
        else:
            runs.append([(code, ch)])
    bfchar: list[bytes] = []
    bfrange: list[bytes] = []
    for run in runs:
        if len(run) == 1 or rng.random() < 0.25:
            bfchar.extend(
                b"<%04X> <%s>"
                % (code, ch.encode("utf-16-be").hex().upper().encode())
                for code, ch in run
            )
            continue
        lo, hi = run[0][0], run[-1][0]
        ords = [ord(ch) for _, ch in run]
        if ords == list(range(ords[0], ords[0] + len(run))):
            bfrange.append(
                b"<%04X> <%04X> <%s>"
                % (lo, hi, run[0][1].encode("utf-16-be").hex().upper().encode())
            )
        else:
            dsts = b" ".join(
                b"<%s>" % ch.encode("utf-16-be").hex().upper().encode()
                for _, ch in run
            )
            bfrange.append(b"<%04X> <%04X> [%s]" % (lo, hi, dsts))
    parts = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    if bfchar:
        parts.append(b"%d beginbfchar" % len(bfchar))
        parts.extend(bfchar)
        parts.append(b"endbfchar")
    if bfrange:
        parts.append(b"%d beginbfrange" % len(bfrange))
        parts.extend(bfrange)
        parts.append(b"endbfrange")
    parts += [b"endcmap", b"end", b"end"]
    return b"\n".join(parts)


def _build_pdf(
    page_streams: list[bytes],
    flate: bool = False,
    indirect_length: bool = False,
    permute: random.Random | None = None,
    objstm: bool = False,
    stream_filter: str | None = None,
    xref_predictor: bool = False,
    cid_font: tuple[str, bytes] | None = None,
    indirect_resources: bool = False,
    f1_widths: list[int] | None = None,
    widths_indirect: bool = False,
    cid_widths: tuple[bytes, int] | None = None,
    images: dict[str, tuple[bytes, bytes]] | None = None,
) -> bytes:
    """Assemble a minimal multi-page PDF. Corpus v4 exercises the
    real-subset container features the parser supports (VERDICT r3 #1):
    ``flate`` zlib-compresses content streams (``/Filter /FlateDecode``
    — the reportlab default the reference's fixtures use), and BINARY
    stream bytes can contain fake ``endobj``/``endstream`` runs, so only
    a /Length-honoring walk parses them; ``indirect_length`` stores each
    stream's /Length as a forward ``n 0 R`` reference to an integer
    object at the END of the file (how incremental writers emit it);
    ``permute`` shuffles the PHYSICAL object order so file order is NOT
    page order — only the xref table + /Kids structure walk reads these
    correctly (a raw stream scan gets the page order wrong);
    ``objstm`` emits the PDF 1.5 container — the whole page TREE
    (catalog/pages/page dicts) packs into one Flate-compressed
    ``/Type /ObjStm`` object stream and the cross-reference becomes a
    binary ``/Type /XRef`` STREAM with /W-packed type-1/type-2 rows (no
    ``trailer`` keyword) — the layout modern writers produce, readable
    only by a parser that walks both.

    Corpus v8 additions: ``stream_filter`` picks the content-stream
    encoding from ``_PDF_STREAM_FILTERS`` (the five standard filters
    plus an ``a85+flate`` chain; supersedes the legacy ``flate`` flag),
    and ``xref_predictor`` packs the /XRef stream rows with the PNG Up
    predictor (``/DecodeParms << /Predictor 12 /Columns 7 >>``) — the
    layout reportlab-class writers actually emit.

    ``cid_font`` = (resource name, ToUnicode CMap stream body): adds an
    Identity-H ``/Type0`` font object whose 2-byte show codes are only
    readable through the referenced /ToUnicode CMap — the
    subset-embedded-font layout real writers emit, where codes are NOT
    character values. ``indirect_resources`` stores the page /Resources
    dict as its own indirect object instead of inline.

    Corpus v21 scanned pages: ``images`` maps an XObject resource name
    (e.g. ``Im0``) to (dict-head fragment sans /Type//Subtype//Length,
    raw stream data); each becomes a ``/Type /XObject /Subtype /Image``
    stream object referenced from the page /Resources ``/XObject``
    dict — the layout a scanner/print driver emits, where page content
    is one ``cm … Do`` painting and the text lives only in pixels.

    Corpus v16 metrics: ``f1_widths`` turns /F1 into an INDIRECT font
    object carrying real glyph metrics — ``/FirstChar 32`` + ``/Widths``
    (inline array, or its own indirect object when ``widths_indirect``)
    + a /FontDescriptor with ``/MissingWidth 500`` — the layout every
    real writer emits and the decoder's word-break reconstruction reads
    (oracle._simple_font_widths). ``cid_widths`` = (/W array bytes, DW)
    adds a ``/DescendantFonts`` CIDFont to the Type0 font with the /W
    width table (oracle._cid_font_widths)."""
    if stream_filter is None and flate:
        stream_filter = "flate"
    n = len(page_streams)
    objs: list[tuple[int, bytes]] = []  # (obj_num, body)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objs.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    )
    next_int_obj = 3 + 2 * n
    if f1_widths is not None:
        f1_num, desc_num = next_int_obj, next_int_obj + 1
        next_int_obj += 2
        w_body = "[ " + " ".join(str(w) for w in f1_widths) + " ]"
        if widths_indirect:
            arr_num = next_int_obj
            next_int_obj += 1
            objs.append((arr_num, w_body.encode()))
            w_frag = f"{arr_num} 0 R"
        else:
            w_frag = w_body
        objs.append(
            (
                desc_num,
                b"<< /Type /FontDescriptor /FontName /Helvetica"
                b" /Flags 32 /MissingWidth 500 >>",
            )
        )
        objs.append(
            (
                f1_num,
                (
                    f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                    f" /FirstChar 32 /LastChar {32 + len(f1_widths) - 1}"
                    f" /Widths {w_frag} /FontDescriptor {desc_num} 0 R >>"
                ).encode(),
            )
        )
        font_frag = f"/Font << /F1 {f1_num} 0 R"
    else:
        font_frag = (
            "/Font << /F1 "
            "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
    if cid_font is not None:
        fname, cmap_body = cid_font
        font_num, cmap_num = next_int_obj, next_int_obj + 1
        next_int_obj += 2
        desc_frag = ""
        if cid_widths is not None:
            w_arr, dw = cid_widths
            cdesc_num = next_int_obj
            next_int_obj += 1
            objs.append(
                (
                    cdesc_num,
                    (
                        f"<< /Type /Font /Subtype /CIDFontType2"
                        f" /BaseFont /AAAAAA+Fake /DW {dw} /W "
                    ).encode()
                    + w_arr
                    + b" >>",
                )
            )
            desc_frag = f" /DescendantFonts [{cdesc_num} 0 R]"
        objs.append(
            (
                font_num,
                (
                    f"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Fake"
                    f" /Encoding /Identity-H{desc_frag}"
                    f" /ToUnicode {cmap_num} 0 R >>"
                ).encode(),
            )
        )
        if stream_filter is not None:
            enc, name = _PDF_STREAM_FILTERS[stream_filter]
            cdata = enc(cmap_body)
            cfilt = b" /Filter " + name
        else:
            cdata, cfilt = cmap_body, b""
        objs.append(
            (
                cmap_num,
                b"<< /Length " + str(len(cdata)).encode() + cfilt
                + b" >>\nstream\n" + cdata + b"\nendstream",
            )
        )
        font_frag += f" /{fname} {font_num} 0 R"
    font_frag += " >>"
    if images:
        xfrags: list[str] = []
        for iname, (ihead, idata) in images.items():
            inum = next_int_obj
            next_int_obj += 1
            objs.append(
                (
                    inum,
                    b"<< /Type /XObject /Subtype /Image " + ihead
                    + f" /Length {len(idata)} >>\nstream\n".encode()
                    + idata
                    + b"\nendstream",
                )
            )
            xfrags.append(f"/{iname} {inum} 0 R")
        font_frag += " /XObject << " + " ".join(xfrags) + " >>"
    if indirect_resources:
        res_num = next_int_obj
        next_int_obj += 1
        objs.append((res_num, f"<< {font_frag} >>".encode()))
        res_frag = f"/Resources {res_num} 0 R"
    else:
        res_frag = f"/Resources << {font_frag} >>"
    for i, stream in enumerate(page_streams):
        objs.append(
            (
                3 + 2 * i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {4 + 2 * i} 0 R {res_frag} >>"
                ).encode(),
            )
        )
        if stream_filter is not None:
            enc, name = _PDF_STREAM_FILTERS[stream_filter]
            data = enc(stream)
            filt = b" /Filter " + name
        else:
            data, filt = stream, b""
        if indirect_length:
            length = f"{next_int_obj} 0 R".encode()
            objs.append((next_int_obj, str(len(data)).encode()))
            next_int_obj += 1
        else:
            length = str(len(data)).encode()
        objs.append(
            (
                4 + 2 * i,
                b"<< /Length " + length + filt + b" >>\nstream\n"
                + data
                + b"\nendstream",
            )
        )
    if objstm:
        tree_nums = {1, 2} | {3 + 2 * i for i in range(n)}
        tree = [(num, body) for num, body in objs if num in tree_nums]
        direct = [(num, body) for num, body in objs if num not in tree_nums]
        s_num = max(num for num, _ in objs) + 1
        x_num = s_num + 1
        # object stream: header pairs, then bodies newline-joined
        offs: list[tuple[int, int]] = []
        cur = 0
        for num, body in tree:
            offs.append((num, cur))
            cur += len(body) + 1
        header = (" ".join(f"{a} {b}" for a, b in offs) + "\n").encode()
        data = header + b"\n".join(body for _, body in tree)
        zdata = zlib.compress(data)
        direct.append(
            (
                s_num,
                (
                    f"<< /Type /ObjStm /N {len(tree)} /First {len(header)} "
                    f"/Filter /FlateDecode /Length {len(zdata)} >>\nstream\n"
                ).encode()
                + zdata
                + b"\nendstream",
            )
        )
        if permute is not None:
            permute.shuffle(direct)
        out = bytearray(b"%PDF-1.5\n")
        offsets: dict[int, int] = {}
        for num, obj in direct:
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + obj + b"\nendobj\n"
        xref_pos = len(out)
        tree_index = {num: i for i, (num, _) in enumerate(tree)}
        rows = bytearray()
        for num in range(x_num + 1):
            if num == x_num:
                typ, f2, f3 = 1, xref_pos, 0
            elif num in offsets:
                typ, f2, f3 = 1, offsets[num], 0
            elif num in tree_index:
                typ, f2, f3 = 2, s_num, tree_index[num]
            else:
                typ, f2, f3 = 0, 0, 65535 if num == 0 else 0
            rows += (
                typ.to_bytes(1, "big")
                + f2.to_bytes(4, "big")
                + f3.to_bytes(2, "big")
            )
        if xref_predictor:
            # PNG Up predictor over the 7-byte rows, tagged per row —
            # what reportlab-class writers emit on xref streams
            pred = bytearray()
            prev = bytes(7)
            for r in range(0, len(rows), 7):
                row = bytes(rows[r : r + 7])
                pred.append(2)
                pred += bytes((row[i] - prev[i]) & 0xFF for i in range(7))
                prev = row
            zrows = zlib.compress(bytes(pred))
            parms = " /DecodeParms << /Predictor 12 /Columns 7 >>"
        else:
            zrows = zlib.compress(bytes(rows))
            parms = ""
        out += (
            f"{x_num} 0 obj\n<< /Type /XRef /Size {x_num + 1} /W [1 4 2] "
            f"/Root 1 0 R /Filter /FlateDecode{parms} /Length {len(zrows)} >>"
            "\nstream\n"
        ).encode()
        out += zrows + b"\nendstream\nendobj\n"
        out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
        return bytes(out)
    if permute is not None:
        permute.shuffle(objs)
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num, obj in objs:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for num in sorted(offsets):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _make_pdf(rng: random.Random) -> tuple[bytes, str, int]:
    """1- or 2-column layout, 1-2 pages; text ops use the REAL op
    vocabulary (v7, matching oracle._pdf_text_spans): per-op moves mix
    absolute ``Tm`` with spec-correct RELATIVE ``Td`` deltas, shows mix
    plain ``Tj`` with kerned ``TJ`` arrays (split mid-line with small
    kerns extraction must concatenate across, or — v9 — at a space
    typeset as a wide kern gap extraction must re-insert), and ~35% of
    single-column pages typeset as the classic ``Td``/``TD``-leading/
    ``'`` chain reportlab-style generators emit. Two-column ops are
    interleaved across columns (stream order is NOT reading order), so
    reading-order reconstruction AND relative-move state tracking are
    both exercised. ~30% of pages (v11) typeset at a text-matrix scale
    (``s 0 0 s`` Tm, s ∈ {0.5, 2}) with every Td/TD delta divided into
    text space — translation-only readers shear those pages.

    ~18% of PDFs carry a CID subset font (v8): most of their lines show
    as 2-byte Identity-H glyph codes under ``/F2`` — readable only
    through the /ToUnicode CMap (codes start at 0x0100, so raw decode
    yields garbage) — with ``/F1`` literal lines interleaved to exercise
    per-show font switching.

    ~45% of single-column PDFs carry REAL FONT METRICS (v16): /F1 gains
    /FirstChar + /Widths (+ /FontDescriptor /MissingWidth), a CID /F2
    gains /DescendantFonts → /DW + /W, and some pages set Tc char
    spacing or a Tz horizontal scale. On those PDFs ~60% of pages
    typeset WORD-POSITIONED: every word (sometimes a mid-word fragment)
    is its own show op placed by a Td computed from the glyph advances —
    spaces exist ONLY as positioning gaps sized in multiples of the
    font's own space advance, and mid-word fragments continue at
    sub-space gaps. Only a decoder that reads the width tables and
    applies the §9.4.4 advance formula (oracle's pen tracking) can tell
    a word break from a kern; TJ word kerns on metric PDFs are likewise
    sized relative to the metric threshold rather than the fixed
    PDF_WORD_KERN. Two-column PDFs stay metric-less by design: the
    same-baseline word-gap heuristic cannot distinguish a column gutter
    from a wide tab when a left-column line happens to end near the
    right column's origin — the posture real extractors share (pdftotext
    needs -layout for those), documented rather than hidden."""
    n_pages = rng.randint(1, 2)
    two_col = rng.random() < 0.5
    cid = rng.random() < 0.18
    metric = not two_col and rng.random() < 0.45
    # per-PDF char spacing / horizontal scale (metric pages only — the
    # advance formula terms beyond bare glyph widths)
    tc = rng.choice((0.0, 0.0, 0.25, 0.4)) if metric else 0.0
    th_pct = rng.choice((100, 100, 100, 50)) if metric else 100
    charmap: dict[str, int] = {}
    if metric and cid:
        # the space's CID must exist for the /W-driven space advance
        # even though word-positioned lines never SHOW a space glyph
        charmap[" "] = 0x0100

    def cid_codes(s: str) -> str:
        return "".join(
            f"{charmap.setdefault(ch, 0x0100 + len(charmap)):04x}" for ch in s
        )

    # --- v16 metric helpers: the generator computes advances with the
    # SAME §9.4.4 formula the oracle's pen tracking applies, over the
    # same width tables it embeds in the file
    def f1_adv(s: str) -> float:
        return sum(
            _f1_width(ord(ch)) / 1000.0 * 12 + tc for ch in s
        ) * (th_pct / 100.0)

    def cid_adv(s: str) -> float:
        return sum(
            _cid_width(charmap.setdefault(ch, 0x0100 + len(charmap)))
            / 1000.0
            * 12
            + tc
            for ch in s
        ) * (th_pct / 100.0)

    def kern_thr(space_w: int) -> float:
        # the metric word-break threshold in TJ-adjustment thousandths:
        # PDF_SPACE_GAP_FRAC·(space advance), with Th cancelling on both
        # sides and Tc folded back into thousandths-of-font-size
        return 0.5 * (space_w + tc * 1000.0 / 12.0)

    def word_kern(space_w: int) -> int:
        if metric:
            return -int(kern_thr(space_w) * rng.uniform(1.6, 3.0))
        return -rng.randint(160, 400)

    def glue_kern(space_w: int) -> int:
        if metric:
            return -max(1, int(kern_thr(space_w) * rng.uniform(0.05, 0.55)))
        return -rng.randint(5, 60)

    page_streams: list[bytes] = []
    page_texts: list[str] = []
    for _ in range(n_pages):
        n_lines = rng.randint(4, 10)
        col_x = [50.0, 320.0] if two_col else [50.0]
        cols: list[list[tuple[float, float, str]]] = [[] for _ in col_x]
        for c, x in enumerate(col_x):
            y = 720.0
            for _ in range(n_lines):
                line = _words(rng, rng.randint(3, 8))
                if rng.random() < 0.05:
                    line += " (note) \\slash"  # escape-handling edge case
                cols[c].append((x, y, line))
                y -= 16.0

        def show_op(line: str) -> bytes:
            spaces = [i for i, ch in enumerate(line) if ch == " "]
            if cid and rng.random() < 0.7:
                cid_sp = _cid_width(charmap[" "]) if metric else 0
                if spaces and rng.random() < 0.3:
                    # word-space kern (v9): the space is typeset as a
                    # wide TJ gap, not a glyph — extraction re-inserts
                    # it (oracle.PDF_WORD_KERN; metric-scaled on v16
                    # metric PDFs)
                    i = rng.choice(spaces)
                    kern = word_kern(cid_sp)
                    return (
                        f"/F2 12 Tf [<{cid_codes(line[:i])}> {kern} "
                        f"<{cid_codes(line[i + 1:])}>] TJ"
                    ).encode()
                # CID line: explicit Tf, 2-byte glyph codes; ~30% split
                # into a kerned TJ at a code boundary
                if len(line) > 2 and rng.random() < 0.3:
                    cut = rng.randint(1, len(line) - 1)
                    kern = glue_kern(cid_sp)
                    return (
                        f"/F2 12 Tf [<{cid_codes(line[:cut])}> {kern} "
                        f"<{cid_codes(line[cut:])}>] TJ"
                    ).encode()
                return f"/F2 12 Tf <{cid_codes(line)}> Tj".encode()
            prefix = "/F1 12 Tf " if cid else ""
            if spaces and rng.random() < 0.2:
                # word-space kern (v9), literal-string form
                i = rng.choice(spaces)
                kern = word_kern(PDF_F1_SPACE_W)
                return (
                    f"{prefix}[({_pdf_escape(line[:i])}) {kern} "
                    f"({_pdf_escape(line[i + 1:])})] TJ"
                ).encode()
            r = rng.random()
            if len(line) > 2 and r < 0.3:
                cut = rng.randint(1, len(line) - 1)
                kern = glue_kern(PDF_F1_SPACE_W)
                if rng.random() < 0.25:  # hex-string half inside TJ (v8)
                    return (
                        f"{prefix}[<{line[:cut].encode('utf-8').hex()}> "
                        f"{kern} ({_pdf_escape(line[cut:])})] TJ"
                    ).encode()
                return (
                    f"{prefix}[({_pdf_escape(line[:cut])}) {kern} "
                    f"({_pdf_escape(line[cut:])})] TJ"
                ).encode()
            if r < 0.45:  # hex-string operand (v8)
                return f"{prefix}<{line.encode('utf-8').hex()}> Tj".encode()
            if r < 0.55:  # octal escapes: \040 decodes back to space (v8)
                return (
                    prefix
                    + "("
                    + _pdf_escape(line).replace(" ", "\\040")
                    + ") Tj"
                ).encode()
            return f"{prefix}({_pdf_escape(line)}) Tj".encode()

        # v11: ~30% of pages typeset at a text-matrix SCALE (0.5 or 2 —
        # exact binary factors, so text-space deltas print exactly): Tm
        # carries the scale in a/d and every Td/TD delta is the DEVICE
        # delta divided by it, which only a full-matrix reader lands on
        # the right origins (a translation-only reader shears the page)
        scale = rng.choice((0.5, 2.0)) if rng.random() < 0.30 else 1.0
        word_pos = metric and rng.random() < 0.6
        ops: list[bytes] = [b"BT /F1 12 Tf"]
        if tc:
            ops.append(f"{tc:g} Tc".encode())
        if th_pct != 100:
            ops.append(f"{th_pct} Tz".encode())
        if word_pos:
            # v16 word-positioned typography: spaces exist ONLY as Td
            # gaps sized in multiples of the font's space advance; a
            # ~25% mid-word split continues at a sub-space gap — only
            # glyph-advance pen tracking can tell the two apart
            lx, ly = 0.0, 0.0
            first = True
            for i in range(n_lines):
                x, y, line = cols[0][i]
                line_cid = cid and rng.random() < 0.5
                if (first and scale != 1.0) or rng.random() < 0.5:
                    ops.append(
                        f"{scale:g} 0 0 {scale:g} {x:g} {y:g} Tm".encode()
                        if scale != 1.0
                        else f"1 0 0 1 {x:g} {y:g} Tm".encode()
                    )
                else:
                    ops.append(
                        f"{(x - lx) / scale:g} {(y - ly) / scale:g} Td".encode()
                    )
                lx, ly = x, y
                first = False
                adv = cid_adv if line_cid else f1_adv
                sp = (
                    (_cid_width(charmap[" "]) if line_cid else PDF_F1_SPACE_W)
                    / 1000.0
                    * 12
                    + tc
                ) * (th_pct / 100.0)
                font_prefix = (
                    ("/F2 12 Tf " if line_cid else "/F1 12 Tf ")
                    if cid
                    else ""
                )
                shown_first = False
                prev_adv = 0.0
                for word in line.split(" "):
                    pieces = [word]
                    if len(word) > 3 and rng.random() < 0.25:
                        cut = rng.randint(1, len(word) - 1)
                        pieces = [word[:cut], word[cut:]]
                    for pi, piece in enumerate(pieces):
                        pfx = ""
                        if shown_first:
                            gap = (
                                sp * rng.choice((1.0, 1.5, 2.5))
                                if pi == 0
                                else sp * rng.choice((0.0, 0.1, 0.3))
                            )
                            dx = round(prev_adv + gap, 4)
                            ops.append(f"{dx:.4f} 0 Td".encode())
                            lx += dx * scale
                        else:
                            pfx = font_prefix
                        if line_cid:
                            ops.append(
                                f"{pfx}<{cid_codes(piece)}> Tj".encode()
                            )
                        elif rng.random() < 0.35:
                            ops.append(
                                f"{pfx}<{piece.encode('utf-8').hex()}> "
                                f"Tj".encode()
                            )
                        else:
                            ops.append(
                                f"{pfx}({_pdf_escape(piece)}) Tj".encode()
                            )
                        prev_adv = adv(piece)
                        shown_first = True
        elif not two_col and rng.random() < 0.35:
            # TD-leading + ' chain: real single-column typography
            x0, y0, first = cols[0][0]
            if scale != 1.0:
                ops.append(f"{scale:g} 0 0 {scale:g} 0 0 Tm".encode())
            ops.append(f"{x0 / scale:g} {y0 / scale:g} Td".encode())
            ops.append(show_op(first))
            if n_lines > 1:
                ops.append(f"0 {-16 / scale:g} TD".encode())
                ops.append(show_op(cols[0][1][2]))
                # the ' chain shows literals: reset to the simple font in
                # case a CID show_op left /F2 active (Tf persists)
                chain_prefix = "/F1 12 Tf " if cid else ""
                for _x, _y, line in cols[0][2:]:
                    ops.append(
                        f"{chain_prefix}({_pdf_escape(line)}) '".encode()
                    )
        else:
            lx, ly = 0.0, 0.0
            first = True
            for i in range(n_lines):
                for c in range(len(col_x)):
                    x, y, line = cols[c][i]
                    # a Td before any Tm moves in IDENTITY space, so a
                    # scaled page must open with the Tm that sets a/d
                    if (first and scale != 1.0) or rng.random() < 0.5:
                        ops.append(
                            f"{scale:g} 0 0 {scale:g} {x:g} {y:g} Tm".encode()
                            if scale != 1.0
                            else f"1 0 0 1 {x:g} {y:g} Tm".encode()
                        )
                    else:
                        ops.append(
                            f"{(x - lx) / scale:g} {(y - ly) / scale:g} Td".encode()
                        )
                    lx, ly = x, y
                    first = False
                    ops.append(show_op(line))
        ops.append(b"ET")
        page_streams.append(b"\n".join(ops))
        page_texts.append(
            "\n".join("\n".join(t for _, _, t in col) for col in cols)
        )
    # v8 filter mix: ~30% raw streams, ~25% Flate, and the remaining
    # ~45% spread across LZW / ASCII85 / ASCIIHex / RunLength and the
    # [/ASCII85Decode /FlateDecode] chain — every standard filter is
    # load-bearing in the fixture corpus. ~40% of encoded streams carry
    # indirect /Length refs; half of ALL pdfs get a permuted physical
    # object layout (readable only through the xref + /Kids walk)
    stream_filter = rng.choices(
        [None, "flate", "lzw", "a85", "ahx", "rl", "a85+flate"],
        weights=[30, 25, 12, 9, 8, 8, 8],
    )[0]
    indirect = stream_filter is not None and rng.random() < 0.4
    permute = rng if rng.random() < 0.5 else None
    # ~25% emit the PDF 1.5 container (page tree in an ObjStm, binary
    # /XRef stream) — only the 1.5-aware walk reads those page-ordered;
    # half of those pack the xref rows with the PNG Up predictor
    objstm_mode = rng.random() < 0.25
    xref_pred = objstm_mode and rng.random() < 0.5
    cid_font = (
        ("F2", _tounicode_cmap(charmap, rng)) if cid and charmap else None
    )
    # v16: metric PDFs embed the width tables the generator typeset with
    f1_w = [_f1_width(c) for c in range(32, 127)] if metric else None
    cid_w = None
    if metric and cid_font is not None:
        maxc = max(charmap.values())
        hi = min(maxc, 0x010F)
        listed = " ".join(str(_cid_width(c)) for c in range(0x0100, hi + 1))
        parts = [f"{0x0100} [ {listed} ]"]
        if maxc >= 0x0110:  # both /W forms load-bearing past 16 chars
            parts.append(f"{0x0110} {maxc} 650")
        cid_w = (("[ " + " ".join(parts) + " ]").encode(), 650)
    payload = _build_pdf(
        page_streams,
        indirect_length=indirect,
        permute=permute,
        objstm=objstm_mode,
        stream_filter=stream_filter,
        xref_predictor=xref_pred,
        cid_font=cid_font,
        indirect_resources=cid_font is not None and rng.random() < 0.3,
        f1_widths=f1_w,
        widths_indirect=metric and rng.random() < 0.3,
        cid_widths=cid_w,
    )
    return payload, "\n\n".join(page_texts), n_pages


def _make_scanned_pdf(rng: random.Random) -> tuple[bytes, str, int]:
    """Scanned-document PDF (corpus v21): each page's content is a raster
    image XObject painted with ``q w 0 0 h tx ty cm /ImN Do Q`` — the
    text exists only as pixels, the reference's OCR scenario
    (src/parsers/ocr_parser.py:59-217 feeds page images to EasyOCR;
    src/ai_pipeline.py:343-388 renders PDF→image for the vision model).
    Lines render in the shared FONT5X7 glyph grid, and the sample data
    rotates over the encodings real scanners emit: 8-bit DeviceGray
    Flate, Flate + PNG Up predictor (/DecodeParms), /Decode [1 0]
    inverted gray, 1-bit DeviceGray stencils, DeviceRGB Flate, and
    /DCTDecode (a real JPEG body — baseline or progressive per
    render_jpeg's own mix). ~35% of pages put a real text operator
    header ABOVE the scan, so reading order must interleave typeset and
    classified text. The container reuses every _build_pdf feature
    (permuted object layout, PDF 1.5 ObjStm/XRef-stream, filtered
    content streams)."""
    from .oracle import GLYPH_H, _render_ink_pixels, render_jpeg

    n_pages = rng.randint(1, 2)
    page_streams: list[bytes] = []
    page_texts: list[str] = []
    images: dict[str, tuple[bytes, bytes]] = {}
    for pi in range(n_pages):
        n_lines = rng.randint(2, 5)
        lines = [
            _words(rng, rng.randint(2, 4)).upper() for _ in range(n_lines)
        ]
        variant = rng.choices(
            ("flate", "pred", "inv", "bits1", "rgb", "dct"),
            weights=(25, 15, 10, 15, 10, 25),
        )[0]
        name = f"Im{pi}"
        if variant == "dct":
            w = max(len(ln) for ln in lines) * 6
            h = len(lines) * GLYPH_H
            data = render_jpeg(lines)
            head = (
                f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
                f" /BitsPerComponent 8 /Filter /DCTDecode"
            )
        else:
            w, h, ink = _render_ink_pixels(lines)
            if variant == "bits1":
                stride = (w + 7) // 8
                raster = bytearray(b"\xff" * (stride * h))
                for x, y in ink:  # DeviceGray 1-bit: sample 0 = black
                    raster[y * stride + (x >> 3)] &= ~(1 << (7 - (x & 7)))
                data = zlib.compress(bytes(raster))
                head = (
                    f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
                    f" /BitsPerComponent 1 /Filter /FlateDecode"
                )
            elif variant == "rgb":
                buf = bytearray(b"\xff" * (3 * w * h))
                for x, y in ink:  # dark navy ink: luma 28, well under 128
                    o = 3 * (y * w + x)
                    buf[o], buf[o + 1], buf[o + 2] = 20, 20, 90
                data = zlib.compress(bytes(buf))
                head = (
                    f"/Width {w} /Height {h} /ColorSpace /DeviceRGB"
                    f" /BitsPerComponent 8 /Filter /FlateDecode"
                )
            else:
                bg, fg = (0, 255) if variant == "inv" else (255, 0)
                gray = bytearray(bytes([bg]) * (w * h))
                for x, y in ink:
                    gray[y * w + x] = fg
                if variant == "pred":
                    # PNG Up predictor over w-byte rows, tagged per row —
                    # the layout scanner drivers emit on image streams
                    pred = bytearray()
                    prev = bytes(w)
                    for r in range(0, len(gray), w):
                        row = bytes(gray[r : r + w])
                        pred.append(2)
                        pred += bytes(
                            (row[i] - prev[i]) & 0xFF for i in range(w)
                        )
                        prev = row
                    data = zlib.compress(bytes(pred))
                    parms = (
                        f" /DecodeParms << /Predictor 12 /Columns {w} >>"
                    )
                else:
                    data = zlib.compress(bytes(gray))
                    parms = ""
                decode = " /Decode [1 0]" if variant == "inv" else ""
                head = (
                    f"/Width {w} /Height {h} /ColorSpace /DeviceGray"
                    f" /BitsPerComponent 8 /Filter /FlateDecode"
                    f"{parms}{decode}"
                )
        images[name] = (head.encode(), data)
        scale = rng.choice((1.5, 2.0, 3.0))
        w_pt, h_pt = w * scale, h * scale
        tx = rng.choice((40.0, 60.0))
        ty = 720.0 - h_pt
        place = f"q {w_pt:g} 0 0 {h_pt:g} {tx:g} {ty:g} cm /{name} Do Q"
        header: str | None = None
        if rng.random() < 0.35:
            # mixed page: typeset header above the scan — classified
            # image lines must interleave below it in reading order
            header = _words(rng, rng.randint(2, 5))
            place = (
                f"BT /F1 12 Tf 1 0 0 1 {tx:g} 740 Tm "
                f"({_pdf_escape(header)}) Tj ET\n" + place
            )
        page_streams.append(place.encode())
        body = "\n".join(lines)
        page_texts.append(f"{header}\n{body}" if header else body)
    payload = _build_pdf(
        page_streams,
        stream_filter="flate" if rng.random() < 0.4 else None,
        permute=rng if rng.random() < 0.4 else None,
        objstm=rng.random() < 0.2,
        images=images,
    )
    return payload, "\n\n".join(page_texts), n_pages


# ---------------------------------------------------------------------------
# Plain-text pages
# ---------------------------------------------------------------------------


def _make_text(rng: random.Random) -> tuple[bytes, str, int]:
    n_lines = rng.randint(3, 12)
    lines = []
    for _ in range(n_lines):
        if rng.random() < 0.15:
            lines.append("")
        lines.append(_words(rng, rng.randint(4, 12)) + ("   " if rng.random() < 0.2 else ""))
    raw = "\n".join([""] * rng.randint(0, 2) + lines + [""] * rng.randint(0, 2))
    stripped = [ln.rstrip() for ln in lines]
    while stripped and not stripped[0]:
        stripped.pop(0)
    while stripped and not stripped[-1]:
        stripped.pop()
    expected = "\n".join(stripped)
    n_blocks = sum(1 for ln in stripped if ln)
    return raw.encode("utf-8"), expected, n_blocks


def _make_csv(rng: random.Random) -> tuple[bytes, str, int]:
    """Order-like CSV table (header + data rows). Expected text comes from
    the generator's own knowledge of the cells it wrote (cells stripped,
    joined ' | '), independent of oracle.extract_csv — keeping T1 a
    two-implementation check. ~10% of docs carry a latin-1 payload
    (accented client names) to exercise the encoding-fallback chain."""
    hdr = ["order_id", "client", "qty", "unit_price"]
    latin1 = rng.random() < 0.10
    clients = (
        ["café_imports", "résumé_gmbh", "añejo_trading"]
        if latin1
        else ["acme_corp", "globex", "initech", "umbrella"]
    )
    n_rows = rng.randint(2, 10)
    lines = [",".join(hdr)]
    exp = [" | ".join(hdr)]
    for _ in range(n_rows):
        cells = [
            f"ORD-{rng.randint(100, 999)}",
            rng.choice(clients),
            str(rng.randint(1, 40)),
            f"{rng.randint(1, 500)}.{rng.randint(0, 99):02d}",
        ]
        # messy spacing around cells; expected text is the stripped cells
        raw = ",".join(
            (" " + c + " ") if rng.random() < 0.3 else c for c in cells
        )
        lines.append(raw)
        exp.append(" | ".join(cells))
    sep = "\r\n" if rng.random() < 0.3 else "\n"
    doc = sep.join(lines) + (sep if rng.random() < 0.5 else "")
    enc = "latin-1" if latin1 else "utf-8"
    return doc.encode(enc), "\n".join(exp), n_rows


# ---------------------------------------------------------------------------
# Office containers (docx/xlsx as real PK zips) + binary images. The
# generator builds the member XML itself and computes expected text from its
# own knowledge of what it wrote — independent of oracle._docx_extract /
# _xlsx_extract, keeping T1 a two-implementation check.
# ---------------------------------------------------------------------------

_W_XMLNS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_X_XMLNS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _zip_bytes(members: list[tuple[str, str]]) -> bytes:
    """Deterministic zip: fixed timestamps, stored (no compression), fixed
    member order."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
    return buf.getvalue()


def _make_docx(rng: random.Random) -> tuple[bytes, str, int]:
    """Paragraphs (some split across runs, some empty) + 0-2 embedded
    tables. Expected text per the docx contract: paragraphs joined by \\n
    (leading/trailing empties trimmed), each table as ``a | b`` row lines,
    blocks joined by a blank line."""
    k = rng.randint(1, 5)
    lines = [_words(rng, rng.randint(5, 25)) for _ in range(k)]
    if len(lines) >= 2 and rng.random() < 0.3:
        lines.insert(rng.randint(1, len(lines) - 1), "")  # interior blank kept
    xml_lines = [""] * rng.randint(0, 1) + lines + [""] * rng.randint(0, 1)

    def p_xml(t: str) -> str:
        if not t:
            return "<w:p/>"
        if rng.random() < 0.4 and " " in t:
            i = t.index(" ")
            return (
                f'<w:p><w:r><w:t xml:space="preserve">{t[: i + 1]}</w:t></w:r>'
                f"<w:r><w:t>{t[i + 1 :]}</w:t></w:r></w:p>"
            )
        return f"<w:p><w:r><w:t>{t}</w:t></w:r></w:p>"

    tables = [
        [
            [_words(rng, rng.randint(1, 3)) for _ in range(rng.randint(2, 4))]
            for _ in range(rng.randint(1, 4))
        ]
        for _ in range(rng.randint(0, 2))
    ]
    tbl_xml = "".join(
        "<w:tbl>"
        + "".join(
            "<w:tr>"
            + "".join(
                f"<w:tc><w:p><w:r><w:t>{c}</w:t></w:r></w:p></w:tc>"
                for c in row
            )
            + "</w:tr>"
            for row in rows
        )
        + "</w:tbl>"
        for rows in tables
    )
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_XMLNS}"><w:body>'
        + "".join(p_xml(t) for t in xml_lines)
        + tbl_xml
        + "</w:body></w:document>"
    )
    payload = _zip_bytes(
        [
            ("[Content_Types].xml", "<Types/>"),
            ("word/document.xml", doc),
        ]
    )
    para_block = "\n".join(lines)
    table_blocks = [
        "\n".join(" | ".join(row) for row in rows) for rows in tables
    ]
    expected = "\n\n".join([para_block] + table_blocks)
    n_blocks = sum(1 for ln in lines if ln) + sum(len(rows) for rows in tables)
    return payload, expected, n_blocks


_SHEET_NAMES = ["Order_Info", "Line_Items", "Notes"]


def _make_xlsx(rng: random.Random) -> tuple[bytes, str, int]:
    """1-3 sheets of shared-string / numeric / inline-string cells. Expected
    text per the xlsx contract: ``## <sheet>`` header + one ``a | b`` line
    per row, sheets joined by a blank line."""
    names = _SHEET_NAMES[: rng.randint(1, 3)]
    shared: list[str] = []
    shared_idx: dict[str, int] = {}
    sheet_xmls: list[str] = []
    exp_blocks: list[str] = []
    n_rows_total = 0
    for name in names:
        n_rows, n_cols = rng.randint(2, 6), rng.randint(2, 4)
        row_xmls, exp_lines = [], [f"## {name}"]
        for ri in range(n_rows):
            cell_xmls, exp_cells = [], []
            for _ in range(n_cols):
                r = rng.random()
                if r < 0.55:
                    s = _words(rng, rng.randint(1, 3))
                    if s not in shared_idx:
                        shared_idx[s] = len(shared)
                        shared.append(s)
                    cell_xmls.append(
                        f'<c t="s"><v>{shared_idx[s]}</v></c>'
                    )
                    exp_cells.append(s)
                elif r < 0.85:
                    v = (
                        str(rng.randint(0, 99999))
                        if rng.random() < 0.5
                        else f"{rng.randint(0, 9999)}.{rng.randint(0, 99):02d}"
                    )
                    cell_xmls.append(f"<c><v>{v}</v></c>")
                    exp_cells.append(v)
                else:
                    s = rng.choice(_VOCAB)
                    cell_xmls.append(
                        f'<c t="inlineStr"><is><t>{s}</t></is></c>'
                    )
                    exp_cells.append(s)
            row_xmls.append(f'<row r="{ri + 1}">' + "".join(cell_xmls) + "</row>")
            exp_lines.append(" | ".join(exp_cells))
            n_rows_total += 1
        sheet_xmls.append(
            f'<worksheet xmlns="{_X_XMLNS}"><sheetData>'
            + "".join(row_xmls)
            + "</sheetData></worksheet>"
        )
        exp_blocks.append("\n".join(exp_lines))
    # ~half the workbooks route sheets through workbook.xml.rels with
    # NON-positional member numbering (what real Excel output looks like
    # after a sheet delete/reorder) — the parser must resolve via r:id,
    # not member position; the rest are rels-less minimal containers
    # exercising the positional fallback.
    use_rels = rng.random() < 0.5
    offset = rng.randint(1, 3) if use_rels else 0
    member_names = [
        f"xl/worksheets/sheet{i + 1 + offset}.xml"
        for i in range(len(sheet_xmls))
    ]
    r_xmlns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheet_tags = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}"'
        + (f' r:id="rId{i + 1}"' if use_rels else "")
        + "/>"
        for i, n in enumerate(names)
    )
    members = [
        (
            "xl/workbook.xml",
            f'<workbook xmlns="{_X_XMLNS}" xmlns:r="{r_xmlns}"><sheets>'
            + sheet_tags
            + "</sheets></workbook>",
        ),
        (
            "xl/sharedStrings.xml",
            f'<sst xmlns="{_X_XMLNS}">'
            + "".join(f"<si><t>{s}</t></si>" for s in shared)
            + "</sst>",
        ),
    ]
    if use_rels:
        members.append(
            (
                "xl/_rels/workbook.xml.rels",
                '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                + "".join(
                    f'<Relationship Id="rId{i + 1}" Type="{r_xmlns}/worksheet" '
                    f'Target="worksheets/sheet{i + 1 + offset}.xml"/>'
                    for i in range(len(sheet_xmls))
                )
                + "</Relationships>",
            )
        )
    members += list(zip(member_names, sheet_xmls))
    return _zip_bytes(members), "\n\n".join(exp_blocks), n_rows_total


_IMAGE_MAGICS = [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0", b"GIF89a"]


def _make_image(rng: random.Random) -> tuple[bytes, str, int]:
    """Opaque binary image payload: magic + noise. The real decoders
    reject the garbage bodies, so these are error rows (expected text
    empty) — the corpus's corrupt-image slice."""
    magic = rng.choice(_IMAGE_MAGICS)
    body = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
    return magic + body, "", 0


def _make_pbm(rng: random.Random) -> tuple[bytes, str, int]:
    """Readable image: text rendered into a binary P4 bitmap with the
    shared FONT5X7 contract (oracle.render_pbm does the rendering; the
    EXPECTED text is the generator's own line list, so the decode side is
    still independently checked)."""
    from .oracle import render_pbm

    n_lines = rng.randint(1, 3)
    lines = [
        _words(rng, rng.randint(2, 5)).upper() for _ in range(n_lines)
    ]
    return render_pbm(lines), "\n".join(lines), n_lines


def _make_png(rng: random.Random) -> tuple[bytes, str, int]:
    """Readable REAL PNG (v4, color since v10): text rendered into an
    8-bit PNG whose scanlines cycle through a random mix of the five PNG
    filter types, so every unfilter path (None/Sub/Up/Average/Paeth) is
    exercised by corpus payloads any standard reader also decodes.
    ~55% of files carry a color layout — truecolor (2), palette (3),
    gray+alpha (4) or RGBA (6), the alpha ones with TRANSPARENT
    backgrounds that only real compositing reads as paper. Expected text
    is the generator's own line list (decode side stays independently
    checked, as with PBM)."""
    from .oracle import render_png

    n_lines = rng.randint(1, 3)
    lines = [
        _words(rng, rng.randint(2, 5)).upper() for _ in range(n_lines)
    ]
    fts = [rng.randint(0, 4) for _ in range(rng.randint(1, 6))]
    r = rng.random()
    if r < 0.45:
        ct = 0
    elif r < 0.60:
        ct = 2
    elif r < 0.75:
        ct = 3
    elif r < 0.87:
        ct = 4
    else:
        ct = 6
    # v13: ~25% Adam7-interlaced, ~15% 16-bit (palette stays 8-bit per
    # spec); v14: ~15% sub-byte (1/2/4-bit, gray/palette only) —
    # independently of the color-type draw
    interlace = rng.random() < 0.25
    rd = rng.random()
    if rd < 0.12:
        # tRNS transparency (v15): dark paper keyed/zero-alpha
        # transparent — only compositing over white reads the page
        ct = rng.choice((0, 2, 3))
        payload = render_png(
            lines, fts, color_type=ct, interlace=interlace, keyed=True
        )
        return payload, "\n".join(lines), n_lines
    if rd < 0.27 and ct != 3:
        depth = 16
    elif rd < 0.42:
        depth = rng.choice((1, 1, 2, 4))
        if ct not in (0, 3):
            ct = rng.choice((0, 3))  # sub-byte is gray/palette-only
    else:
        depth = 8
    payload = render_png(
        lines, fts, color_type=ct, interlace=interlace, depth=depth
    )
    return payload, "\n".join(lines), n_lines


def _make_gif(rng: random.Random) -> tuple[bytes, str, int]:
    """Readable REAL GIF (v5): text rendered into a 2-color GIF89a with
    real LZW, randomly interlaced and randomly carrying a Graphic Control
    Extension, so the decoder's pass-reorder and extension-skip paths are
    exercised by corpus payloads any standard reader also decodes.
    Expected text is the generator's own line list (decode side stays
    independently checked, as with PBM/PNG)."""
    from .oracle import render_gif

    n_lines = rng.randint(1, 3)
    lines = [
        _words(rng, rng.randint(2, 5)).upper() for _ in range(n_lines)
    ]
    payload = render_gif(
        lines,
        interlace=rng.random() < 0.5,
        with_extension=rng.random() < 0.5,
    )
    return payload, "\n".join(lines), n_lines


def _make_jpeg(rng: random.Random) -> tuple[bytes, str, int]:
    """Readable REAL JPEG (v6; color v10; progressive v12): text
    rendered into a JPEG (quant=1, Annex-K Huffman tables) — payloads
    any standard JPEG reader also decodes. ~30% are PROGRESSIVE (SOF2
    successive-approximation scan script — DC first/refine + per-band
    AC first/refine — the large-web-JPEG shape), half of those color;
    ~42% baseline 3-component YCbCr (sampling 4:4:4 / 4:2:2 / 4:2:0,
    chroma carrying a real checker tint on the Annex-K chroma tables,
    ~half with a DRI restart interval + RST0-7 markers); the rest
    baseline grayscale. Expected text is the generator's own line list
    (decode side stays independently checked, as with PBM/PNG/GIF)."""
    from .oracle import render_jpeg

    n_lines = rng.randint(1, 3)
    lines = [
        _words(rng, rng.randint(2, 5)).upper() for _ in range(n_lines)
    ]
    r = rng.random()
    if r < 0.30:
        # progressive (v12): SOF2 successive-approximation script,
        # half grayscale / half color — the large-web-JPEG shape
        hv = rng.choice(((1, 1), (2, 1), (2, 2)))
        payload = render_jpeg(
            lines, color=rng.random() < 0.5, hv=hv, progressive=True
        )
    elif r < 0.72:
        hv = rng.choice(((1, 1), (2, 1), (2, 2)))
        restart = rng.choice((0, 0, 1, 2, 4))
        payload = render_jpeg(lines, color=True, hv=hv, restart_mcus=restart)
    else:
        payload = render_jpeg(lines)
    return payload, "\n".join(lines), n_lines


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

_EPOCH = datetime(2026, 7, 1, tzinfo=timezone.utc)


def _host(rng: random.Random) -> str:
    # Zipf-like: host0 owns ~30% of urls
    if rng.random() < 0.30:
        return "host0"
    return f"host{rng.randint(1, 49)}"


def gen_rows(n: int, seed: int = 42) -> list[PageRow]:
    rng = random.Random(seed)
    rows: list[PageRow] = []
    for i in range(n):
        r = rng.random()
        oversized = False
        if r < 0.03:
            kind = "null"
        elif r < 0.05:
            kind, oversized = "html", True
        elif r < 0.65:
            kind = "html"
        elif r < 0.78:
            kind = "pdf"
        elif r < 0.83:
            kind = "text"
        elif r < 0.86:
            kind = "csv"
        elif r < 0.91:
            kind = "docx"
        elif r < 0.96:
            kind = "xlsx"
        elif r < 0.972:
            kind = "pbm"
        elif r < 0.980:
            kind = "png"
        elif r < 0.988:
            kind = "gif"
        elif r < 0.995:
            kind = "jpeg"
        else:
            kind = "image"

        if kind == "null":
            payload: bytes | None = None if rng.random() < 0.5 else b""
            expected, n_blocks, fmt = b"", 0, "unknown"
            noisy = ""
        elif kind == "html":
            r_cs = rng.random() if not oversized else 1.0
            if r_cs < 0.10:
                # v17 declared-charset page (meta prescan / BOM sniff)
                payload, exp_s, n_blocks = _make_charset_html(rng)
                noisy = exp_s  # raw bytes aren't utf-8; noisy = content
            elif r_cs < 0.14:
                # v19 UNDECLARED legacy page (statistical detection only)
                payload, exp_s, n_blocks = _make_charset_html(
                    rng, declared=False
                )
                noisy = exp_s
            else:
                payload, exp_s, n_blocks = _make_html(rng, oversized)
                noisy = payload.decode("utf-8")
            expected, fmt = exp_s.encode("utf-8"), "html"
        elif kind == "pdf":
            if rng.random() < 0.22:  # v21: scanned (raster-XObject) docs
                payload, exp_s, n_blocks = _make_scanned_pdf(rng)
            else:
                payload, exp_s, n_blocks = _make_pdf(rng)
            expected, fmt = exp_s.encode("utf-8"), "pdf"
            noisy = exp_s
        elif kind == "docx":
            payload, exp_s, n_blocks = _make_docx(rng)
            expected, fmt = exp_s.encode("utf-8"), "zip"
            noisy = exp_s
        elif kind == "xlsx":
            payload, exp_s, n_blocks = _make_xlsx(rng)
            expected, fmt = exp_s.encode("utf-8"), "zip"
            noisy = exp_s
        elif kind == "csv":
            payload, exp_s, n_blocks = _make_csv(rng)
            expected, fmt = exp_s.encode("utf-8"), "csv"
            noisy = payload.decode("latin-1")  # total; payload may be latin-1
        elif kind == "pbm":
            payload, exp_s, n_blocks = _make_pbm(rng)
            expected, fmt = exp_s.encode("utf-8"), "pbm"
            noisy = exp_s
        elif kind == "png":
            payload, exp_s, n_blocks = _make_png(rng)
            expected, fmt = exp_s.encode("utf-8"), "image"
            noisy = exp_s
        elif kind == "gif":
            payload, exp_s, n_blocks = _make_gif(rng)
            expected, fmt = exp_s.encode("utf-8"), "image"
            noisy = exp_s
        elif kind == "jpeg":
            payload, exp_s, n_blocks = _make_jpeg(rng)
            expected, fmt = exp_s.encode("utf-8"), "image"
            noisy = exp_s
        elif kind == "image":
            payload, exp_s, n_blocks = _make_image(rng)
            expected, fmt = b"", "image"
            noisy = ""
        else:
            payload, exp_s, n_blocks = _make_text(rng)
            expected, fmt = exp_s.encode("utf-8"), "text"
            noisy = payload.decode("utf-8")

        ts = _EPOCH + timedelta(
            days=rng.randint(0, 4), seconds=rng.randint(0, 86399)
        )
        rows.append(
            PageRow(
                url=f"https://{_host(rng)}.example/p{i}",
                warc_ts=ts,
                html=payload,
                text=noisy,
                lang=rng.choice(_LANGS),
                format=fmt,
                text_expected=expected,
                n_blocks=n_blocks,
            )
        )
    return rows


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EXPECTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("format", pa.string()),
        ("text_expected", pa.binary()),
        ("n_blocks", pa.int32()),
        ("checksum", pa.int64()),
    ]
)


def write_corpus(out_dir: str, n: int, seed: int = 42) -> list[PageRow]:
    """Write pages.parquet + expected.parquet into ``out_dir``."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = gen_rows(n, seed)
    pages = pa.Table.from_pydict(
        {
            "url": [r.url for r in rows],
            "warc_ts": [r.warc_ts for r in rows],
            "html": [r.html for r in rows],
            "text": [r.text for r in rows],
            "lang": [r.lang for r in rows],
        },
        schema=PAGES_SCHEMA,
    )
    expected = pa.Table.from_pydict(
        {
            "url": [r.url for r in rows],
            "format": [r.format for r in rows],
            "text_expected": [r.text_expected for r in rows],
            "n_blocks": [r.n_blocks for r in rows],
            "checksum": [zlib.crc32(r.text_expected) for r in rows],
        },
        schema=EXPECTED_SCHEMA,
    )
    # Small row groups keep the file SPLITTABLE: Spark parallelizes a parquet
    # scan only at row-group boundaries, and a single multi-GB row group
    # serializes the whole scan onto one task (a real crawl table is many
    # ~100 MB files; this mirrors that in one file).
    pq.write_table(
        pages, os.path.join(out_dir, "pages.parquet"), row_group_size=1000
    )
    pq.write_table(expected, os.path.join(out_dir, "expected.parquet"))
    return rows


# -- WARC container serialization (Common-Crawl ingestion format) ----------

_WARC_SOFTWARE = "mfde-corpus/1.0"


def _warc_record(row: PageRow) -> bytes:
    """One WARC/1.0 response record for a crawled page. Deterministic:
    the record id derives from the url (no uuid4), the date from warc_ts.
    The page language rides in an ``X-Crawl-Lang`` HTTP header purely so
    the reader can reconstruct the full pages schema in tests — real
    Common Crawl carries no such header, and ``read_warc`` defaults it
    to 'und' when absent."""
    import hashlib

    payload = row.html or b""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: application/octet-stream\r\n"
        + f"X-Crawl-Lang: {row.lang}\r\n".encode("ascii")
        + f"Content-Length: {len(payload)}\r\n\r\n".encode("ascii")
        + payload
    )
    rid = hashlib.md5(row.url.encode("utf-8")).hexdigest()
    date = row.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:md5:{rid}>\r\n".encode("ascii")
        + f"WARC-Target-URI: {row.url}\r\n".encode("ascii")
        + f"WARC-Date: {date}\r\n".encode("ascii")
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode("ascii")
    )
    return head + http + b"\r\n\r\n"


def write_warc(
    out_dir: str,
    n: int,
    seed: int = 42,
    shard_docs: int = 100,
    gzip_records: bool = False,
) -> list[PageRow]:
    """Serialize the deterministic corpus as WARC shards — the actual
    Common-Crawl container — so ingestion can be tested end-to-end from
    the crawl format, not just from parquet. One file per ``shard_docs``
    rows (files are the parallelism unit, as with CC's ~1 GB shards);
    ``gzip_records=True`` writes ``.warc.gz`` with each record its own
    gzip member (the real CC layout — per-record members are what make a
    shard splittable by record without decompressing the whole file).
    Null-payload rows (the no-response error path) are NOT written: a
    crawler that got no response writes no response record. Returns the
    full row list (including the skipped ones) for callers to join
    against."""
    import gzip as _gzip
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = gen_rows(n, seed)
    written = [r for r in rows if r.html is not None]
    ext = "warc.gz" if gzip_records else "warc"
    for s in range(0, len(written), shard_docs):
        shard = written[s : s + shard_docs]
        blob = b""
        for r in shard:
            rec = _warc_record(r)
            if gzip_records:
                # mtime=0: deterministic bytes run-over-run
                rec = _gzip.compress(rec, mtime=0)
            blob += rec
        path = os.path.join(out_dir, f"crawl-{s // shard_docs:05d}.{ext}")
        with open(path, "wb") as f:
            f.write(blob)
    return rows
