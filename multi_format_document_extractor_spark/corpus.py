"""Deterministic Common-Crawl-style page corpus generator (SURVEY.md §7 M0).

Generates the ``pages`` input table of BASELINE.json's input_hint shape
``(url, warc_ts, html BINARY, text, lang)`` plus the golden ``expected``
table (url, format, text_expected BINARY, n_blocks, checksum). The generator
*constructs* the main content, so expected bytes come from its own knowledge
— not from running the oracle — which makes the byte-identical pytest (T1)
a real two-implementation check.

Row mix per FIXTURES.md §1: ~70% HTML, ~15% PDF, ~10% plain text, ~3%
empty/null payload (error path), ~2% oversized (≥1 MB, skew path). Host
distribution is Zipf-like (host0 ≈ 30% of urls) to exercise salting (T4).
All randomness flows from one seed.
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

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
# PDF pages (constrained subset co-designed with oracle.extract_pdf)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _build_pdf(page_streams: list[bytes]) -> bytes:
    """Assemble a minimal multi-page PDF with uncompressed content streams."""
    n = len(page_streams)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    for i, stream in enumerate(page_streams):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 "
                f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >>"
            ).encode()
        )
        objs.append(
            b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
            + stream
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _make_pdf(rng: random.Random) -> tuple[bytes, str, int]:
    """1- or 2-column layout, 1-2 pages; text ops are emitted interleaved
    across columns so reading-order reconstruction is actually exercised."""
    n_pages = rng.randint(1, 2)
    two_col = rng.random() < 0.5
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
        # interleave ops across columns (round-robin) — stream order is NOT
        # reading order
        ops: list[bytes] = [b"BT /F1 12 Tf"]
        for i in range(n_lines):
            for c in range(len(col_x)):
                x, y, line = cols[c][i]
                ops.append(f"{x:g} {y:g} Td ({_pdf_escape(line)}) Tj".encode())
        ops.append(b"ET")
        page_streams.append(b"\n".join(ops))
        page_texts.append(
            "\n".join("\n".join(t for _, _, t in col) for col in cols)
        )
    payload = _build_pdf(page_streams)
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
        elif r < 0.75:
            kind = "html"
        elif r < 0.90:
            kind = "pdf"
        else:
            kind = "text"

        if kind == "null":
            payload: bytes | None = None if rng.random() < 0.5 else b""
            expected, n_blocks, fmt = b"", 0, "unknown"
            noisy = ""
        elif kind == "html":
            payload, exp_s, n_blocks = _make_html(rng, oversized)
            expected, fmt = exp_s.encode("utf-8"), "html"
            noisy = payload.decode("utf-8")
        elif kind == "pdf":
            payload, exp_s, n_blocks = _make_pdf(rng)
            expected, fmt = exp_s.encode("utf-8"), "pdf"
            noisy = exp_s
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
