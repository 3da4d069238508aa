"""Per-format single-thread extraction cost (the BENCH.md table).

Generates the deterministic corpus at a fixed (n, seed), times
``oracle.extract`` per row single-threaded, and prints ms/doc + ms/MB per
format — the measurement behind ``extract_pages_routed``'s HEAVY_FORMATS
split (operators/extract.py). Run: ``python scripts/format_cost.py``.
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multi_format_document_extractor_spark import corpus, oracle  # noqa: E402

N, SEED = 6000, 123


def main() -> None:
    rows = corpus.gen_rows(N, SEED)
    # warm-up so interpreter/alloc effects don't land on the first format
    for r in rows[:100]:
        oracle.extract(r.html)
    t_ns: dict[str, int] = defaultdict(int)
    n_docs: dict[str, int] = defaultdict(int)
    n_bytes: dict[str, int] = defaultdict(int)
    for r in rows:
        t0 = time.perf_counter_ns()
        e = oracle.extract(r.html)
        t_ns[e.format] += time.perf_counter_ns() - t0
        n_docs[e.format] += 1
        n_bytes[e.format] += len(r.html or b"")
    base = None
    print(f"corpus v{corpus.CORPUS_VERSION} (n={N}, seed={SEED})")
    print("| format | docs | MB    | ms/doc | ms/MB  | vs html |")
    print("|--------|-----:|------:|-------:|-------:|--------:|")
    ordered = sorted(
        (f for f in t_ns if n_bytes[f]),
        key=lambda f: t_ns[f] / n_bytes[f],
    )
    base = next(
        t_ns[f] / n_bytes[f] for f in ordered if f == "html"
    )
    for f in ordered:
        ms_doc = t_ns[f] / n_docs[f] / 1e6
        ms_mb = t_ns[f] / n_bytes[f] / 1e6 * 1048576
        rel = (t_ns[f] / n_bytes[f]) / base
        print(
            f"| {f:<6} | {n_docs[f]:>4} | {n_bytes[f] / 1048576:>5.2f} "
            f"| {ms_doc:>6.3f} | {ms_mb:>6.1f} | {rel:>6.1f}x |"
        )


if __name__ == "__main__":
    main()
