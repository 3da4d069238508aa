"""Routed-vs-split extraction cost/benefit by input LAYOUT (the BENCH.md
§"Per-format compute cost" table). Times the two physical plans over the
same 60k-doc corpus written two ways — corpus order (uniform) and sorted
by sniffed format (the adversarial layout where byte-range scan splits
become solid runs of heavy-format bytes) — local[8], noop sink,
best-of-3 per cell, cells interleaved so host-window drift hits all four
evenly. Run: ``python scripts/layout_bench.py``.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DOCS, SEED, CORES, REPS = 60_000, 42, 8, 3


def main() -> None:
    from pyspark.sql import functions as F

    from multi_format_document_extractor_spark.corpus import (
        CORPUS_VERSION,
        write_corpus,
    )
    from multi_format_document_extractor_spark.operators.extract import (
        HEAVY_FORMATS,
        extract_pages,
        extract_pages_routed,
    )
    from multi_format_document_extractor_spark.session import get_spark
    from multi_format_document_extractor_spark.sources.pages import (
        format_col,
        read_pages,
    )

    base = os.path.join(
        tempfile.gettempdir(),
        f"mfde_bench_corpus_v{CORPUS_VERSION}_{N_DOCS}_{SEED}",
    )
    if not os.path.exists(os.path.join(base, "pages.parquet")):
        write_corpus(base, N_DOCS, SEED)
    spark = get_spark("layout-bench", cores=str(CORES))
    spark.sparkContext.setLogLevel("ERROR")

    clustered = os.path.join(base, "pages_by_format.parquet")
    if not os.path.exists(clustered):
        (
            read_pages(spark, os.path.join(base, "pages.parquet"))
            .orderBy(format_col(F.col("html")), "url")
            .coalesce(4)
            .write.parquet(clustered)
        )

    def cell(layout: str, plan: str):
        pages = read_pages(
            spark,
            os.path.join(
                base,
                "pages.parquet" if layout == "uniform" else clustered,
            ),
        )
        fn = extract_pages if plan == "split" else extract_pages_routed
        return lambda: fn(pages).write.format("noop").mode(
            "overwrite"
        ).save()

    cells = {
        (layout, plan): cell(layout, plan)
        for layout in ("uniform", "clustered")
        for plan in ("split", "routed")
    }
    # warm-up: one pass of each so JVM/Python pool costs don't land on rep 1
    for run in cells.values():
        run()
    best: dict[tuple[str, str], float] = {k: float("inf") for k in cells}
    for _ in range(REPS):  # interleaved best-per-cell (CLAUDE.md protocol)
        for k, run in cells.items():
            t0 = time.time()
            run()
            best[k] = min(best[k], time.time() - t0)

    print(
        f"corpus v{CORPUS_VERSION} ({N_DOCS} docs, local[{CORES}], "
        f"noop sink, best-of-{REPS} interleaved; "
        f"HEAVY_FORMATS={HEAVY_FORMATS})"
    )
    print("| layout | split plan | routed plan |")
    print("|--------|-----------:|------------:|")
    for layout in ("uniform", "clustered"):
        s = best[(layout, "split")]
        r = best[(layout, "routed")]
        print(f"| {layout} | {s:.2f} s | {r:.2f} s |")


if __name__ == "__main__":
    main()
