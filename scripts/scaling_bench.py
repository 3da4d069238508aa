#!/usr/bin/env python
"""Two-cluster-size scaling benchmark (north rule evidence).

The rule demands ≥0.8 throughput scaling efficiency from N to 4N executors.
No real cluster exists in this sandbox, so the same extraction job runs at
two parallelism levels — local[4] and local[16] — on the SAME input corpus,
each in a fresh JVM/process, and efficiency = (thr_4N / thr_N) / 4.

N=4 vs 4N=16 (not 8 vs 32) because the host has exactly 32 hardware cores:
local[32] pins 32 JVM task threads PLUS 32 Python UDF workers plus GC and
shuffle threads onto 32 cores, so a 32-level measurement conflates job
scaling with machine oversubscription — a real 4N-executor cluster adds
hardware. At 4/16 both levels run with headroom and measure the job.

Per-level protocol: spawn a subprocess, build the session at local[N], warm
every Python worker (spawn + package import are one-time per-executor costs,
amortized to noise in any long job), then time the full extraction twice:
the default split-balanced plan (zero shuffle — production path) and the
salted-repartition plan (full-payload shuffle — the skew-adversarial path).
Results go to BENCH.md.

Usage:
    python scripts/scaling_bench.py              # parent: run both, report
    python scripts/scaling_bench.py --child N    # one level, print JSON
"""

from __future__ import annotations

import json
import re
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "120000"))
SEED = 42
LEVELS = (4, 16)
REPEATS = 2  # timed runs per child; best (min wall) reported
ROUNDS = 2  # parent alternates N/4N children this many times: the microVM
# host shows multi-minute neighbor-contention windows, so running each
# level in ONE contiguous block lets a single window poison one level and
# fake a scaling cliff (observed: same code, split efficiency 0.86 vs 0.47
# on different afternoons). Interleaving makes both levels sample the same
# host conditions; best-per-level across rounds is the steady state.


def _corpus(n: int, seed: int) -> str:
    import tempfile

    from multi_format_document_extractor_spark.corpus import (
        CORPUS_VERSION,
        write_corpus,
    )

    d = os.path.join(
        tempfile.gettempdir(), f"mfde_bench_corpus_v{CORPUS_VERSION}_{n}_{seed}"
    )
    if not os.path.exists(os.path.join(d, "pages.parquet")):
        write_corpus(d, n, seed)
    return d


def child(cores: int) -> None:
    from multi_format_document_extractor_spark.operators.extract import (
        extract_pages,
        extract_pages_routed,
    )
    from multi_format_document_extractor_spark.session import get_spark
    from multi_format_document_extractor_spark.sources.pages import read_pages

    corpus_dir = _corpus(N_DOCS, SEED)
    spark = get_spark(f"scale-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    pages = read_pages(spark, corpus_dir + "/pages.parquet")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm every worker: wide UDF stage over all cores.
    run(extract_pages(pages.limit(32 * cores), salt_partitions=cores * 2))

    # Three plans: split (zero shuffle), routed (heavy-format slice only
    # takes the salt shuffle — the robust default since corpus v6 made
    # image/PDF decode ~100x per-byte), salted (everything shuffles).
    plans = (
        ("split", lambda: extract_pages(pages)),
        ("routed", lambda: extract_pages_routed(pages, salt_partitions=cores * 4)),
        ("salted", lambda: extract_pages(pages, salt_partitions=cores * 4)),
    )
    result = {"cores": cores, "docs": N_DOCS}
    for label, plan in plans:
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.time()
            run(plan())
            best = min(best, time.time() - t0)
        result[f"wall_sec_{label}"] = round(best, 3)
        result[f"docs_per_sec_{label}"] = round(N_DOCS / best, 1)
    print(json.dumps(result))
    spark.stop()


def parent() -> None:
    _corpus(N_DOCS, SEED)  # generate once, outside all children
    results = {}
    for rnd in range(ROUNDS):
        for cores in LEVELS:
            out = subprocess.run(
                [sys.executable, __file__, "--child", str(cores)],
                capture_output=True,
                text=True,
                cwd=str(REPO),
                check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            res = json.loads(line)
            prev = results.get(cores)
            if prev is None:
                results[cores] = res
            else:  # best-per-level across rounds
                for label in ("split", "routed", "salted"):
                    if res[f"wall_sec_{label}"] < prev[f"wall_sec_{label}"]:
                        prev[f"wall_sec_{label}"] = res[f"wall_sec_{label}"]
                        prev[f"docs_per_sec_{label}"] = res[
                            f"docs_per_sec_{label}"
                        ]
            print(f"round {rnd}: {line}")

    n, n4 = LEVELS
    effs = {}
    for label in ("split", "routed", "salted"):
        thr_n = results[n][f"docs_per_sec_{label}"]
        thr_4n = results[n4][f"docs_per_sec_{label}"]
        effs[label] = round((thr_4n / thr_n) / (n4 / n), 3)
    summary = {
        "metric": "scaling_efficiency_Nx4N",
        "value": effs["split"],
        "unit": "ratio",
        "efficiency": effs,
        "levels": results,
        "docs": N_DOCS,
    }
    print(json.dumps(summary))

    rows = "\n".join(
        f"| local[{c}] ({t}) | {results[c]['wall_sec_split']} | "
        f"{results[c]['docs_per_sec_split']} | "
        f"{results[c]['wall_sec_routed']} | "
        f"{results[c]['docs_per_sec_routed']} | "
        f"{results[c]['wall_sec_salted']} | "
        f"{results[c]['docs_per_sec_salted']} |"
        for c, t in ((n, "N"), (n4, "4N"))
    )
    bench_md = REPO / "BENCH.md"
    # Replace ONLY the marker-delimited measured block; BENCH.md carries
    # hand-written history/analysis sections that a full rewrite would
    # clobber (it did once — see CLAUDE.md "Benchmarking on this box").
    from multi_format_document_extractor_spark.corpus import CORPUS_VERSION

    block = f"""<!-- scaling:begin -->
Latest run: corpus v{CORPUS_VERSION}, {N_DOCS:,} pages, {ROUNDS} rounds x {REPEATS} timed runs,
best per level.

| parallelism | split wall (s) | split docs/sec | routed wall (s) | routed docs/sec | salted wall (s) | salted docs/sec |
|---|---|---|---|---|---|---|
{rows}

**Scaling efficiency (N \u2192 4N) = (thr_4N / thr_N) / 4:
split = {effs["split"]:.3f}, routed = {effs["routed"]:.3f},
salted = {effs["salted"]:.3f}** (north-rule target \u2265 0.8).
<!-- scaling:end -->"""
    old = bench_md.read_text()
    pat = re.compile(r"<!-- scaling:begin -->.*?<!-- scaling:end -->", re.S)
    if pat.search(old):
        bench_md.write_text(pat.sub(lambda _m: block, old, count=1))
    else:
        bench_md.write_text(old.rstrip() + "\n\n" + block + "\n")
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        parent()
