#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per driver instruction the
N vs 4N executor criterion is evidenced by running the IDENTICAL job at
local[8] and local[32] on the same staged input and reporting
throughput at both plus efficiency eff = (thr_32 / thr_8) / 4.

Usage:
    python scripts/scaling_bench.py [--docs 50000] [--out BENCH/BASELINE.md]

Each measurement runs in its own subprocess (fresh JVM) so the two
core counts can't share warmed state; within a subprocess the job runs
twice and the second (JIT/Arrow-warm) time is reported, mirroring how
steady-state batches behave on a long-running cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_ROOT = "/tmp/ocr_scale_corpus"


def ensure_corpus(n_docs: int) -> str:
    """Generate + stage the bench corpus once (deterministic, cached).
    Corpus prep is input staging, not engine work — excluded from the
    timed region, like the Iceberg table that would already exist."""
    path = f"{CORPUS_ROOT}_heavy_{n_docs}"
    marker = os.path.join(path, "_READY")
    if os.path.exists(marker):
        return path
    from ocr_tool_spark import fixtures
    from ocr_tool_spark.session import build_session
    from ocr_tool_spark.sources.tables import docs_df, media_df

    # heavy = realistic web-document sizes (~8 KB HTML spans, dense
    # scanned pages); the light correctness fixtures are too small to
    # be compute-bound, which is what a throughput scaling measurement
    # must be
    docs, media = fixtures.gen_corpus(
        n_docs, n_media=max(n_docs // 20, 50), seed=42, heavy=True
    )
    spark = build_session(app_name="scale-corpus", cores=8, shuffle_partitions=16)
    docs_df(spark, docs).repartition(64).write.mode("overwrite").parquet(f"{path}/docs")
    media_df(spark, media).repartition(64).write.mode("overwrite").parquet(f"{path}/media")
    spark.stop()
    with open(marker, "w") as f:
        f.write("ok")
    return path


def worker(corpus: str, cores: int, salt: int) -> None:
    """Measure one core count; prints a single JSON line."""
    from pyspark.sql import functions as F

    from ocr_tool_spark.plans.pipeline import extract_documents
    from ocr_tool_spark.session import build_session

    spark = build_session(
        app_name=f"scale-bench-{cores}",
        cores=cores,
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{corpus}/docs")
    media = spark.read.parquet(f"{corpus}/media")
    n = docs.count()
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        # noop sink materializes EVERY column — a bare .count() would let
        # Catalyst prune the collect_list and the extraction UDFs away
        out = extract_documents(docs, media, salt=salt)
        out.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    best = times[-1]
    print(
        json.dumps(
            {"cores": cores, "docs": n, "sec": round(best, 3),
             "docs_per_sec": round(n / best, 1), "runs": [round(t, 3) for t in times]}
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    ap.add_argument("--worker-cores", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--corpus", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker_cores:
        worker(args.corpus, args.worker_cores, args.salt)
        return

    corpus = ensure_corpus(args.docs)
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker-cores", str(cores),
             "--corpus", corpus, "--salt", str(args.salt)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    thr8, thr32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = round((thr32 / thr8) / 4, 3)
    summary = {
        "metric": "extraction throughput scaling local[8] -> local[32] (N -> 4N stand-in)",
        "docs": results[8]["docs"],
        "thr_8": thr8,
        "thr_32": thr32,
        "efficiency": eff,
        "gate": ">= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# BENCH baseline — scaling evidence\n\n"
            "Identical end-to-end extraction job (mixed text+media corpus,\n"
            f"{results[8]['docs']} docs, media salt={args.salt}, AQE on) at two\n"
            "parallelism levels on the same staged parquet input. local[8] vs\n"
            "local[32] stands in for N vs 4N executors (no cluster in sandbox;\n"
            "driver instruction).\n\n"
            "| config | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[8], shuffle=16 | {results[8]['sec']} | {thr8} |\n"
            f"| local[32], shuffle=64 | {results[32]['sec']} | {thr32} |\n\n"
            f"**Scaling efficiency** = ({thr32} / {thr8}) / 4 = **{eff}**"
            f" (gate ≥ 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n\n"
            "Reproduce: `python scripts/scaling_bench.py`\n"
        )


if __name__ == "__main__":
    main()
