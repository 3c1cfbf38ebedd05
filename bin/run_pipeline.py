#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (SURVEY.md J6).

Local smoke run:
    python bin/run_pipeline.py --input <docs_parquet_dir> \
        --media <media_parquet> --work /tmp/ocr_run --partitions 32

Cluster run (see docs/cluster_profile.md for Iceberg config):
    spark-submit --py-files engine.zip \
        --conf spark.sql.adaptive.enabled=true ... \
        bin/run_pipeline.py --input ... --work ... --resume <run_id>

A killed run re-invoked with the same --run-id (or the deterministic
default) resumes from the last committed snapshot: already-committed
partitions are skipped via the lineage anti-join.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="interleaved docs parquet dir/file")
    p.add_argument("--media", help="media_store parquet (optional: text-only run)")
    p.add_argument("--work", required=True, help="work dir (output + lineage tables)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--batch-partitions", type=int, default=8)
    p.add_argument("--salt", type=int, default=None, help="reassembly salt for skewed docs")
    p.add_argument("--cores", type=int, default=None, help="local mode cores (ignored under spark-submit)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from ocr_tool_spark.plans.runner import PipelineRunner
    from ocr_tool_spark.session import build_session

    # under spark-submit a session already exists; standalone we build one
    active = SparkSession.getActiveSession()
    spark = active or build_session(app_name="ocr-tool-spark-pipeline", cores=args.cores)

    docs = spark.read.parquet(args.input)
    media = spark.read.parquet(args.media) if args.media else None

    runner = PipelineRunner(
        spark,
        args.work,
        n_partitions=args.partitions,
        batch_partitions=args.batch_partitions,
        salt=args.salt,
    )
    run_id = runner.run(docs, media, run_id=args.run_id)

    out = runner.read_output()
    lin = runner.lineage.read(spark).filter(f"run_id = '{run_id}'")
    n_docs = out.count() if out is not None else 0
    rows = lin.groupBy().agg(
        {"docs": "sum", "spans": "sum", "media_spans": "sum"}
    ).collect()[0]
    print(
        f"run_id={run_id} docs={n_docs} spans={rows['sum(spans)']} "
        f"media_spans={rows['sum(media_spans)']} "
        f"snapshot={runner.output.current_snapshot_id()}"
    )
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
