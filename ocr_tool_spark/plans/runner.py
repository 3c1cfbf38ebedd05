"""Resumable partitioned pipeline runner (SURVEY.md §3.1/§3.3, C5/J4/J5, A5).

Execution model, designed for the 10^12-doc table:

1. **Stage**: the input is written once per run, hash-partitioned into
   ``n_partitions`` by ``pmod(xxhash64(doc_id), n)`` and laid out with
   ``partitionBy("partition_id")`` — so every later read of a subset of
   partitions is *directory-pruned* at the scan (no full-table filter).
   On real Iceberg the same role is played by a hidden
   ``bucket(n, doc_id)`` partition spec: the stage step disappears and
   pruning comes from the table layout itself.
2. **Commit loop**: pending partitions (all minus those in the lineage
   table for this run_id — the C5 anti-join, done driver-side on the
   tiny lineage frame) are processed in batches. Each batch is one
   Spark job: scan pruned input → extract_spans → reassemble → append
   to the output SnapshotTable → append one lineage row per partition.
3. **Crash anywhere**: output appends are idempotent by batch_id
   (SnapshotTable contract), lineage is written after output, so on
   resume a half-committed batch is either skipped (lineage present) or
   re-run with the duplicate output append suppressed. Final output is
   bit-identical to an uninterrupted run (property test §5.5b).

run_id is deterministic from (input path identity, config) unless the
caller supplies one — reproducible resume without wall-clock state in
the data path (J5).
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_tool_spark.constants import KIND_MEDIA, KIND_TEXT
from ocr_tool_spark.plans.pipeline import extract_spans
from ocr_tool_spark.operators.spans import reassemble
from ocr_tool_spark.storage.adapter import SnapshotTable

LINEAGE_SCHEMA = (
    "run_id string, partition_id int, docs long, spans long, "
    "text_spans long, media_spans long, ocr_ms_p50 double, ocr_ms_p95 double, "
    "docs_per_sec double, snapshot_id long, committed_at timestamp"
)


def deterministic_run_id(*parts: str) -> str:
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def input_fingerprint(docs: DataFrame) -> str:
    """Identity of the *input data*, not just the config: schema +
    source files (with size/mtime where locally visible) + a bounded
    content sample (limit-64 head — one single-task job even against a
    10^12-row table, and the only identity available for in-memory
    test inputs, whose RDD-backed plans hash differently every
    session). Folded into the default run_id so the same work_dir with
    a different --input cannot silently reuse a stale staged
    directory. Bound: two in-memory inputs agreeing on schema AND the
    first 64 rows collide — file-backed inputs (the production path)
    are fully distinguished by the file list + stat identity."""
    basis = [docs.schema.simpleString()]
    for f in sorted(docs.inputFiles()):
        basis.append(f)
        local = f.removeprefix("file:")
        if os.path.exists(local):
            st = os.stat(local)
            basis.append(f"{st.st_size}:{st.st_mtime_ns}")
    head = repr(docs.limit(64).collect())
    basis.append(hashlib.sha256(head.encode()).hexdigest())
    return hashlib.sha256("|".join(basis).encode()).hexdigest()[:16]


def with_partition_id(docs: DataFrame, n_partitions: int) -> DataFrame:
    return docs.withColumn(
        "partition_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions)).cast("int")
    )


class PipelineRunner:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        n_partitions: int = 32,
        batch_partitions: int = 8,
        salt: int | None = None,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.n_partitions = n_partitions
        self.batch_partitions = batch_partitions
        self.salt = salt
        self.output = SnapshotTable(os.path.join(work_dir, "output"))
        self.lineage = SnapshotTable(os.path.join(work_dir, "lineage"))

    # -- lineage --------------------------------------------------------

    def committed_partitions(self, run_id: str) -> set[int]:
        ldf = self.lineage.read(self.spark)
        if ldf is None:
            return set()
        rows = (
            ldf.filter(F.col("run_id") == run_id)
            .select("partition_id")
            .distinct()
            .collect()
        )
        return {r.partition_id for r in rows}

    # -- staging --------------------------------------------------------

    def _stage_dir(self, run_id: str) -> str:
        return os.path.join(self.work_dir, f"stage-{run_id}")

    def stage_input(self, docs: DataFrame, run_id: str, fp: str | None = None) -> str:
        """Write the hash-partitioned input once; reuse on resume.
        The _STAGED marker records the input fingerprint — resuming the
        same run_id with a *different* input fails loudly instead of
        silently skipping all partitions via the lineage anti-join."""
        stage = self._stage_dir(run_id)
        done = os.path.join(stage, "_STAGED")
        fp = fp or input_fingerprint(docs)
        if os.path.exists(done):
            with open(done) as f:
                staged_fp = f.read().strip()
            if staged_fp == "ok":
                # pre-fingerprint stage dir (marker format up to r2):
                # the raw bytes can't be fingerprint-verified, but a
                # cheap content sample CAN be checked before adopting —
                # blind adoption would permanently mask the wrong-input
                # mismatch this guard exists to catch (ADVICE r3):
                # count + doc_id envelope, one tiny agg job per side
                import warnings

                staged_df = self.spark.read.parquet(stage)
                probe = lambda df: df.select(  # noqa: E731
                    F.count("*"), F.min("doc_id"), F.max("doc_id")
                ).collect()[0]
                s, i = probe(staged_df), probe(docs)
                if tuple(s) != tuple(i):
                    raise ValueError(
                        f"staged input at {stage} has a legacy 'ok' marker and "
                        f"its content sample {tuple(s)} does not match this "
                        f"input {tuple(i)}; delete the stage dir or use a "
                        "distinct run_id per input"
                    )
                warnings.warn(
                    f"stage dir {stage} has a legacy 'ok' marker; content "
                    "sample matches this input — upgrading the marker"
                )
                with open(done, "w") as f:
                    f.write(fp)
                staged_fp = fp
            if staged_fp != fp:
                raise ValueError(
                    f"staged input at {stage} was built from a different input "
                    f"(fingerprint {staged_fp} != {fp}); delete the stage dir "
                    "or use a distinct run_id per input"
                )
        else:
            (
                with_partition_id(docs, self.n_partitions)
                .repartition("partition_id")
                .write.mode("overwrite")
                .partitionBy("partition_id")
                .parquet(stage)
            )
            with open(done, "w") as f:
                f.write(fp)
        return stage

    # -- the commit loop ------------------------------------------------

    def run(
        self,
        docs: DataFrame,
        media_store: DataFrame | None = None,
        run_id: str | None = None,
        max_batches: int | None = None,
    ) -> str:
        """Process all pending partitions; returns run_id.
        ``max_batches`` lets tests simulate a kill mid-run."""
        fp = input_fingerprint(docs)
        run_id = run_id or deterministic_run_id(
            fp, str(self.n_partitions), str(self.salt), self.work_dir
        )
        stage = self.stage_input(docs, run_id, fp=fp)
        pending = sorted(set(range(self.n_partitions)) - self.committed_partitions(run_id))
        batches = [
            pending[i : i + self.batch_partitions]
            for i in range(0, len(pending), self.batch_partitions)
        ]
        if max_batches is not None:
            batches = batches[:max_batches]

        for batch in batches:
            t0 = time.perf_counter()
            batch_id = f"{run_id}/p{batch[0]:05d}-p{batch[-1]:05d}"
            part = self.spark.read.parquet(stage).filter(
                F.col("partition_id").isin([int(p) for p in batch])
            )
            # partition_id is a pure function of doc_id — recompute instead
            # of joining it back (saves a shuffle per batch)
            spans = with_partition_id(
                extract_spans(part.select("doc_id", "spans"), media_store),
                self.n_partitions,
            )
            spans.persist()
            try:
                # partition-local sort clusters output files by doc_id so
                # the committed table's min/max column stats prune scans
                # (SURVEY.md F2); no extra shuffle — sorts within the
                # reassembly's existing hash partitions
                out = reassemble(
                    spans.select("doc_id", "kind", "text", "media_ref", "offset"),
                    salt=self.salt,
                ).sortWithinPartitions("doc_id")
                # D9: observe() rides the commit job — doc/span counts come
                # out of the append action itself, no extra pass
                from pyspark.sql import Observation

                obs = Observation()
                out = out.observe(
                    obs,
                    F.count(F.lit(1)).alias("docs"),
                    F.sum(F.size("spans")).alias("spans"),
                )
                # obs.get blocks until the observed plan executes — which
                # never happens if the append was an idempotent no-op
                already = batch_id in self.output.committed_batches()
                snapshot_id = self.output.append(out, batch_id=batch_id)
                observed = {} if already else dict(obs.get)

                metrics = (
                    spans.groupBy("partition_id")
                    .agg(
                        F.countDistinct("doc_id").alias("docs"),
                        F.count("*").alias("spans"),
                        F.sum((F.col("kind") == KIND_TEXT).cast("long")).alias("text_spans"),
                        F.sum((F.col("kind") == KIND_MEDIA).cast("long")).alias("media_spans"),
                        F.percentile_approx("ocr_ms", 0.5).alias("ocr_ms_p50"),
                        F.percentile_approx("ocr_ms", 0.95).alias("ocr_ms_p95"),
                    )
                    .collect()
                )
            finally:
                spans.unpersist()
            elapsed = max(time.perf_counter() - t0, 1e-9)
            total_docs = int(observed.get("docs") or sum(m.docs for m in metrics))
            lineage_rows = [
                (
                    run_id,
                    int(m.partition_id),
                    int(m.docs),
                    int(m.spans),
                    int(m.text_spans),
                    int(m.media_spans),
                    float(m.ocr_ms_p50) if m.ocr_ms_p50 is not None else None,
                    float(m.ocr_ms_p95) if m.ocr_ms_p95 is not None else None,
                    round(total_docs / elapsed, 3),
                    int(snapshot_id),
                )
                for m in metrics
            ]
            ldf = self.spark.createDataFrame(
                lineage_rows,
                schema=LINEAGE_SCHEMA.rsplit(",", 1)[0],  # all but committed_at
            ).withColumn("committed_at", F.current_timestamp())
            self.lineage.append(ldf, batch_id=batch_id)
        return run_id

    def read_output(self) -> DataFrame | None:
        return self.output.read(self.spark)
