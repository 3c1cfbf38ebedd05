"""Benchmark decontamination (SURVEY.md §2.K20): flag corpus documents
that share word n-grams with an evaluation/benchmark set — the
standard pre-training hygiene step (largest-scale LLM corpora drop or
mark any training doc overlapping a held-out benchmark by ≥1 long
n-gram).

Scale design (100 TB corpus, small eval set): the eval set is by
definition tiny (benchmarks are thousands of documents, not billions),
so its distinct grams become the build side of ONE broadcast hash join
probed by the scan-local exploded corpus grams. The broadcast hash
table is built once per task and probed O(1) per gram, so total corpus
cost is O(corpus grams); the only corpus-wide movement is the per-doc
count aggregate, which partial (map-side) aggregation collapses to ~1
row per document before the shuffle.

Why not `array_intersect` against a broadcast eval-gram ARRAY (the
r4-original shape, which had zero corpus shuffle)? Catalyst's
ArrayIntersect rebuilds the hash set of its argument PER ROW — with a
~10^5-gram eval set that is O(|corpus| × |eval|) hash inserts, which
measured 4× slower than this plan at sf0.1 and is catastrophic at
10^12 docs. A ~1-row-per-doc shuffle is the cheaper trade by orders of
magnitude; "zero shuffle" was the wrong thing to optimize.

Cross-engine exactness: grams are compared as PLAIN STRINGS (not
hashes), so the DuckDB oracle can reproduce the result verbatim; a
production deployment would md5/xxhash the grams to shrink the
broadcast, which changes bytes, not semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ocr_tool_spark.dataprep.dedup import tokens
from ocr_tool_spark.operators.parallelism import ensure_parallelism_floor


def word_ngrams(c: Column, n: int) -> Column:
    """Distinct word n-grams of the normalized text as strings
    ('w1 ... wn'); docs shorter than n words produce an empty array
    (same convention as dedup.shingles)."""
    t = tokens(c)
    cnt = F.size(t)
    return F.array_distinct(
        F.when(
            cnt >= n,
            F.transform(
                F.sequence(F.lit(1), cnt - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_shared_grams, contaminated): per corpus doc, how many
    of its distinct word n-grams appear anywhere in the eval set, and
    the ≥1-gram contamination flag.

    Plan: distinct eval grams (driver-sized by the benchmark's nature)
    are the build side of a broadcast hash join; the probe side is the
    corpus's exploded distinct grams (explode_outer so gram-less docs
    survive with count 0). The per-doc count is a hash aggregate whose
    map-side partial emits ~1 row per document — the only shuffle that
    touches corpus cardinality."""
    ev_col = eval_text_col or text_col
    ev = (
        eval_docs.select(F.explode(word_ngrams(F.col(ev_col), n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # the gram HOF chain costs ~1 ms/doc of JVM compute on a scan whose
    # BYTES are tiny (compressed text) — an underfilled scan serializes
    # it (measured 4.2 s on one task at sf0.1), so spread by compute,
    # not bytes (min_bytes=0). No-op at scale: splits >> cores.
    par = docs.sparkSession.sparkContext.defaultParallelism
    doc_grams = ensure_parallelism_floor(docs, par).select(
        id_col, F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(ev), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("_hit"), F.lit(0))
            .cast("long")
            .alias("n_shared_grams")
        )
        .withColumn("contaminated", (F.col("n_shared_grams") > 0).cast("int"))
    )
