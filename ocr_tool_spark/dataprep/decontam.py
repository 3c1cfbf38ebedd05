"""Benchmark decontamination (SURVEY.md §2.K20): flag corpus documents
that share word n-grams with an evaluation/benchmark set — the
standard pre-training hygiene step (largest-scale LLM corpora drop or
mark any training doc overlapping a held-out benchmark by ≥1 long
n-gram).

Scale design (100 TB corpus, small eval set): the eval set is by
definition tiny (benchmarks are thousands of documents, not billions),
so its distinct gram set is collected into ONE broadcast array and the
corpus side is a single scan with a per-row `array_intersect` — ZERO
shuffle on the corpus, no explode, no join key. The eval-side prep
(distinct grams) is one small aggregation. If the eval gram set ever
outgrew broadcast range (~GBs), the fallback is the classic
explode + broadcast semi-join, which shuffles only matched grams; the
operator keeps the broadcast shape because that is the right plan for
the stated cardinalities.

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

    One aggregation collapses the eval set to a single distinct-gram
    array (driver-sized by the benchmark's nature), broadcast to every
    corpus partition; the corpus pass is then scan-local:
    `size(array_intersect(doc_grams, eval_grams))`."""
    ev_col = eval_text_col or text_col
    ev = eval_docs.select(
        F.explode(word_ngrams(F.col(ev_col), n)).alias("gram")
    ).agg(F.array_sort(F.collect_set("gram")).alias("_ev_grams"))
    return (
        docs.select(id_col, word_ngrams(F.col(text_col), n).alias("_grams"))
        .crossJoin(F.broadcast(ev))
        .select(
            id_col,
            F.size(F.array_intersect("_grams", "_ev_grams"))
            .cast("long")
            .alias("n_shared_grams"),
        )
        .withColumn(
            "contaminated", (F.col("n_shared_grams") > 0).cast("int")
        )
    )
