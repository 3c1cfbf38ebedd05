"""Span-sequence equality checker (SURVEY.md I9; BASELINE.json:15).

The correctness invariant: per doc_id, exact equality of the ordered
(kind, text, media_ref, order) sequence between the engine output and
the expected table. Docs present on only one side count as failures
(full-outer join semantics, SURVEY.md C8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame, side: str) -> DataFrame:
    spans = F.array_sort(
        F.transform(
            "spans",
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                F.coalesce(s["text"], F.lit("\0null")).alias("text"),
                F.coalesce(s["media_ref"], F.lit("\0null")).alias("media_ref"),
            ),
        )
    )
    return df.select("doc_id", spans.alias(f"spans_{side}"))


def span_equality(expected: DataFrame, actual: DataFrame) -> DataFrame:
    """Per-doc verdict: (doc_id, ok:boolean)."""
    e = _canon(expected, "e")
    a = _canon(actual, "a")
    joined = e.join(a, "doc_id", "full_outer")
    ok = (
        F.col("spans_e").isNotNull()
        & F.col("spans_a").isNotNull()
        & (F.col("spans_e") == F.col("spans_a"))
    )
    return joined.select("doc_id", ok.alias("ok"))


def pass_rate(expected: DataFrame, actual: DataFrame) -> float:
    row = (
        span_equality(expected, actual)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
        )
        .collect()[0]
    )
    return (row["n_ok"] or 0) / row["n"] if row["n"] else 1.0


def mismatches(expected: DataFrame, actual: DataFrame, k: int = 5) -> list:
    """First k failing docs with both span arrays, for debugging."""
    e = _canon(expected, "e")
    a = _canon(actual, "a")
    j = e.join(a, "doc_id", "full_outer")
    bad = j.filter(
        F.col("spans_e").isNull()
        | F.col("spans_a").isNull()
        | (F.col("spans_e") != F.col("spans_a"))
    )
    return bad.orderBy("doc_id").limit(k).collect()
