"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ocr_tool_spark/ (see SURVEY.md §2 for the
operator inventory each key maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_tool_spark.plans.pipeline import extract_documents  # noqa: E402
from ocr_tool_spark.sources.tables import interleaved_from_documents  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: boilerplate-strip extraction over sf0.001 documents,
    returned in the interleaved output shape."""
    docs = interleaved_from_documents(spark, "/root/testdata/sf0.001")
    return extract_documents(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_tool_spark.plans import driver_queries

    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    from ocr_tool_spark.plans import driver_queries

    return driver_queries.oracle_sql()
