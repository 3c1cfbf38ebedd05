"""DataFrame constructors: driver testdata parquet + fixture corpora."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ocr_tool_spark.sources.schemas import DOC, MEDIA_STORE

ORACLE_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in ORACLE_TABLES}


_BOILER_PREFIX = (
    "<html><body><header><h1>site title</h1></header>"
    "<nav><ul><li><a>home</a></li><li><a>about</a></li><li><a>contact</a></li></ul></nav>"
    "<div><p>"
)
_BOILER_SUFFIX = (
    "</p><div><ul><li><a>sponsored link one</a></li><li><a>sponsored link two</a></li>"
    "</ul></div></div><script>var x = 1 < 2;</script>"
    "<footer><p>copyright &amp; legal</p></footer></body></html>"
)


def interleaved_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the driver's flat documents table into the interleaved
    (doc_id, spans) shape (BASELINE.json:15), embedding each text in
    known boilerplate so extraction has a SQL-expressible oracle."""
    from pyspark.sql import functions as F

    raw = load_table(spark, sf_dir, "documents")
    html = F.concat(F.lit(_BOILER_PREFIX), F.col("text"), F.lit(_BOILER_SUFFIX))
    span = F.struct(
        F.lit("text").alias("kind"),
        html.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    return raw.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(span).alias("spans"),
    )


def docs_df(spark: SparkSession, docs: list[dict]) -> DataFrame:
    return spark.createDataFrame(docs, schema=DOC)


def media_df(spark: SparkSession, media: list[dict]) -> DataFrame:
    return spark.createDataFrame(media, schema=MEDIA_STORE)
