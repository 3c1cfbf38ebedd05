"""Static scan-split estimation (operators/parallelism.py): the floor
decision must match what the old `.rdd.getNumPartitions()` probe
decided, without building an RDD plan or materializing AQE stages
(VERDICT r3 wrong #3 / ADVICE r3 medium)."""

from __future__ import annotations

import pytest

from ocr_tool_spark.operators.parallelism import (
    ensure_parallelism_floor,
    estimated_scan_splits,
    parse_bytes,
)


def test_parse_bytes_spark_forms():
    assert parse_bytes("8m") == 8 << 20
    assert parse_bytes("128MB") == 128 << 20
    assert parse_bytes("1048576b") == 1 << 20
    assert parse_bytes("4g") == 4 << 30
    assert parse_bytes("1024") == 1024
    assert parse_bytes(512) == 512


@pytest.mark.parametrize("table", ["documents", "lineitem"])
def test_estimate_matches_rdd_probe_on_parquet(spark, sf_dir_mid, table):
    """Decision parity on real file-backed scans: the estimate and the
    actual scan partitioning must fall on the same side of the
    parallelism floor (the only thing either number is used for)."""
    df = spark.read.parquet(f"{sf_dir_mid}/{table}.parquet")
    est = estimated_scan_splits(df)
    actual = df.rdd.getNumPartitions()
    par = spark.sparkContext.defaultParallelism
    assert est is not None
    assert (est < par) == (actual < par), f"{table}: est {est} vs actual {actual}"
    # and the estimate itself is in the right ballpark (same packing
    # formula; exact equality is not contractual across Spark versions)
    assert actual / 2 <= est <= actual * 2 or abs(est - actual) <= 2


def test_estimate_none_for_in_memory(spark):
    df = spark.createDataFrame([(1, "a")], "id long, t string")
    assert estimated_scan_splits(df) is None
    # the floor repartitions in-memory frames unconditionally
    out = ensure_parallelism_floor(df, 4)
    assert out.rdd.getNumPartitions() == 4


def test_floor_repartitions_small_scan(spark, sf_dir):
    """sf0.001 documents is one tiny file — far fewer splits than a
    32-core box, so the floor must fire."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    est = estimated_scan_splits(df)
    assert est is not None and est < par
    out = ensure_parallelism_floor(df, par)
    assert out.rdd.getNumPartitions() == par


def test_floor_noop_when_scan_is_wide(spark, sf_dir_mid):
    """When the estimate clears the target, the frame is returned
    unchanged — no shuffle is added (the 100 TB behavior)."""
    df = spark.read.parquet(f"{sf_dir_mid}/lineitem.parquet")
    est = estimated_scan_splits(df)
    assert est is not None
    target = max(1, est // 2)
    assert ensure_parallelism_floor(df, target) is df
