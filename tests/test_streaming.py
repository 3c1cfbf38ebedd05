"""Streaming surface tests (SURVEY.md §2.L): availableNow runs over
static parquet must equal the batch equivalents, and the foreachBatch
extraction sink must be exactly-once across a stream restart."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_tool_spark.streaming import incremental as st
from ocr_tool_spark.storage.adapter import SnapshotTable


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as a 3-file parquet directory (file-source
    streams want a directory, and >1 file exercises incremental reads)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).repartition(
        3
    ).write.mode("overwrite").parquet(d)
    return d


def test_tumbling_stream_equals_batch(spark, events_dir):
    got = st.run_to_memory_sink(
        st.tumbling_counts(st.read_events_stream(spark, events_dir)), "t_tumb"
    )
    exp = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w")["start"].alias("win_start"), "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_sliding_stream_equals_batch(spark, events_dir):
    got = st.run_to_memory_sink(
        st.sliding_counts(st.read_events_stream(spark, events_dir)), "t_slide"
    )
    exp = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w")["start"].alias("win_start"), "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_session_windows_cover_all_events(spark, events_dir):
    got = st.run_to_memory_sink(
        st.session_counts(st.read_events_stream(spark, events_dir)), "t_sess"
    )
    total = spark.read.parquet(events_dir).count()
    rows = got.collect()
    assert sum(r.n for r in rows) == total
    assert all(r.sess_end > r.sess_start for r in rows)


def test_streaming_dedupe(spark, events_dir, tmp_path):
    # duplicate every event, then stream-dedupe must restore uniqueness
    dup_dir = str(tmp_path / "dup")
    e = spark.read.parquet(events_dir)
    e.unionByName(e).repartition(2).write.mode("overwrite").parquet(dup_dir)
    got = st.run_to_memory_sink(
        st.dedupe_events(st.read_events_stream(spark, dup_dir)), "t_dedup", mode="append"
    )
    assert got.count() == got.select("event_id").distinct().count()


def test_streaming_extract_exactly_once(spark, tmp_path):
    from ocr_tool_spark import fixtures
    from ocr_tool_spark.plans.pipeline import extract_documents
    from ocr_tool_spark.sources.tables import docs_df, media_df

    docs, media = fixtures.gen_corpus(40, seed=21)
    in_dir = str(tmp_path / "in")
    docs_df(spark, docs).repartition(4).write.mode("overwrite").parquet(in_dir)
    mstore = media_df(spark, media)

    sink = SnapshotTable(str(tmp_path / "out"))
    ckpt = str(tmp_path / "ckpt")
    q = st.streaming_extract(st.read_docs_stream(spark, in_dir), sink, ckpt, mstore)
    q.awaitTermination()
    first = sink.current_snapshot_id()

    # restart the stream from the same checkpoint: no new input -> no
    # new snapshots; replayed batches would be idempotent no-ops anyway
    q2 = st.streaming_extract(st.read_docs_stream(spark, in_dir), sink, ckpt, mstore)
    q2.awaitTermination()
    assert sink.current_snapshot_id() == first

    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in sink.read(spark).collect()
    }
    exp = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in extract_documents(docs_df(spark, docs), mstore).collect()
    }
    assert got == exp
