"""Resume-after-kill property (SURVEY.md §5.5b, §6): a run killed after
k of n partition batches, then resumed, yields output bit-identical to
an uninterrupted run, with zero committed docs re-processed."""

from __future__ import annotations

import pytest

from ocr_tool_spark import fixtures
from ocr_tool_spark.plans.runner import PipelineRunner
from ocr_tool_spark.sources.tables import docs_df, media_df
from ocr_tool_spark.storage.adapter import SnapshotTable


@pytest.fixture(scope="module")
def corpus(spark):
    docs, media = fixtures.gen_corpus(60, seed=13)
    return docs_df(spark, docs), media_df(spark, media)


def _rows(df):
    return sorted(
        ((r.doc_id, tuple((s.kind, s.text, s.media_ref, s.offset) for s in r.spans))
         for r in df.collect())
    )


def test_snapshot_table_append_read_idempotent(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    assert t.read(spark) is None
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    s1 = t.append(df, batch_id="b1")
    s2 = t.append(df, batch_id="b1")  # duplicate append is a no-op
    assert s1 == s2 == 0
    assert t.read(spark).count() == 5
    t.append(spark.range(3).selectExpr("id + 100 AS id", "id AS v"), batch_id="b2")
    assert t.read(spark).count() == 8
    # time travel: snapshot 0 still sees only the first batch
    assert t.read(spark, snapshot_id=0).count() == 5


def test_kill_resume_bit_identical(spark, tmp_path, corpus):
    docs, media = corpus

    full = PipelineRunner(spark, str(tmp_path / "full"), n_partitions=8,
                          batch_partitions=2, salt=4)
    rid = full.run(docs, media, run_id="r-full")
    expected = _rows(full.read_output())
    assert len(expected) == 60

    killed = PipelineRunner(spark, str(tmp_path / "killed"), n_partitions=8,
                            batch_partitions=2, salt=4)
    killed.run(docs, media, run_id="r-kill", max_batches=2)  # "crash" at 50%
    n_committed = len(killed.committed_partitions("r-kill"))
    assert 0 < n_committed < 8
    snap_before = killed.output.current_snapshot_id()

    killed.run(docs, media, run_id="r-kill")  # resume
    assert len(killed.committed_partitions("r-kill")) == 8
    resumed = _rows(killed.read_output())
    assert resumed == expected

    # zero re-processing: committed batches were not appended again
    batches = killed.output.committed_batches()
    assert len(batches) == 4  # 8 partitions / 2 per batch
    assert killed.output.current_snapshot_id() == snap_before + 2

    # lineage carries per-partition metrics for every partition
    lin = killed.lineage.read(spark).filter("run_id = 'r-kill'")
    rows = {r.partition_id: r for r in lin.collect()}
    assert set(rows) == set(range(8))
    assert sum(r.docs for r in rows.values()) == 60
    assert all(r.spans >= r.docs for r in rows.values())
    media_parts = [r for r in rows.values() if r.media_spans > 0]
    assert media_parts and all(r.ocr_ms_p50 is not None for r in media_parts)


def test_crashed_halfway_commit_is_invisible(spark, tmp_path):
    """A manifest written but not HEAD-swung (crash between the two
    steps) must be invisible to readers and harmless to re-append."""
    import json
    import os

    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(4).selectExpr("id", "id * 3 AS v")
    t.append(df, batch_id="b1")
    head_before = t.current_snapshot_id()

    # simulate: next manifest exists on disk, HEAD never swung
    orphan = {"snapshot_id": head_before + 1, "parent": head_before,
              "batches": {"b1": [], "ghost": ["/nonexistent.parquet"]}}
    with open(t._manifest_path(head_before + 1), "w") as f:
        json.dump(orphan, f)

    assert t.current_snapshot_id() == head_before
    assert t.read(spark).count() == 4          # ghost files never read
    assert t.committed_batches() == {"b1"}

    # a real append after the crash overwrites the orphan manifest slot
    t.append(spark.range(2).selectExpr("id + 10 AS id", "id AS v"), batch_id="b2")
    assert t.current_snapshot_id() == head_before + 1
    assert t.read(spark).count() == 6
    assert t.committed_batches() == {"b1", "b2"}


def test_stale_stage_different_input_fails_loudly(spark, tmp_path):
    """Same work_dir + same explicit run_id + different input must
    raise, not silently reuse the stale staged parquet (ADVICE r1)."""
    docs_a, _ = fixtures.gen_corpus(8, seed=1)
    docs_b, _ = fixtures.gen_corpus(8, seed=2)
    runner = PipelineRunner(spark, str(tmp_path / "w"), n_partitions=2)
    runner.run(docs_df(spark, docs_a), run_id="pinned")
    with pytest.raises(ValueError, match="different input"):
        runner.run(docs_df(spark, docs_b), run_id="pinned")


def test_legacy_ok_stage_marker_is_adopted(spark, tmp_path):
    """A stage dir written before the fingerprint marker existed holds
    the literal 'ok': resuming must adopt it (warn + rewrite with the
    computed fingerprint), not raise a migration error (ADVICE r2)."""
    import os
    import warnings

    docs, _ = fixtures.gen_corpus(8, seed=1)
    runner = PipelineRunner(spark, str(tmp_path / "w"), n_partitions=2)
    d = docs_df(spark, docs)
    runner.run(d, run_id="pinned")
    marker = os.path.join(runner._stage_dir("pinned"), "_STAGED")
    with open(marker, "w") as f:
        f.write("ok")  # simulate the pre-upgrade marker format
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        runner.run(d, run_id="pinned")  # must not raise
    assert any("legacy 'ok' marker" in str(x.message) for x in w)
    with open(marker) as f:
        assert f.read().strip() != "ok"  # upgraded to the fingerprint


def test_legacy_ok_marker_with_wrong_content_fails_loudly(spark, tmp_path):
    """ADVICE r3: a legacy 'ok' marker is only adopted after a content
    sample (count + doc_id envelope) matches the CURRENT input; staged
    data from a different corpus must raise, not be silently merged."""
    import os

    docs_a, _ = fixtures.gen_corpus(8, seed=1)
    docs_b, _ = fixtures.gen_corpus(12, seed=2)
    runner = PipelineRunner(spark, str(tmp_path / "w"), n_partitions=2)
    runner.run(docs_df(spark, docs_a), run_id="pinned")
    marker = os.path.join(runner._stage_dir("pinned"), "_STAGED")
    with open(marker, "w") as f:
        f.write("ok")
    with pytest.raises(ValueError, match="content sample"):
        runner.run(docs_df(spark, docs_b), run_id="pinned")


def test_default_run_id_differs_per_input(spark, tmp_path):
    """Default run_id folds in input identity: two different inputs in
    the same work_dir get distinct run ids (and distinct stage dirs)."""
    docs_a, _ = fixtures.gen_corpus(8, seed=1)
    docs_b, _ = fixtures.gen_corpus(8, seed=2)
    runner = PipelineRunner(spark, str(tmp_path / "w"), n_partitions=2)
    rid_a = runner.run(docs_df(spark, docs_a))
    rid_b = runner.run(docs_df(spark, docs_b))
    assert rid_a != rid_b
