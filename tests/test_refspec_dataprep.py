"""Differential tests: the plain-Python dedup/ANN spec
(refspec_dataprep.py) must equal the Spark operators bit-for-bit on
the driver corpus — the precondition for its generated VALUES oracles
in plans/driver_queries.py."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import refspec_dataprep as spec
from ocr_tool_spark.dataprep import dedup, similarity


def _planted(sf_dir_mid):
    t = pq.read_table(f"{sf_dir_mid}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    docs += [(i + 1000000, s) for i, s in docs if i % 10 == 0]
    return docs


def test_xxh64_matches_spark(spark):
    samples = [
        "", "a", "abc", "hello world", "x" * 100,
        "the quick brown fox jumps over the lazy dog",
        "naïve café 中文", "0123456789abcdef0123456789abcdef0123",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert spec.signed64(spec.xxh64(s.encode("utf-8"), 42)) == got[s], s


def test_minhash_signature_matches_arrow_kernel(spark, sf_dir_mid):
    docs = _planted(sf_dir_mid)[:60]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: tuple(r.sig)
        for r in dedup.minhash_signatures_arrow(d).collect()
    }
    for i, t in docs:
        assert spec.minhash_signature(t) == got[i], f"doc {i}"


def test_minhash_signature_nonascii_fallback_matches_spec(spark):
    """The Arrow kernel's vectorized byte path only handles ASCII; any
    high byte in a batch must route through the Python-string fallback
    and still equal the plain-Python spec bit-for-bit — NBSP (Unicode
    whitespace Java \\s does NOT split), accented letters with
    non-trivial lower(), CJK, and edge shapes (empty, <k tokens,
    whitespace-only, NULs)."""
    texts = [
        "plain ascii words here for a normal doc",
        "café naïve résumé straße İstanbul",
        "nbsp joined tokens stay one",  # NBSP is NOT Java \s
        "中文 文本 分词 测试 样例",
        "",
        "two tokens",
        " \t\n ",
        "nul\x00byte token mix",
        "MiXeD CaSe ASCII with É at the end",
    ]
    docs = list(enumerate(texts))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: tuple(r.sig)
        for r in dedup.minhash_signatures_arrow(d).collect()
    }
    for i, t in docs:
        assert spec.minhash_signature(t) == got[i], f"doc {i}: {t!r}"


def test_minhash_pairs_replay_equals_spark(spark, sf_dir_mid):
    docs = _planted(sf_dir_mid)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(d, threshold=0.6).collect()
    )
    exp = spec.minhash_pairs(docs, threshold=0.6)
    assert got == exp


def test_simhash_replay_equals_spark(spark, sf_dir_mid):
    docs = _planted(sf_dir_mid)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_pairs(d, max_hamming=3).collect()
    )
    exp = spec.simhash_pairs(docs, max_hamming=3)
    assert got == exp


def test_lsh_topk_replay_equals_spark(spark, sf_dir_mid):
    t = pq.read_table(f"{sf_dir_mid}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = list(zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()))
    e = spark.read.parquet(f"{sf_dir_mid}/embeddings.parquet")
    got = [
        (r.vec_id, r.cos_sim)
        for r in similarity.lsh_topk(e, query_vec_id=0, k=10).collect()
    ]
    exp = spec.lsh_topk(rows, query_vec_id=0, k=10)
    assert got == exp
