"""End-to-end golden-fixture tests (SURVEY.md §5.2-5.5): the full Spark
pipeline vs the reference spec, exact span-sequence equality on
(kind, text, media_ref, order) per doc_id — the BASELINE.json:2 hard
gate (pass rate = 100%) plus the metamorphic properties."""

from __future__ import annotations

import pytest

import refspec
from ocr_tool_spark import fixtures
from ocr_tool_spark.operators.equality import mismatches, pass_rate
from ocr_tool_spark.operators.spans import explode_spans, reassemble
from ocr_tool_spark.plans.pipeline import extract_documents
from ocr_tool_spark.sources.tables import docs_df, media_df

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus():
    docs, media = fixtures.gen_corpus(N_DOCS, seed=42)
    store = {m["media_ref"]: m for m in media}
    expected = [refspec.extract_document(d, store) for d in docs]
    return docs, media, expected


def test_full_corpus_span_equality(spark, corpus):
    docs, media, expected = corpus
    out = extract_documents(docs_df(spark, docs), media_df(spark, media))
    exp = docs_df(spark, expected)
    rate = pass_rate(exp, out)
    if rate != 1.0:
        for row in mismatches(exp, out, 3):
            print("MISMATCH", row["doc_id"])
            print("  expected:", row["spans_e"][:3] if row["spans_e"] else None)
            print("  actual  :", row["spans_a"][:3] if row["spans_a"] else None)
    assert rate == 1.0


def test_salted_run_equals_unsalted(spark, corpus):
    docs, media, expected = corpus
    d, m = docs_df(spark, docs), media_df(spark, media)
    plain = extract_documents(d, m)
    salted = extract_documents(d, m, salt=8)
    assert pass_rate(plain, salted) == 1.0


def test_reassemble_explode_roundtrip(spark, corpus):
    docs, _, _ = corpus
    d = docs_df(spark, docs)
    rebuilt = reassemble(explode_spans(d))
    assert pass_rate(d, rebuilt) == 1.0


def test_text_only_docs_unaffected_by_missing_media_store(spark, corpus):
    docs, media, expected = corpus
    text_only = [d for d in docs if all(s["kind"] == "text" for s in d["spans"])]
    exp = [e for e in expected if e["doc_id"] in {d["doc_id"] for d in text_only}]
    assert text_only
    out = extract_documents(docs_df(spark, text_only), media_store=None)
    assert pass_rate(docs_df(spark, exp), out) == 1.0


def test_doc_order_permutation_invariance(spark, corpus):
    docs, media, _ = corpus
    d, m = docs_df(spark, docs), media_df(spark, media)
    fwd = extract_documents(d, m)
    rev = extract_documents(docs_df(spark, list(reversed(docs))), m)
    assert pass_rate(fwd, rev) == 1.0


def test_zero_page_media_degrades_to_empty_text(spark):
    """A media row with n_pages=0 must yield an empty-text span (like
    read_media("") in the spec), not crash the per-page explode."""
    docs = [{
        "doc_id": "z0",
        "spans": [
            {"kind": "media", "text": None, "media_ref": "img:zero", "offset": 0},
        ],
    }]
    media = [{
        "media_ref": "img:zero", "media_kind": "image",
        "width": 4, "height": 4, "n_pages": 0, "bitmap": b"",
    }]
    out = extract_documents(docs_df(spark, docs), media_df(spark, media)).collect()
    assert len(out) == 1
    span = out[0].spans[0]
    assert (span.kind, span.text, span.media_ref, span.offset) == (
        "media", "", "img:zero", 0
    )
