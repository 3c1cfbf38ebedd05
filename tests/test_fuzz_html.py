"""Differential fuzzing of the HTML text branch: random tag soup
(including malformed nesting, stray closers, unterminated comments)
must extract identically in the Spark engine and the plain-Python
reference spec. One Spark job for all cases."""

from __future__ import annotations

import random

import refspec
from ocr_tool_spark.plans.pipeline import extract_documents
from ocr_tool_spark.sources.tables import docs_df

TAGS = [
    "div", "p", "span", "a", "ul", "li", "h1", "h3", "table", "tr", "td",
    "nav", "header", "footer", "aside", "em", "strong", "b", "i",
]
VOID = ["br", "img"]
WORDS = "alpha beta gamma delta epsilon zeta eta theta".split()
ENTITIES = ["&amp;", "&lt;", "&gt;", "&#65;", "&quot;", "&nbsp;"]


def _soup(rng: random.Random, budget: int) -> str:
    parts: list[str] = []
    open_stack: list[str] = []
    while budget > 0:
        budget -= 1
        r = rng.random()
        if r < 0.30:
            t = rng.choice(TAGS)
            parts.append(f"<{t}>")
            open_stack.append(t)
        elif r < 0.45 and open_stack:
            # close something — half the time the WRONG tag (malformed)
            t = open_stack.pop() if rng.random() < 0.5 else rng.choice(TAGS)
            parts.append(f"</{t}>")
        elif r < 0.52:
            parts.append(f"<{rng.choice(VOID)}>")
        elif r < 0.57:
            parts.append(rng.choice(ENTITIES))
        elif r < 0.62:
            parts.append(f"<!-- {rng.choice(WORDS)} -->")
        elif r < 0.66:
            parts.append(f"<script>var x = {rng.randint(0, 9)} < 7;</script>")
        elif r < 0.69:
            parts.append("</nothing>")  # stray closer
        else:
            parts.append(
                " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 18)))
            )
    return "".join(parts)


def test_tag_soup_differential(spark):
    rng = random.Random(20260816)
    docs = []
    for i in range(120):
        html = _soup(rng, rng.randint(3, 60))
        docs.append(
            {
                "doc_id": f"soup-{i:04d}",
                "spans": [
                    {"kind": "text", "text": html, "media_ref": None, "offset": 0}
                ],
            }
        )
    expected = {
        d["doc_id"]: refspec.extract_document(d, {})["spans"][0]["text"] for d in docs
    }
    out = extract_documents(docs_df(spark, docs))
    got = {
        r.doc_id: r.spans[0].text for r in out.collect()
    }
    mismatches = {k for k in expected if expected[k] != got.get(k)}
    for k in sorted(mismatches)[:5]:
        print(f"{k}\n  exp: {expected[k]!r}\n  got: {got.get(k)!r}")
    assert not mismatches, f"{len(mismatches)}/120 soup docs mismatched"
