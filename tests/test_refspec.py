"""Unit tests of the executable reference spec itself (SURVEY.md §5.1):
font invariants + hand-computed micro-cases for tokenizer, scoring,
XY-cut, reading order, and template OCR. No Spark here."""

from __future__ import annotations

import numpy as np
import pytest

import refspec
from ocr_tool_spark import fixtures
from ocr_tool_spark.constants import CELL_W, GLYPH_W, MIN_GAP_X, PAGE_MARGIN
from ocr_tool_spark.functions import glyphs


# ------------------------------------------------------------------ font


def test_font_patterns_unique():
    pats = [glyphs.trimmed_pattern(g) for g in glyphs.GLYPHS.values()]
    assert len(set(pats)) == len(pats)


def test_font_no_interior_blank_column():
    for ch, g in glyphs.GLYPHS.items():
        cols = (g > 0).any(axis=0)
        idx = np.nonzero(cols)[0]
        assert cols[idx[0] : idx[-1] + 1].all(), f"glyph {ch!r} splits on column projection"


def test_font_word_gap_bounds():
    # trailing blanks in cell + leading blanks of next glyph must stay
    # below SPACE_GAP (6); a space cell must push the gap to >= 6.
    lead, trail = {}, {}
    for ch, g in glyphs.GLYPHS.items():
        cols = np.nonzero((g > 0).any(axis=0))[0]
        lead[ch] = int(cols[0])
        trail[ch] = (CELL_W - 1) - int(cols[-1])  # incl. the cell pad column
    max_nospace = max(trail.values()) + max(lead.values())
    min_space = min(trail.values()) + CELL_W + min(lead.values())
    assert max_nospace < 6 <= min_space


# ------------------------------------------------------------- text branch


def test_collapse_and_entities():
    assert refspec.collapse_ws("  a\t\nb  ") == "a b"
    assert refspec.decode_entities("a &amp; b &#65; &#x42; &nbsp;") == "a & b A B  "
    # no double decoding
    assert refspec.decode_entities("&amp;lt;") == "&lt;"
    assert refspec.decode_entities("&unknown;") == "&unknown;"


def test_tokenize_blocks_basic():
    html = "<html><body><p>Hello <em>world</em> now</p><p>Bye</p></body></html>"
    blocks = refspec.tokenize_blocks(html)
    assert [b["text"] for b in blocks] == ["Hello world now", "Bye"]
    assert blocks[0]["n_tags"] == 1
    assert blocks[0]["n_chars"] == len("Hello world now")
    assert not blocks[0]["in_boiler"]


def test_tokenize_boiler_and_links():
    html = (
        "<body><nav><ul><li><a>home</a></li><li><a>about</a></li></ul></nav>"
        "<p>main content here with <a>one link</a> inside</p></body>"
    )
    blocks = refspec.tokenize_blocks(html)
    # nav produces li blocks marked boiler
    boiler = [b for b in blocks if b["in_boiler"]]
    main = [b for b in blocks if not b["in_boiler"]]
    assert {b["text"] for b in boiler} == {"home", "about"}
    assert len(main) == 1
    assert main[0]["text"] == "main content here with one link inside"
    assert main[0]["n_link_chars"] == len("one link")


def test_tokenize_skips_script_style_comment():
    html = "<body><script>var x = 1 < 2;</script><!-- hidden --><style>p{}</style><p>real text that is long enough ok</p></body>"
    blocks = refspec.tokenize_blocks(html)
    assert len(blocks) == 1
    assert blocks[0]["text"].startswith("real text")


def test_stray_lt_is_literal():
    blocks = refspec.tokenize_blocks("<p>a < b and c</p>")
    assert blocks[0]["text"] == "a < b and c"


def test_keep_rules():
    long = "x" * 30
    blocks = refspec.tokenize_blocks(
        f"<body><p>{long}</p><p>caption</p><p>{long}</p>"
        f"<div><a>{'y' * 40}</a></div><p>sm</p></body>"
    )
    keep = refspec.keep_flags(blocks)
    # long kept; 'caption' (7 chars >= RESCUE_MIN_CHARS) rescued between
    # two kept longs; link farm dropped (link density 1.0); trailing
    # 'sm' (2 chars < RESCUE_MIN_CHARS) dropped
    assert keep == [True, True, True, False, False]
    assert refspec.extract_main_text(
        f"<body><p>{long}</p><p>caption</p><p>{long}</p></body>"
    ) == f"{long}\ncaption\n{long}"


def test_density_rule_drops_tag_soup():
    # 9 inline tags, 20 chars -> n_chars < 8*(1+9); and < MIN_BLOCK_CHARS
    html = "<p>" + "".join(f"<b>ab</b>" for _ in range(10)) + "</p>"
    blocks = refspec.tokenize_blocks(html)
    assert blocks[0]["n_tags"] == 10
    assert refspec.keep_flags(blocks) == [False]


# ------------------------------------------------------------ media branch


def test_render_ocr_roundtrip_single_line():
    page = glyphs.render_page([[glyphs.render_block(["HELLO WORLD"])]])
    assert refspec.ocr_page(page) == "HELLO WORLD"


def test_render_ocr_roundtrip_punct_digits():
    page = glyphs.render_page([[glyphs.render_block(["AB-12.3,X 9"])]])
    assert refspec.ocr_page(page) == "AB-12.3,X 9"


def test_multicolumn_reading_order():
    left = glyphs.render_block(["AAA BBB", "CCC"])
    right = glyphs.render_block(["DDD", "EEE FFF"])
    page = glyphs.render_page([[left], [right]])
    assert refspec.ocr_page(page) == "AAA BBB\nCCC\nDDD\nEEE FFF"


def test_three_column_with_figure():
    c1 = [glyphs.render_block(["ONE"]), glyphs.render_block(["TWO"])]
    c2 = [glyphs.render_figure(16, 30)]
    c3 = [glyphs.render_block(["THREE"])]
    page = glyphs.render_page([c1, c2, c3])
    assert refspec.ocr_page(page) == "ONE\nTWO\nTHREE"


def test_multipage_pdf_join():
    p1 = glyphs.render_page([[glyphs.render_block(["PAGE ONE"])]])
    p2 = glyphs.render_page([[glyphs.render_block(["PAGE TWO"])]])
    h, w = max(p.shape[0] for p in (p1, p2)), max(p.shape[1] for p in (p1, p2))
    stack = np.zeros((2, h, w), dtype=np.uint8)
    stack[0, : p1.shape[0], : p1.shape[1]] = p1
    stack[1, : p2.shape[0], : p2.shape[1]] = p2
    assert refspec.ocr_media(stack.tobytes(), w, h, 2) == "PAGE ONE\n\nPAGE TWO"


def test_xycut_splits_columns_before_rows():
    page = glyphs.render_page(
        [[glyphs.render_block(["AA"]), glyphs.render_block(["BB"])], [glyphs.render_block(["CC"])]]
    )
    leaves = refspec.xycut(page)
    assert len(leaves) == 3
    ordered = refspec.reading_order(leaves)
    texts = [refspec.ocr_block(page, b) for b in ordered]
    assert texts == ["AA", "BB", "CC"]


def test_xycut_empty_page():
    assert refspec.xycut(np.zeros((40, 40), dtype=np.uint8)) == []
    assert refspec.ocr_page(np.zeros((40, 40), dtype=np.uint8)) == ""


# ----------------------------------------------------------- whole corpus


def test_fixture_generator_deterministic():
    docs1, media1 = fixtures.gen_corpus(40, seed=42)
    docs2, media2 = fixtures.gen_corpus(40, seed=42)
    assert docs1 == docs2
    assert media1[0]["bitmap"] == media2[0]["bitmap"]
    # skew doc exists and is media-heavy
    n_media_spans = sum(
        1 for s in docs1[0]["spans"] if s["kind"] == "media"
    )
    assert n_media_spans >= 14


def test_refspec_extracts_whole_corpus():
    docs, media = fixtures.gen_corpus(30, seed=42)
    store = {m["media_ref"]: m for m in media}
    for doc in docs:
        out = refspec.extract_document(doc, store)
        assert out["doc_id"] == doc["doc_id"]
        assert len(out["spans"]) == len(doc["spans"])
        for s_in, s_out in zip(
            sorted(doc["spans"], key=lambda s: s["offset"]), out["spans"]
        ):
            assert s_out["kind"] == s_in["kind"]
            assert s_out["media_ref"] == s_in["media_ref"]
            assert s_out["offset"] == s_in["offset"]
            assert s_out["text"] is not None
