"""Executable reference specification (SURVEY.md §0.1, §5 item 1).

The reference checkout at /root/reference is EMPTY, so the semantics of
the per-document extraction loop described by /root/repo/BASELINE.json:6
are *defined* here as a deliberately simple, per-document, loop-based
Python implementation. The batched Spark engine in ocr_tool_spark/ is a
second, independently-written implementation of the same semantics; the
golden-fixture tests assert exact span-sequence equality between the
two on (kind, text, media_ref, order) per doc_id (BASELINE.json:15).

Shared with the engine: only *data* — ocr_tool_spark.constants
(thresholds, tag sets, entities, geometry) and the glyph font table
(ocr_tool_spark.functions.glyphs.GLYPHS/TEMPLATES). All algorithms here
are written independently of the engine's vectorized versions.
"""

from __future__ import annotations

import re

import numpy as np

from ocr_tool_spark.constants import (
    BLOCK_JOIN,
    BLOCK_TAGS,
    BOILER_TAGS,
    KIND_MEDIA,
    KIND_TEXT,
    LINK_DEN_DEN,
    LINK_DEN_NUM,
    MIN_BLOCK_CHARS,
    MIN_GAP_X,
    MIN_GAP_Y,
    NAMED_ENTITIES,
    OCR_LINE_JOIN,
    OCR_PAGE_JOIN,
    RAW_SKIP_TAGS,
    RESCUE_MIN_CHARS,
    SPACE_GAP,
    TEXT_DENSITY_TAU,
)
from ocr_tool_spark.functions.glyphs import TEMPLATES, trimmed_pattern

# --------------------------------------------------------------------------
# Text branch: HTML -> main content
# --------------------------------------------------------------------------

_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
_ENTITY_RE = re.compile(r"&(?:([a-zA-Z]+)|#(\d+)|#[xX]([0-9a-fA-F]+));")
_TAG_RE = re.compile(r"</?([a-zA-Z][a-zA-Z0-9]*)[^>]*>")


def collapse_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip(" ")


def decode_entities(s: str) -> str:
    def repl(m: re.Match) -> str:
        if m.group(1) is not None:
            return NAMED_ENTITIES.get(m.group(1), m.group(0))
        if m.group(2) is not None:
            return chr(int(m.group(2)))
        return chr(int(m.group(3), 16))

    return _ENTITY_RE.sub(repl, s)


def tokenize_blocks(html: str) -> list[dict]:
    """Linear scan: block-tag boundaries delimit text blocks; returns a
    list of dicts (text, n_chars, n_link_chars, n_tags, in_boiler)."""
    blocks: list[dict] = []
    pieces: list[tuple[str, bool]] = []  # (decoded text, inside <a>)
    n_tags = 0
    link_depth = 0
    boiler_depth = 0
    i = 0
    n = len(html)

    def flush() -> None:
        nonlocal pieces, n_tags
        full = collapse_ws("".join(t for t, _ in pieces))
        if full:
            link_txt = collapse_ws("".join(t for t, in_a in pieces if in_a))
            blocks.append(
                {
                    "text": full,
                    "n_chars": len(full),
                    "n_link_chars": len(link_txt),
                    "n_tags": n_tags,
                    "in_boiler": boiler_depth > 0,
                }
            )
        pieces = []
        n_tags = 0

    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            pieces.append((decode_entities(html[i:]), link_depth > 0))
            break
        if lt > i:
            pieces.append((decode_entities(html[i:lt]), link_depth > 0))
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        m = _TAG_RE.match(html, lt)
        if m is None:
            pieces.append(("<", link_depth > 0))
            i = lt + 1
            continue
        name = m.group(1).lower()
        closing = html[lt + 1] == "/"
        i = m.end()
        if name in RAW_SKIP_TAGS and not closing:
            close = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(html, i)
            i = n if close is None else close.end()
            continue
        if name in BLOCK_TAGS:
            flush()
            if name in BOILER_TAGS:
                boiler_depth += -1 if closing else 1
                boiler_depth = max(boiler_depth, 0)
        else:
            # inline-ish tag (declared inline or unknown)
            if not closing:
                n_tags += 1
                if name == "br":
                    pieces.append(("\n", link_depth > 0))
            if name == "a":
                link_depth += -1 if closing else 1
                link_depth = max(link_depth, 0)
    flush()
    return blocks


def primary_keep(b: dict) -> bool:
    return (
        not b["in_boiler"]
        and LINK_DEN_DEN * b["n_link_chars"] <= LINK_DEN_NUM * b["n_chars"]
        and b["n_chars"] >= MIN_BLOCK_CHARS
        and b["n_chars"] >= TEXT_DENSITY_TAU * (1 + b["n_tags"])
    )


def keep_flags(blocks: list[dict]) -> list[bool]:
    prim = [primary_keep(b) for b in blocks]
    out = []
    for idx, b in enumerate(blocks):
        k = prim[idx]
        if not k:
            k = (
                not b["in_boiler"]
                and LINK_DEN_DEN * b["n_link_chars"] <= LINK_DEN_NUM * b["n_chars"]
                and b["n_chars"] >= RESCUE_MIN_CHARS
                and 0 < idx < len(blocks) - 1
                and prim[idx - 1]
                and prim[idx + 1]
            )
        out.append(k)
    return out


def extract_main_text(html: str) -> str:
    blocks = tokenize_blocks(html)
    keep = keep_flags(blocks)
    return BLOCK_JOIN.join(b["text"] for b, k in zip(blocks, keep) if k)


# --------------------------------------------------------------------------
# Media branch: bitmap -> XY-cut blocks -> reading order -> OCR text
# --------------------------------------------------------------------------


def decode_bitmap(bitmap: bytes, width: int, height: int, n_pages: int) -> np.ndarray:
    return np.frombuffer(bitmap, dtype=np.uint8).reshape(n_pages, height, width)


def _zero_runs(profile: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) runs where profile == 0."""
    runs = []
    start = None
    for i, v in enumerate(profile):
        if v == 0:
            if start is None:
                start = i
        elif start is not None:
            runs.append((start, i))
            start = None
    if start is not None:
        runs.append((start, len(profile)))
    return runs


def _trim(page: np.ndarray, y0: int, y1: int, x0: int, x1: int):
    sub = page[y0:y1, x0:x1]
    rows = sub.any(axis=1)
    cols = sub.any(axis=0)
    if not rows.any():
        return None
    ys = np.nonzero(rows)[0]
    xs = np.nonzero(cols)[0]
    return (y0 + int(ys[0]), y0 + int(ys[-1]) + 1, x0 + int(xs[0]), x0 + int(xs[-1]) + 1)


def xycut(page: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Recursive XY-cut (Nagy–Seth projection-profile splitting, [public]).

    At each level: trim to the ink bbox; collect interior all-blank runs
    of columns (>= MIN_GAP_X wide) and rows (>= MIN_GAP_Y tall); cut
    along the axis with the widest qualifying gap (ties prefer vertical
    column cuts) at ALL qualifying gaps; recurse. No qualifying gap on
    either axis -> emit the trimmed bbox as a leaf block.
    """
    leaves: list[tuple[int, int, int, int]] = []

    def rec(y0: int, y1: int, x0: int, x1: int) -> None:
        t = _trim(page, y0, y1, x0, x1)
        if t is None:
            return
        y0, y1, x0, x1 = t
        sub = page[y0:y1, x0:x1]
        col_runs = [r for r in _zero_runs(sub.any(axis=0).astype(np.int64)) if r[1] - r[0] >= MIN_GAP_X]
        row_runs = [r for r in _zero_runs(sub.any(axis=1).astype(np.int64)) if r[1] - r[0] >= MIN_GAP_Y]
        x_max = max((r[1] - r[0] for r in col_runs), default=0)
        y_max = max((r[1] - r[0] for r in row_runs), default=0)
        if x_max == 0 and y_max == 0:
            leaves.append((y0, y1, x0, x1))
            return
        if x_max >= y_max:
            cuts, lo, hi, vertical = col_runs, x0, x1, True
        else:
            cuts, lo, hi, vertical = row_runs, y0, y1, False
        prev = lo
        for s, e in cuts:
            seg_lo, seg_hi = prev, lo + s
            prev = lo + e
            if seg_hi > seg_lo:
                if vertical:
                    rec(y0, y1, seg_lo, seg_hi)
                else:
                    rec(seg_lo, seg_hi, x0, x1)
        if hi > prev:
            if vertical:
                rec(y0, y1, prev, hi)
            else:
                rec(prev, hi, x0, x1)

    rec(0, page.shape[0], 0, page.shape[1])
    return leaves


def reading_order(blocks: list[tuple[int, int, int, int]]) -> list[tuple[int, int, int, int]]:
    """Column-band reading order: greedy x-overlap bands left->right,
    then (y0, x0) within a band."""
    if not blocks:
        return []
    by_x = sorted(blocks, key=lambda b: (b[2], b[0]))
    bands: list[list[tuple[int, int, int, int]]] = []
    band_end = -1
    for b in by_x:
        if bands and b[2] < band_end:
            bands[-1].append(b)
            band_end = max(band_end, b[3])
        else:
            bands.append([b])
            band_end = b[3]
    out = []
    for band in bands:
        out.extend(sorted(band, key=lambda b: (b[0], b[2])))
    return out


def ocr_block(page: np.ndarray, bbox: tuple[int, int, int, int]) -> str:
    """Template OCR of one leaf block: row-projection line bands; per
    line, column-projection character runs; gaps >= SPACE_GAP decode as
    one space; each run's tight-bbox pattern is looked up exactly in the
    glyph TEMPLATES (unknown pattern -> no character, so figure blobs
    contribute nothing)."""
    y0, y1, x0, x1 = bbox
    crop = page[y0:y1, x0:x1]
    lines = []
    row_ink = crop.any(axis=1).astype(np.int64)
    for ls, le in _ink_runs(row_ink):
        band = crop[ls:le]
        col_ink = band.any(axis=0).astype(np.int64)
        chars: list[str] = []
        prev_end = None
        for cs, ce in _ink_runs(col_ink):
            if prev_end is not None and cs - prev_end >= SPACE_GAP and chars:
                chars.append(" ")
            ch = TEMPLATES.get(trimmed_pattern(band[:, cs:ce]))
            if ch is not None:
                chars.append(ch)
            prev_end = ce
        line = "".join(chars).strip(" ")
        if line:
            lines.append(line)
    return OCR_LINE_JOIN.join(lines)


def _ink_runs(profile: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) runs where profile != 0."""
    runs = []
    start = None
    for i, v in enumerate(profile):
        if v != 0:
            if start is None:
                start = i
        elif start is not None:
            runs.append((start, i))
            start = None
    if start is not None:
        runs.append((start, len(profile)))
    return runs


def ocr_page(page: np.ndarray) -> str:
    ordered = reading_order(xycut(page))
    texts = [t for t in (ocr_block(page, b) for b in ordered) if t]
    return OCR_LINE_JOIN.join(texts)


def ocr_media(bitmap: bytes, width: int, height: int, n_pages: int) -> str:
    pages = decode_bitmap(bitmap, width, height, n_pages)
    texts = [t for t in (ocr_page(pages[p]) for p in range(n_pages)) if t]
    return OCR_PAGE_JOIN.join(texts)


# --------------------------------------------------------------------------
# Whole-document reference extraction
# --------------------------------------------------------------------------


def extract_document(doc: dict, media_store: dict[str, dict]) -> dict:
    """doc: {doc_id, spans:[{kind,text,media_ref,offset}]};
    media_store: media_ref -> {width,height,n_pages,bitmap}.
    Returns the expected output doc: same shape, spans ordered by
    offset, text replaced by extracted content (BASELINE.json:15)."""
    out_spans = []
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        if span["kind"] == KIND_TEXT:
            out_spans.append(
                {
                    "kind": KIND_TEXT,
                    "text": extract_main_text(span["text"]),
                    "media_ref": None,
                    "offset": span["offset"],
                }
            )
        else:
            m = media_store[span["media_ref"]]
            out_spans.append(
                {
                    "kind": KIND_MEDIA,
                    "text": ocr_media(m["bitmap"], m["width"], m["height"], m["n_pages"]),
                    "media_ref": span["media_ref"],
                    "offset": span["offset"],
                }
            )
    return {"doc_id": doc["doc_id"], "spans": out_spans}
