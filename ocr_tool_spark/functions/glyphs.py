"""Fixed 5x7 glyph-template font + deterministic raster rendering.

This module is *data plus a renderer*: the fixture generator uses it to
rasterize synthetic scanned pages / embedded-PDF pages (FIXTURES.md
§1.2), and the OCR engine (functions/ocr.py) and the plain-Python
reference spec (tests/refspec.py) both build their template dictionaries
from the same GLYPHS table. Recognition is exact trimmed-pattern lookup,
so OCR is deterministic and float-free (SURVEY.md §7 hard-part #4).

Font invariants, asserted in tests/test_refspec.py:
- every glyph's trimmed pattern is unique (no recognition collisions);
- no glyph has an interior all-blank column (column-projection
  segmentation can never split a glyph in two).

Bitmaps: uint8, 0 = white, 255 = ink, row-major.
"""

from __future__ import annotations

import numpy as np

from ocr_tool_spark.constants import (
    CELL_H,
    CELL_W,
    COLUMN_GUTTER,
    GLYPH_H,
    GLYPH_W,
    PAGE_MARGIN,
    PARA_GAP,
)

INK = 255

# 5x7 font: A-Z, 0-9, '.', ',', '-'; ' ' renders as an empty cell.
_RAW = {
    "A": ["01110", "10001", "10001", "11111", "10001", "10001", "10001"],
    "B": ["11110", "10001", "10001", "11110", "10001", "10001", "11110"],
    "C": ["01110", "10001", "10000", "10000", "10000", "10001", "01110"],
    "D": ["11110", "10001", "10001", "10001", "10001", "10001", "11110"],
    "E": ["11111", "10000", "10000", "11110", "10000", "10000", "11111"],
    "F": ["11111", "10000", "10000", "11110", "10000", "10000", "10000"],
    "G": ["01110", "10001", "10000", "10111", "10001", "10001", "01111"],
    "H": ["10001", "10001", "10001", "11111", "10001", "10001", "10001"],
    "I": ["01110", "00100", "00100", "00100", "00100", "00100", "01110"],
    "J": ["00111", "00010", "00010", "00010", "00010", "10010", "01100"],
    "K": ["10001", "10010", "10100", "11000", "10100", "10010", "10001"],
    "L": ["10000", "10000", "10000", "10000", "10000", "10000", "11111"],
    "M": ["10001", "11011", "10101", "10101", "10001", "10001", "10001"],
    "N": ["10001", "10001", "11001", "10101", "10011", "10001", "10001"],
    "O": ["01110", "10001", "10001", "10001", "10001", "10001", "01110"],
    "P": ["11110", "10001", "10001", "11110", "10000", "10000", "10000"],
    "Q": ["01110", "10001", "10001", "10001", "10101", "10010", "01101"],
    "R": ["11110", "10001", "10001", "11110", "10100", "10010", "10001"],
    "S": ["01111", "10000", "10000", "01110", "00001", "00001", "11110"],
    "T": ["11111", "00100", "00100", "00100", "00100", "00100", "00100"],
    "U": ["10001", "10001", "10001", "10001", "10001", "10001", "01110"],
    "V": ["10001", "10001", "10001", "10001", "10001", "01010", "00100"],
    "W": ["10001", "10001", "10001", "10101", "10101", "10101", "01010"],
    "X": ["10001", "10001", "01010", "00100", "01010", "10001", "10001"],
    "Y": ["10001", "10001", "01010", "00100", "00100", "00100", "00100"],
    "Z": ["11111", "00001", "00010", "00100", "01000", "10000", "11111"],
    "0": ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    "1": ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    "2": ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    "3": ["11111", "00010", "00100", "00010", "00001", "10001", "01110"],
    "4": ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    "5": ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    "6": ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    "7": ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    "8": ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    "9": ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
    ".": ["00000", "00000", "00000", "00000", "00000", "01100", "01100"],
    ",": ["00000", "00000", "00000", "00000", "00100", "00100", "01000"],
    "-": ["00000", "00000", "00000", "01110", "00000", "00000", "00000"],
}

#: char -> (GLYPH_H, GLYPH_W) uint8 array with values {0, INK}.
GLYPHS: dict[str, np.ndarray] = {
    ch: (np.array([[int(b) for b in row] for row in rows], dtype=np.uint8) * INK)
    for ch, rows in _RAW.items()
}


def trimmed_pattern(arr: np.ndarray) -> bytes:
    """Canonical key for a glyph: the tight-bbox crop as shape+bytes.

    Both OCR implementations recognize a character run by computing this
    key on the run's ink crop and looking it up in TEMPLATES.
    """
    ys, xs = np.nonzero(arr)
    if ys.size == 0:
        return b""
    crop = (arr[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1] > 0).astype(np.uint8)
    return (
        int(crop.shape[0]).to_bytes(2, "little")
        + int(crop.shape[1]).to_bytes(2, "little")
        + np.packbits(crop).tobytes()
    )


#: trimmed-pattern -> char lookup used by OCR.
TEMPLATES: dict[bytes, str] = {trimmed_pattern(g): ch for ch, g in GLYPHS.items()}


# --------------------------------------------------------------------------
# Rendering (fixture/bench generator side)
# --------------------------------------------------------------------------


def render_line(text: str) -> np.ndarray:
    """One text line -> (GLYPH_H, CELL_W*len(text)) bitmap."""
    out = np.zeros((GLYPH_H, CELL_W * max(len(text), 1)), dtype=np.uint8)
    for i, ch in enumerate(text):
        if ch == " ":
            continue
        out[:, i * CELL_W : i * CELL_W + GLYPH_W] = GLYPHS[ch]
    return out


def render_block(lines: list[str]) -> np.ndarray:
    """Paragraph block: lines stacked at CELL_H pitch (1 blank row gap)."""
    width = CELL_W * max((len(ln) for ln in lines), default=1)
    out = np.zeros((CELL_H * len(lines) - 1, width), dtype=np.uint8)
    for i, ln in enumerate(lines):
        bmp = render_line(ln)
        out[i * CELL_H : i * CELL_H + GLYPH_H, : bmp.shape[1]] = bmp
    return out


def render_figure(h: int, w: int) -> np.ndarray:
    """Solid ink blob standing in for a figure: OCR emits no text for it
    (no character run matches a template)."""
    return np.full((h, w), INK, dtype=np.uint8)


def render_page(columns: list[list[np.ndarray]]) -> np.ndarray:
    """Compose a page: columns side by side separated by COLUMN_GUTTER,
    blocks inside a column stacked with PARA_GAP blank rows, PAGE_MARGIN
    border all around."""
    col_bmps = []
    for blocks in columns:
        w = max(b.shape[1] for b in blocks)
        parts = []
        for j, b in enumerate(blocks):
            if j:
                parts.append(np.zeros((PARA_GAP, w), dtype=np.uint8))
            pad = np.zeros((b.shape[0], w), dtype=np.uint8)
            pad[:, : b.shape[1]] = b
            parts.append(pad)
        col_bmps.append(np.vstack(parts))
    h = max(c.shape[0] for c in col_bmps)
    padded = []
    for c in col_bmps:
        p = np.zeros((h, c.shape[1]), dtype=np.uint8)
        p[: c.shape[0], :] = c
        padded.append(p)
    gutter = np.zeros((h, COLUMN_GUTTER), dtype=np.uint8)
    body = padded[0]
    for c in padded[1:]:
        body = np.hstack([body, gutter, c])
    page = np.zeros(
        (body.shape[0] + 2 * PAGE_MARGIN, body.shape[1] + 2 * PAGE_MARGIN),
        dtype=np.uint8,
    )
    page[PAGE_MARGIN : PAGE_MARGIN + body.shape[0], PAGE_MARGIN : PAGE_MARGIN + body.shape[1]] = body
    return page
