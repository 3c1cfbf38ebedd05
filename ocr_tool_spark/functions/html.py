"""Batched HTML -> DOM-block tokenizer + native boilerplate scoring.

Two halves, split exactly at the Python/JVM boundary (SURVEY.md §4):

1. ``dom_blocks_udf`` — the only Python stage of the text branch: an
   Arrow-vectorized pandas UDF turning each HTML string into the
   flattened array-of-structs DOM walk (schemas.DOM_BLOCK). Implemented
   as a single-master-regex token scanner (a deliberately different
   implementation shape from the per-document reference loop in
   tests/refspec.py — the differential tests assert they agree).

2. ``keep_flags_col`` / ``main_text_col`` — Readability-style
   text-density + link-density scoring and main-content assembly as
   pure JVM higher-order functions (transform/zip_with/filter/
   array_join) over the block array: no Python, stays inside
   whole-stage codegen, integer-exact thresholds from constants.py.

At 100 TB the UDF stage is the bottleneck by construction; everything
else on the text branch is native and pipelines within the same task
(no shuffle between tokenize and assemble).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ocr_tool_spark.constants import (
    BLOCK_JOIN,
    BLOCK_TAGS,
    BOILER_TAGS,
    LINK_DEN_DEN,
    LINK_DEN_NUM,
    MIN_BLOCK_CHARS,
    NAMED_ENTITIES,
    RESCUE_MIN_CHARS,
    TEXT_DENSITY_TAU,
)
from ocr_tool_spark.sources.schemas import DOM_BLOCK

# ---------------------------------------------------------------- tokenizer

_TOKEN = re.compile(
    r"(?:<!--.*?(?:-->|$))"
    r"|(?:<script\b[^>]*>.*?(?:</script\s*>|$))"
    r"|(?:<style\b[^>]*>.*?(?:</style\s*>|$))"
    r"|(?P<tag></?(?P<name>[a-zA-Z][a-zA-Z0-9]*)[^>]*>)",
    re.DOTALL | re.IGNORECASE,
)
_WS = re.compile(r"[ \t\n\r\f\v]+")
_ENTITY = re.compile(r"&(?:([a-zA-Z]+)|#(\d+)|#[xX]([0-9a-fA-F]+));")


def _decode(s: str) -> str:
    if "&" not in s:  # entity-free fast path: _ENTITY.sub is identity
        return s

    def repl(m: re.Match) -> str:
        if m.group(1) is not None:
            return NAMED_ENTITIES.get(m.group(1), m.group(0))
        return chr(int(m.group(2)) if m.group(2) is not None else int(m.group(3), 16))

    return _ENTITY.sub(repl, s)


def _collapse(s: str) -> str:
    """Collapse runs of [ \\t\\n\\r\\f\\v]+ to one space and strip —
    bit-equal to `_WS.sub(" ", s).strip(" ")` (asserted over 200k
    adversarial strings incl. \\x1c-\\x1f and Unicode whitespace, which
    BOTH versions leave untouched) but ~7x faster: memchr-backed
    replaces only when the char is present, then a split/join that
    collapses and strips in one pass."""
    if "\t" in s:
        s = s.replace("\t", " ")
    if "\n" in s:
        s = s.replace("\n", " ")
    if "\r" in s:
        s = s.replace("\r", " ")
    if "\f" in s:
        s = s.replace("\f", " ")
    if "\v" in s:
        s = s.replace("\v", " ")
    if "  " in s:
        return " ".join([x for x in s.split(" ") if x])
    return s.strip(" ")


# raw (case-preserved) tag name -> (is_block, is_boiler, is_br, is_a):
# real corpora reuse a few dozen spellings, so one dict hit replaces a
# lower() allocation plus up to four set probes per tag token. Bounded
# against adversarial unique-name streams.
_TAG_INFO: dict[str, tuple[bool, bool, bool, bool]] = {}
_TAG_INFO_MAX = 4096


def _classify_tag(raw: str) -> tuple[bool, bool, bool, bool]:
    n = raw.lower()
    info = (n in BLOCK_TAGS, n in BOILER_TAGS, n == "br", n == "a")
    if len(_TAG_INFO) < _TAG_INFO_MAX:
        _TAG_INFO[raw] = info
    return info


def dom_blocks(html: str | None) -> list[dict]:
    """One HTML string -> list of DOM_BLOCK dicts. Linear single pass
    over master-regex tokens; block-tag boundaries flush text blocks."""
    if not html:
        return []
    blocks: list[dict] = []
    plain: list[str] = []
    linked: list[str] = []
    n_tags = 0
    link_depth = 0
    boiler_depth = 0

    def flush() -> None:
        nonlocal n_tags
        if not plain:  # tag-only boundary (e.g. </div><div>): no block
            n_tags = 0
            return
        full = _collapse("".join(plain))
        if full:
            blocks.append(
                {
                    "text": full,
                    "n_chars": len(full),
                    "n_link_chars": len(_collapse("".join(linked))) if linked else 0,
                    "n_tags": n_tags,
                    "in_boiler": boiler_depth > 0,
                }
            )
        plain.clear()
        linked.clear()
        n_tags = 0

    pos = 0
    tag_info = _TAG_INFO  # local binding for the hot loop
    for m in _TOKEN.finditer(html):
        start = m.start()
        if start > pos:
            piece = _decode(html[pos:start])
            plain.append(piece)
            if link_depth > 0:
                linked.append(piece)
        pos = m.end()
        name = m.group(2)  # _TOKEN group "name"
        if name is None:  # comment / script / style — skipped wholesale
            continue
        info = tag_info.get(name)
        if info is None:
            info = _classify_tag(name)
        is_block, is_boiler, is_br, is_a = info
        # the tag group starts at the match start, so the char after
        # '<' decides closing — no per-tag substring allocation
        closing = html[start + 1] == "/"
        if is_block:
            if plain:
                flush()
            else:  # tag-only boundary: flush() would just reset
                n_tags = 0
            if is_boiler:
                boiler_depth = max(boiler_depth + (-1 if closing else 1), 0)
        else:
            if not closing:
                n_tags += 1
                if is_br:
                    plain.append("\n")
                    if link_depth > 0:
                        linked.append("\n")
            if is_a:
                link_depth = max(link_depth + (-1 if closing else 1), 0)
    if pos < len(html):
        piece = _decode(html[pos:])
        plain.append(piece)
        if link_depth > 0:
            linked.append(piece)
    flush()
    return blocks


@F.pandas_udf(ArrayType(DOM_BLOCK))
def dom_blocks_udf(html: pd.Series) -> pd.Series:
    return html.map(dom_blocks)


# ----------------------------------------------------- native HOF scoring


def _link_ok(b: Column) -> Column:
    return F.lit(LINK_DEN_DEN) * b["n_link_chars"] <= F.lit(LINK_DEN_NUM) * b["n_chars"]


def _primary(b: Column) -> Column:
    return (
        ~b["in_boiler"]
        & _link_ok(b)
        & (b["n_chars"] >= F.lit(MIN_BLOCK_CHARS))
        & (b["n_chars"] >= F.lit(TEXT_DENSITY_TAU) * (F.lit(1) + b["n_tags"]))
    )


def keep_flags_col(blocks: Column) -> Column:
    """array<DOM_BLOCK> -> array<boolean>: primary densitometry rule plus
    neighbour rescue of short sandwiched blocks — all JVM-side."""
    prim = F.transform(blocks, _primary)
    return F.transform(
        blocks,
        lambda b, i: _primary(b)
        | (
            ~b["in_boiler"]
            & _link_ok(b)
            & (b["n_chars"] >= F.lit(RESCUE_MIN_CHARS))
            & F.coalesce(F.get(prim, i - 1), F.lit(False))
            & F.coalesce(F.get(prim, i + 1), F.lit(False))
        ),
    )


def main_text_col(blocks: Column) -> Column:
    """array<DOM_BLOCK> -> string: kept block texts joined by BLOCK_JOIN."""
    kept = F.zip_with(blocks, keep_flags_col(blocks), lambda b, k: F.when(k, b["text"]))
    return F.array_join(F.filter(kept, lambda t: t.isNotNull()), BLOCK_JOIN)


def with_main_text(df, html_col: str, out_col: str):
    """Text branch over a DataFrame: materialize the UDF's block array
    in one projection, then score+assemble natively in the next.
    (Catalyst rejects a Python UDF nested inside a lambda function, so
    the tokenizer output must be a bound column before the HOFs see it.)
    """
    return (
        df.withColumn("_blocks", dom_blocks_udf(F.col(html_col)))
        .withColumn(out_col, main_text_col(F.col("_blocks")))
        .drop("_blocks")
    )
