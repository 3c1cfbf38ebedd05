"""ocr_tool_spark — a from-scratch, PySpark-native main-content
extraction engine over interleaved text+media document tables.

Capability target: the driver spec at /root/repo/BASELINE.json
(north_star line 6, north_rule line 14, input_hint line 15). The
reference checkout at /root/reference is EMPTY (SURVEY.md §0), so no
reference file:line citations exist anywhere in this package — the
executable semantics oracle is tests/refspec.py.

Layout
------
constants    shared *data* (tag sets, integer thresholds, entities,
             raster geometry) used by the engine, the fixture
             generator, and the independent plain-Python reference
             spec in tests/refspec.py
functions/   glyph font + rendering, batched HTML tokenizer,
             batched numpy layout/OCR, text-analysis functions
operators/   explode/route, (salted) reassembly, span equality,
             dedup + similarity operators
sources/     parquet table loaders + the snapshot/manifest table
             store (local Iceberg stand-in)
plans/       the end-to-end extraction plan builder + resumable runner
streaming/   Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
