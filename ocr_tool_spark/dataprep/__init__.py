"""Training-data pipeline operators (dedup, similarity, textstats,
media). See SURVEY.md §2 K1-K16."""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_intermediates(df: DataFrame) -> None:
    """Unpersist the cached intermediates a dataprep operator pinned
    for its multi-consumer subtrees (LSH candidates, shingle sets,
    simhash signatures). Call AFTER materializing `df`; the frames are
    recorded on the returned DataFrame as `_ocr_persisted` by the
    operator that created them.

    Why callers own this: the operators return LAZY frames, so the
    operator itself can never know when the caches stop being needed —
    and in a long-lived session (the driver evaluates 50+ queries in
    one SparkSession) un-released MEMORY_AND_DISK blocks accumulate
    until context shutdown (ADVICE r3). Blocks are spill-safe, so the
    leak degrades memory headroom, not correctness; clearCache() also
    clears them wholesale (bench.py's behavior)."""
    for handle in getattr(df, "_ocr_persisted", ()):  # noqa: SLF001
        try:
            handle.unpersist()
        except Exception:  # session already stopped: nothing to free
            pass
