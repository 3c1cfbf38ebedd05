"""The flagship extraction plan (BASELINE.json:6; SURVEY.md §3.1).

    explode -> route
      text branch : dom_blocks_udf (one Python stage) -> native HOF
                    densitometry scoring + assembly
      media branch: distinct media_ref semi-join into media_store ->
                    fused XY-cut + reading-order + template-OCR UDF
                    (one Python stage, one OCR per *distinct* ref) ->
                    joined back to spans
    -> unionByName -> (optionally salted) reassembly by (doc_id, offset)

Scale shape: the text branch has exactly one shuffle (reassembly); the
media branch adds the ref-dedup exchange + the results join. When the
referenced-media side fits the broadcast threshold the results join is
a broadcast hash join; at 10^12-doc scale it degrades gracefully to a
shuffled join that AQE can skew-split. OCR-per-distinct-ref trades one
extra exchange for never OCR-ing a shared scan twice — at mostly-unique
media it costs ~nothing (the exchange carries refs, not bitmaps).

Verified with the event-log profile (scripts/scaling_bench.py): the
two dominant stages — text scan→explode→DOM-UDF→partial-agg and
semi-join→page-explode→OCR-UDF→page-regroup — each run at 0.85-0.98
task-parallel utilization at 32 cores; the plan has no serial hot
spot. Known, accepted cost: the docs table is scanned three times
(text branch, media branch, distinct-ref derivation — the last is
column-pruned to `spans` only). Fusing them needs a cache/checkpoint
barrier whose write cost exceeds a pruned columnar re-scan at every
scale we measured; the resumable runner persists the exploded frame
instead, which serves the same purpose per partition batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_tool_spark.constants import KIND_MEDIA, KIND_TEXT, OCR_PAGE_JOIN
from ocr_tool_spark.functions.html import with_main_text
from ocr_tool_spark.functions.ocr import ocr_media_udf
from ocr_tool_spark.operators.spans import explode_spans, reassemble, route


def ocr_referenced_media(
    media_spans: DataFrame, media_store: DataFrame, per_page: bool = True
) -> DataFrame:
    """-> (media_ref, text, ocr_ms): one OCR invocation per distinct
    referenced media payload.

    per_page=True explodes multi-page payloads into one row per page
    BEFORE the Python stage (JVM-side binary slicing), so the OCR work
    unit is a page, not a whole PDF: a 5-page scan no longer holds a
    task slot 5x longer than its peers (the straggler tail of the OCR
    stage is the dominant skew at scale). Page texts are re-joined per
    payload by a small-text shuffle; ocr_ms is the summed page cost so
    lineage percentiles keep meaning.
    """
    refs = media_spans.select("media_ref").distinct()
    needed = media_store.join(refs, "media_ref", "left_semi")
    res = F.col("_ocr")
    if not per_page:
        return (
            needed.withColumn(
                "_ocr", ocr_media_udf("bitmap", "width", "height", "n_pages")
            )
            .select(
                "media_ref",
                res["text"].alias("text"),
                res["ocr_ms"].alias("ocr_ms"),
            )
        )
    # n_pages <= 0 (empty/malformed media) must degrade to "" like the
    # single-call read_media path — without the guard, sequence(0, -1)
    # yields a descending [0,-1] and the UDF reshape crashes the job
    pages = needed.filter(F.col("n_pages") > 0).select(
        "media_ref",
        "width",
        "height",
        F.posexplode(
            F.expr(
                "transform(sequence(0, n_pages - 1), "
                "p -> substring(bitmap, p * height * width + 1, height * width))"
            )
        ).alias("page_idx", "page"),
    )
    # OCR-stage task granularity: AQE coalesces the upstream semi-join
    # output by BYTE size, but OCR cost-per-byte is ~1000x the rest of
    # the plan, so byte-balanced partitions under-parallelize the most
    # expensive stage (measured: 11 coalesced tasks on 8 cores with a
    # 38 s straggler -> stage util 0.77). Round-robin the exploded
    # pages to 8x parallelism UNCONDITIONALLY: the old
    # .rdd.getNumPartitions() probe forced AQE to materialize the
    # semi-join's query stages at plan-construction time — the shuffle
    # ran once for the probe and again for the real action (ADVICE r3,
    # medium) — and AQE coalescing meant the repartition fired anyway.
    # 8*cores work units is the right OCR granularity at every scale;
    # the shuffle it costs is the page frame itself, which the OCR
    # stage dwarfs ~1000x.
    par = media_spans.sparkSession.sparkContext.defaultParallelism
    pages = pages.repartition(8 * par)
    per = pages.withColumn(
        "_ocr", ocr_media_udf("page", "width", "height", F.lit(1))
    ).select(
        "media_ref",
        "page_idx",
        res["text"].alias("_pt"),
        res["ocr_ms"].alias("_pms"),
    )
    # reassemble pages in order; empty pages are skipped, matching the
    # single-call read_media semantics exactly
    return (
        per.groupBy("media_ref")
        .agg(
            F.array_sort(F.collect_list(F.struct("page_idx", "_pt"))).alias("_ps"),
            F.sum("_pms").alias("ocr_ms"),
        )
        .select(
            "media_ref",
            F.array_join(
                F.filter(
                    F.transform("_ps", lambda s: s["_pt"]), lambda t: t != ""
                ),
                OCR_PAGE_JOIN,
            ).alias("text"),
            "ocr_ms",
        )
    )


def extract_spans(
    docs: DataFrame,
    media_store: DataFrame | None = None,
    broadcast_media: bool = True,
) -> DataFrame:
    """Span-level extraction: one row per span with extracted text.
    Columns: doc_id, kind, text, media_ref, offset, ocr_ms (null on the
    text branch)."""
    spans = explode_spans(docs)
    text_spans, media_spans = route(spans)

    text_out = with_main_text(
        text_spans.select("doc_id", "text", "offset"), "text", "_main"
    ).select(
        "doc_id",
        F.lit(KIND_TEXT).alias("kind"),
        F.col("_main").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        "offset",
        F.lit(None).cast("double").alias("ocr_ms"),
    )

    if media_store is None:
        media_out = media_spans.select(
            "doc_id", "kind", "text", "media_ref", "offset",
            F.lit(None).cast("double").alias("ocr_ms"),
        )
    else:
        ocr_res = ocr_referenced_media(media_spans, media_store)
        if broadcast_media:
            ocr_res = F.broadcast(ocr_res)
        media_out = (
            media_spans.select("doc_id", "media_ref", "offset")
            .join(ocr_res, "media_ref", "left")
            .select(
                "doc_id",
                F.lit(KIND_MEDIA).alias("kind"),
                F.coalesce("text", F.lit("")).alias("text"),
                "media_ref",
                "offset",
                "ocr_ms",
            )
        )
    return text_out.unionByName(media_out)


def extract_documents(
    docs: DataFrame,
    media_store: DataFrame | None = None,
    salt: int | None = None,
    broadcast_media: bool = True,
) -> DataFrame:
    """Full pipeline: interleaved doc table in, extracted doc table out
    (same (doc_id, spans) shape, spans ordered by offset)."""
    spans = extract_spans(docs, media_store, broadcast_media=broadcast_media)
    return reassemble(spans.drop("ocr_ms"), salt=salt)
