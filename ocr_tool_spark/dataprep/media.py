"""Multimodal column operators: images/PDF rasters as opaque binary +
typed metadata, with decode / feature-extract / resize / frame-sample
as Arrow-batched stages (SURVEY.md H3).

The raster format here (header-described uint8 pages, FIXTURES.md §1.2)
is genuinely decoded with numpy — decode, ink features, and thumbnail
resize are real, tested implementations. Codec-dependent modalities
(JPEG/PNG, audio PCM, video containers) have no libraries in this
sandbox, so their decode step is a clearly-marked stub behind the same
Arrow plumbing: the schema, batching, and partition behavior are real
and tested; only the byte-level codec raises NotImplementedError.

Scale notes: media work is one mapInArrow stage = one Arrow crossing
per batch; batches are row-capped (session config
arrow.maxRecordsPerBatch) so multi-MB binary payloads can't blow the
Python-worker heap. Feature rows are narrow (the binary column is
dropped before any shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

MEDIA_FEATURES_SCHEMA = (
    "media_ref string, media_kind string, width int, height int, n_pages int, "
    "n_bytes long, ink_ratio double, mean_intensity double, nonblank_rows int"
)
# explicit arrow types: mapInArrow requires the produced batches to
# match the declared Spark schema exactly (int32 vs inferred int64)
_FEATURES_PA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_pages", pa.int32()),
        ("n_bytes", pa.int64()),
        ("ink_ratio", pa.float64()),
        ("mean_intensity", pa.float64()),
        ("nonblank_rows", pa.int32()),
    ]
)

THUMBNAIL_SCHEMA = "media_ref string, thumb_w int, thumb_h int, thumbnail binary"
_THUMBNAIL_PA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("thumb_w", pa.int32()),
        ("thumb_h", pa.int32()),
        ("thumbnail", pa.binary()),
    ]
)

FRAME_SAMPLE_SCHEMA = "media_ref string, page_idx int, width int, height int, frame binary"
_FRAME_PA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("page_idx", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("frame", pa.binary()),
    ]
)


def _decode(bitmap: bytes, width: int, height: int, n_pages: int) -> np.ndarray:
    return np.frombuffer(bitmap, dtype=np.uint8).reshape(n_pages, height, width)


def media_features(media_store: DataFrame) -> DataFrame:
    """Per-media decode + feature extraction (real): ink ratio, mean
    intensity, count of rows containing ink on page 0."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            d = batch.to_pydict()
            rows = {k: [] for k in (
                "media_ref", "media_kind", "width", "height", "n_pages",
                "n_bytes", "ink_ratio", "mean_intensity", "nonblank_rows")}
            for ref, kind, w, h, p, bm in zip(
                d["media_ref"], d["media_kind"], d["width"], d["height"],
                d["n_pages"], d["bitmap"],
            ):
                pages = _decode(bm, w, h, p)
                rows["media_ref"].append(ref)
                rows["media_kind"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pages"].append(p)
                rows["n_bytes"].append(len(bm))
                rows["ink_ratio"].append(float((pages > 0).mean()))
                rows["mean_intensity"].append(float(pages.mean()))
                rows["nonblank_rows"].append(int((pages[0] > 0).any(axis=1).sum()))
            yield pa.RecordBatch.from_pydict(rows, schema=_FEATURES_PA)

    return media_store.mapInArrow(fn, MEDIA_FEATURES_SCHEMA)


def thumbnails(media_store: DataFrame, size: int = 8) -> DataFrame:
    """Block-mean downsample of page 0 to size×size uint8 (real resize)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            d = batch.to_pydict()
            refs, thumbs = [], []
            for ref, w, h, p, bm in zip(
                d["media_ref"], d["width"], d["height"], d["n_pages"], d["bitmap"]
            ):
                page = _decode(bm, w, h, p)[0].astype(np.float64)
                ys = np.linspace(0, h, size + 1).astype(int)
                xs = np.linspace(0, w, size + 1).astype(int)
                t = np.empty((size, size), dtype=np.uint8)
                for i in range(size):
                    for j in range(size):
                        cell = page[ys[i]:max(ys[i + 1], ys[i] + 1),
                                    xs[j]:max(xs[j + 1], xs[j] + 1)]
                        t[i, j] = int(round(cell.mean()))
                refs.append(ref)
                thumbs.append(t.tobytes())
            yield pa.RecordBatch.from_pydict(
                {
                    "media_ref": refs,
                    "thumb_w": [size] * len(refs),
                    "thumb_h": [size] * len(refs),
                    "thumbnail": thumbs,
                },
                schema=_THUMBNAIL_PA,
            )

    return media_store.mapInArrow(fn, THUMBNAIL_SCHEMA)


def frame_sample(media_store: DataFrame, stride: int = 2) -> DataFrame:
    """Sample every `stride`-th page (video-frame-sampling shape, real
    for our multi-page rasters): 1→N rows with the frame bytes."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            d = batch.to_pydict()
            out = {k: [] for k in ("media_ref", "page_idx", "width", "height", "frame")}
            for ref, w, h, p, bm in zip(
                d["media_ref"], d["width"], d["height"], d["n_pages"], d["bitmap"]
            ):
                pages = _decode(bm, w, h, p)
                for idx in range(0, p, stride):
                    out["media_ref"].append(ref)
                    out["page_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["frame"].append(pages[idx].tobytes())
            yield pa.RecordBatch.from_pydict(out, schema=_FRAME_PA)

    return media_store.mapInArrow(fn, FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------- stubs

AUDIO_FEATURES_SCHEMA = "media_ref string, sample_rate int, n_samples long, rms double"


def decode_audio(payload: bytes) -> np.ndarray:
    """STUB: PCM/compressed audio decode. No audio codec library exists
    in this environment (SURVEY.md §0.2); on a real deployment swap in
    soundfile/ffmpeg here — the Arrow plumbing around it is unchanged."""
    raise NotImplementedError(
        "audio codec unavailable in sandbox; see dataprep/media.py docstring"
    )


def audio_features(media_store: DataFrame, payload_col: str = "bitmap") -> DataFrame:
    """Audio feature extraction pipeline shape: real Arrow batching and
    schema; decode_audio is the stubbed codec step."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            d = batch.to_pydict()
            out = {k: [] for k in ("media_ref", "sample_rate", "n_samples", "rms")}
            for ref, payload in zip(d["media_ref"], d[payload_col]):
                wave = decode_audio(payload)  # raises in sandbox
                out["media_ref"].append(ref)
                out["sample_rate"].append(16000)
                out["n_samples"].append(int(wave.size))
                out["rms"].append(float(np.sqrt((wave.astype(np.float64) ** 2).mean())))
            yield pa.RecordBatch.from_pydict(out)

    return media_store.mapInArrow(fn, AUDIO_FEATURES_SCHEMA)
