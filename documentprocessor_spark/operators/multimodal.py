"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

This is the Spark-side realization of the reference's image path (load →
preprocess → OCR, SURVEY.md §2.1-2.3) generalized to any modality. The
container has no image/audio codecs, so the DECODE KERNELS ARE STUBS — a
deterministic fake decoder gated behind ``allow_fake=True`` (for tests) or a
clearly-marked NotImplementedError — but the Spark plumbing is real and
tested: schema, batch shape, UDF signatures, partition sizing.

Real-deployment swap: replace ``_decode_image_stub`` with a PIL/cv2 call
inside the same ``mapInPandas`` iterator; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_luma", DoubleType(), True),
        StructField("histogram", ArrayType(DoubleType()), True),
        StructField("status", StringType(), False),
        StructField("error", StringType(), True),
    ]
)


def _tile_bytes(payload: bytes, need: int) -> np.ndarray:
    """Cycle payload bytes into a flat uint8 array of length ``need`` — the
    ONE byte-tiling rule every fake decoder (image, video) shares, so the
    SQL oracles that re-derive it have a single contract to mirror."""
    if not payload:
        raise ValueError("empty payload")
    flat = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-need // len(flat))
    return np.tile(flat, reps)[:need]


def _luma(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma over a trailing RGB axis (shared by the image and
    video feature kernels — and mirrored verbatim by their oracles)."""
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: payload bytes tile into an HxWx3 uint8
    array. Replaces PIL.Image.open (reference: Ocr/src/cli/utils.py:98-117)
    in this codec-free container; byte-identical across runs."""
    return _tile_bytes(payload, width * height * 3).reshape(height, width, 3)


def image_feature_kernel(batches: Iterator[pd.DataFrame],
                         allow_fake: bool = True) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: MEDIA rows → IMAGE_FEATURES rows.

    Per-row failure becomes a status/error pair (never a task failure),
    matching the reference's per-document error contract
    (receipt_processor.py:221-225).
    """
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            try:
                if not allow_fake:
                    raise NotImplementedError(
                        "real image decode requires PIL/cv2 — not in this container"
                    )
                img = _decode_image_stub(
                    r.payload, int(r.width or 32), int(r.height or 32)
                )
                luma = _luma(img)
                hist, _ = np.histogram(luma, bins=8, range=(0, 255))
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_bytes": len(r.payload or b""),
                        "mean_luma": round(float(luma.mean()), 6),
                        "histogram": (hist / max(1, luma.size)).round(6).tolist(),
                        "status": "done",
                        "error": None,
                    }
                )
            except Exception as e:
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_bytes": len(r.payload or b""),
                        "mean_luma": None,
                        "histogram": None,
                        "status": "failed",
                        "error": str(e),
                    }
                )
        yield pd.DataFrame(rows)


def extract_image_features(media: DataFrame, allow_fake: bool = True) -> DataFrame:
    """Distributed image feature extraction over a MEDIA-shaped DataFrame."""
    cols = ["media_id", "payload", "width", "height"]
    return media.select(*cols).mapInPandas(
        lambda it: image_feature_kernel(it, allow_fake=allow_fake),
        schema=IMAGE_FEATURES,
    )


AUDIO_FEATURES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("status", StringType(), False),
        StructField("error", StringType(), True),
    ]
)


def _decode_audio_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake PCM decoder: payload bytes ARE little-endian
    int16 mono samples (trailing odd byte dropped). Replaces a
    soundfile/librosa load in this codec-free container."""
    if not payload:
        raise ValueError("empty payload")
    usable = len(payload) - (len(payload) % 2)
    if usable == 0:
        raise ValueError("payload shorter than one sample")
    return np.frombuffer(payload[:usable], dtype="<i2")


def audio_feature_kernel(
    batches: Iterator[pd.DataFrame],
    sample_rate: int = 16000,
    allow_fake: bool = True,
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_id, payload) → AUDIO_FEATURES. RMS and
    zero-crossing math is vectorized numpy over the full batch row; the
    per-row failure contract matches every other kernel here."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            try:
                if not allow_fake:
                    raise NotImplementedError(
                        "real audio decode requires soundfile/ffmpeg — "
                        "not in this container"
                    )
                s = _decode_audio_stub(r.payload)
                f = s.astype(np.float64)
                neg = s < 0
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_samples": len(s),
                        "duration_ms": len(s) * 1000 // sample_rate,
                        "rms": round(float(np.sqrt(np.mean(f * f))), 6),
                        "zero_crossings": int((neg[:-1] != neg[1:]).sum()),
                        "status": "done",
                        "error": None,
                    }
                )
            except Exception as e:
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_samples": None,
                        "duration_ms": None,
                        "rms": None,
                        "zero_crossings": None,
                        "status": "failed",
                        "error": str(e),
                    }
                )
        yield pd.DataFrame(rows)


def extract_audio_features(
    media: DataFrame, sample_rate: int = 16000, allow_fake: bool = True
) -> DataFrame:
    """Distributed audio feature extraction over MEDIA-shaped rows."""
    return media.select("media_id", "payload").mapInPandas(
        lambda it: audio_feature_kernel(
            it, sample_rate=sample_rate, allow_fake=allow_fake
        ),
        schema=AUDIO_FEATURES,
    )


VIDEO_FRAMES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("status", StringType(), False),
        StructField("error", StringType(), True),
    ]
)


def _decode_video_frames_stub(
    payload: bytes, width: int, height: int, n_frames: int
) -> np.ndarray:
    """Deterministic fake video decoder: payload bytes tile into an
    (n_frames, H, W, 3) uint8 array — the frame axis continues the same
    byte cycle the image stub uses (one shared ``_tile_bytes`` rule)."""
    return _tile_bytes(payload, n_frames * width * height * 3).reshape(
        n_frames, height, width, 3
    )


def video_frame_kernel(
    batches: Iterator[pd.DataFrame],
    every_n: int = 2,
    fps: int = 1,
    allow_fake: bool = True,
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: MEDIA rows → one VIDEO_FRAMES row per SAMPLED
    frame (indexes 0, every_n, 2·every_n, …). Frame count derives from the
    duration_ms metadata at ``fps`` frames/sec (min 1). The decoded frames
    stay executor-local; only per-frame features cross the wire — the shape
    a 100 TB frame-sampling pass needs."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            try:
                if not allow_fake:
                    raise NotImplementedError(
                        "real video decode requires ffmpeg/cv2 — "
                        "not in this container"
                    )
                w, h = int(r.width or 16), int(r.height or 16)
                n_frames = max(1, int(r.duration_ms or 0) * fps // 1000)
                frames = _decode_video_frames_stub(r.payload, w, h, n_frames)
                # luma only over the SAMPLED frames — at sparse every_n
                # (the 100 TB-pass shape) the skipped frames' float math
                # would dominate for nothing
                luma = _luma(frames[::every_n])
                for pos, idx in enumerate(range(0, n_frames, every_n)):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": idx,
                            "mean_luma": round(float(luma[pos].mean()), 6),
                            "status": "done",
                            "error": None,
                        }
                    )
            except Exception as e:
                rows.append(
                    {
                        "media_id": r.media_id,
                        "frame_idx": None,
                        "mean_luma": None,
                        "status": "failed",
                        "error": str(e),
                    }
                )
        yield pd.DataFrame(rows)


def sample_video_frames(
    media: DataFrame,
    every_n: int = 2,
    fps: int = 1,
    allow_fake: bool = True,
) -> DataFrame:
    """Distributed frame sampling over MEDIA-shaped rows — returns a
    per-sampled-frame feature table (explodes inside the kernel, so raw
    frames never serialize)."""
    cols = ["media_id", "payload", "width", "height", "duration_ms"]
    return media.select(*cols).mapInPandas(
        lambda it: video_frame_kernel(
            it, every_n=every_n, fps=fps, allow_fake=allow_fake
        ),
        schema=VIDEO_FRAMES,
    )


def synthetic_media(spark, n: int = 16) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = [
        (
            f"media-{i}",
            "image",
            bytes([(i * 37 + j) % 256 for j in range(64)]),
            "image/fake",
            16 + (i % 4) * 8,
            16 + (i % 3) * 8,
            None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA)
