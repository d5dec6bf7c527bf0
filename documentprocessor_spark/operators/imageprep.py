"""P1-P10: the reference's image-preprocessing chain rebuilt as vectorized
numpy kernels (SURVEY.md §2.2).

The reference shells out to ImageMagick once per step per document
(/root/reference/Ocr/src/preprocessing/image_preprocessor.py:336-478, ~5-10
subprocess spawns per page — the core of its 1-2 s/page preprocessing cost).
Here every step is a pure numpy array transform executed inside one
Arrow-batched ``mapInPandas`` stage; the chain follows the authoritative
Python pipeline order (deskew → grayscale → remove-background → contrast →
threshold → denoise), NOT the shell script order (SURVEY.md §8.6).

Numerical parity note: ImageMagick's exact pixel math (quantum scaling,
HCLab deskew) is not reproducible without ImageMagick; these kernels are
the documented numerical analogs — deterministic, vectorized, and unit-
tested for their own contract. The SIZE-GUARD math (P9) however IS exact:
constants 32767 / 178,956,970 and the truncating scale arithmetic replicate
image_preprocessor.py:283-334 verbatim (asserted in tests, mirroring the
reference's own test_image_preprocessor.py:343-412).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# image_preprocessor.py:40-43 — exact reference constants
TESSERACT_MAX_DIMENSION = 32767
PILLOW_MAX_PIXELS = 178956970

DEFAULT_DESKEW_THRESHOLD = 40   # image_preprocessor.py:358-368
DEFAULT_FUZZ_PERCENT = 30       # :381-391
DEFAULT_CONTRAST_STRENGTH = 3   # :393-414
DEFAULT_CONTRAST_MIDPOINT = 120
DEFAULT_THRESHOLD_PERCENT = 50  # :416-427
DEFAULT_TARGET_DPI = 300


# --- P2: grayscale (-colorspace Gray) --------------------------------------

def grayscale(img: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 → HxW uint8 via ITU-R 601 luma."""
    if img.ndim == 2:
        return img
    luma = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
    return np.clip(luma + 0.5, 0, 255).astype(np.uint8)


# --- P3: background removal (-fuzz N% -transparent white ... -auto-level) --

def auto_level(img: np.ndarray) -> np.ndarray:
    """Linear histogram stretch: min→0, max→255."""
    lo = int(img.min())
    hi = int(img.max())
    if hi <= lo:
        return img.copy()
    stretched = (img.astype(np.float64) - lo) * (255.0 / (hi - lo))
    return np.clip(stretched + 0.5, 0, 255).astype(np.uint8)


def remove_background(img: np.ndarray, fuzz_percent: float = DEFAULT_FUZZ_PERCENT) -> np.ndarray:
    """Pixels within fuzz% of white snap to white, then auto-level."""
    cutoff = 255.0 * (1.0 - fuzz_percent / 100.0)
    out = img.copy()
    out[out >= cutoff] = 255
    return auto_level(out)


# --- P4: contrast (-auto-level [-sigmoidal-contrast SxM%]) ------------------

def sigmoidal_contrast(
    img: np.ndarray,
    strength: float = DEFAULT_CONTRAST_STRENGTH,
    midpoint_percent: float = DEFAULT_CONTRAST_MIDPOINT,
) -> np.ndarray:
    """ImageMagick's normalized sigmoidal LUT:
    f(u) = (σ(β(u−α)) − σ(−βα)) / (σ(β(1−α)) − σ(−βα)), α=midpoint, β=strength."""
    alpha = midpoint_percent / 100.0
    beta = float(strength)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-beta * (x - alpha)))

    u = np.arange(256, dtype=np.float64) / 255.0
    lo, hi = sig(np.float64(0.0)), sig(np.float64(1.0))
    lut = np.clip((sig(u) - lo) / max(hi - lo, 1e-12) * 255.0 + 0.5, 0, 255).astype(
        np.uint8
    )
    return lut[img]


def enhance_contrast(img: np.ndarray, contrast_type: str = "sigmoidal",
                     strength: float = DEFAULT_CONTRAST_STRENGTH,
                     midpoint: float = DEFAULT_CONTRAST_MIDPOINT) -> np.ndarray:
    if contrast_type == "none":
        return img
    leveled = auto_level(img)
    if contrast_type == "linear":
        return leveled
    return sigmoidal_contrast(leveled, strength, midpoint)


# --- P5: threshold (-threshold N%) ------------------------------------------

def threshold(img: np.ndarray, percent: float = DEFAULT_THRESHOLD_PERCENT) -> np.ndarray:
    cut = 255.0 * percent / 100.0
    return np.where(img > cut, np.uint8(255), np.uint8(0))


# --- P6: denoise (-enhance analog) ------------------------------------------

def denoise(img: np.ndarray) -> np.ndarray:
    """3x3 mean filter (edge-replicated) — the convolution analog of
    ImageMagick -enhance."""
    padded = np.pad(img.astype(np.float64), 1, mode="edge")
    acc = np.zeros_like(img, dtype=np.float64)
    for dy in range(3):
        for dx in range(3):
            acc += padded[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return np.clip(acc / 9.0 + 0.5, 0, 255).astype(np.uint8)


# --- P1: deskew (-deskew N% analog) ------------------------------------------

def estimate_skew(img: np.ndarray, max_deg: int = 5) -> int:
    """Projection-profile skew estimate over integer degrees in
    [-max_deg, max_deg]: pick the shear angle maximizing row-profile
    variance of the ink mask (dark pixels)."""
    mask = (img < 128).astype(np.float64)
    h, w = mask.shape
    cols = np.arange(w)
    best_deg, best_var = 0, -1.0
    for deg in range(-max_deg, max_deg + 1):
        slope = np.tan(np.deg2rad(deg))
        shift = (cols * slope).astype(np.int64)
        rows = mask.sum(axis=1) * 0.0
        # integer row-shear projection
        profile = np.zeros(h + 2 * max(1, abs(int(w * slope)) + 1))
        base = max(1, abs(int(w * slope)) + 1)
        for c in range(w):
            col = mask[:, c]
            profile[base + shift[c] : base + shift[c] + h] += col
        var = float(profile.var())
        if var > best_var:
            best_var, best_deg = var, deg
        del rows
    return best_deg


def deskew(img: np.ndarray, threshold_percent: float = DEFAULT_DESKEW_THRESHOLD) -> np.ndarray:
    """Integer row-shear deskew (white background fill)."""
    deg = estimate_skew(img)
    if deg == 0:
        return img
    h, w = img.shape[:2]
    # the estimate already IS the correcting shear (it maximizes profile
    # variance of base + c*tan(deg) + row), so apply it directly
    slope = np.tan(np.deg2rad(deg))
    shift = (np.arange(w) * slope).astype(np.int64)
    out = np.full_like(img, 255)
    for c in range(w):
        s = shift[c]
        src_lo, src_hi = max(0, -s), min(h, h - s)
        dst_lo, dst_hi = max(0, s), min(h, h + s)
        out[dst_lo:dst_hi, c] = img[src_lo:src_hi, c]
    return out


# --- P8/P9: DPI resample + safe-DPI guard (exact reference math) -------------

def calculate_resampled_dimensions(width: int, height: int, current_dpi: float,
                                   target_dpi: int) -> tuple[int, int]:
    """image_preprocessor.py:256-281 exactly: default DPI 72 when <=0,
    int() truncation of the scaled dimensions."""
    if current_dpi <= 0:
        current_dpi = 72.0
    scale = target_dpi / current_dpi
    return int(width * scale), int(height * scale)


def find_safe_dpi(width: int, height: int, current_dpi: float,
                  target_dpi: int = DEFAULT_TARGET_DPI) -> int | None:
    """image_preprocessor.py:283-334 exactly: try target down to 100 in
    steps of 50; enforce Tesseract max dim AND Pillow max pixels; None if
    hopeless."""
    for test_dpi in range(target_dpi, 99, -50):
        new_w, new_h = calculate_resampled_dimensions(
            width, height, current_dpi, test_dpi
        )
        within_tesseract = (
            new_w <= TESSERACT_MAX_DIMENSION and new_h <= TESSERACT_MAX_DIMENSION
        )
        if within_tesseract and new_w * new_h <= PILLOW_MAX_PIXELS:
            return test_dpi
    return None


def resample(img: np.ndarray, scale: float) -> np.ndarray:
    """Nearest-neighbor resample (dependency-free)."""
    h, w = img.shape[:2]
    new_h, new_w = max(1, int(h * scale)), max(1, int(w * scale))
    rows = np.minimum((np.arange(new_h) / scale).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(new_w) / scale).astype(np.int64), w - 1)
    return img[rows][:, cols]


# --- the chain (Python pipeline order, image_preprocessor.py:336-448) -------

def preprocess_chain(
    img: np.ndarray,
    do_deskew: bool = False,
    fuzz_percent: float = DEFAULT_FUZZ_PERCENT,
    contrast_type: str = "sigmoidal",
    apply_threshold: bool = False,
    threshold_percent: float = DEFAULT_THRESHOLD_PERCENT,
    do_denoise: bool = False,
) -> np.ndarray:
    """deskew → grayscale → remove-bg → contrast → threshold? → denoise? —
    returns HxWx3 RGB uint8 like the reference's final reload (:461-467)."""
    gray = grayscale(img)
    if do_deskew:
        gray = deskew(gray)
    gray = remove_background(gray, fuzz_percent)
    gray = enhance_contrast(gray, contrast_type)
    if apply_threshold:
        gray = threshold(gray, threshold_percent)
    if do_denoise:
        gray = denoise(gray)
    return np.stack([gray, gray, gray], axis=-1)


# --- Spark stage --------------------------------------------------------------

PREPROCESSED = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("safe_dpi", IntegerType(), True),
        StructField("mean_intensity", DoubleType(), True),
        StructField("ink_pixels", LongType(), True),
        StructField("skew_deg", IntegerType(), True),
        StructField("status", StringType(), False),
        StructField("error", StringType(), True),
    ]
)


def preprocess_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over MEDIA rows: fake-decode → full P-chain →
    summary features (the decoded array stays executor-local; only compact
    features cross the wire). Per-row failure contract as everywhere."""
    from .multimodal import _decode_image_stub

    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            try:
                w, h = int(r.width or 32), int(r.height or 32)
                img = _decode_image_stub(r.payload, w, h)
                processed = preprocess_chain(img, do_deskew=True, do_denoise=True)
                gray = processed[..., 0]
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "safe_dpi": find_safe_dpi(w, h, 72.0),
                        "mean_intensity": round(float(gray.mean()), 6),
                        "ink_pixels": int((gray < 128).sum()),
                        "skew_deg": estimate_skew(gray),
                        "status": "done",
                        "error": None,
                    }
                )
            except Exception as e:
                rows.append(
                    {
                        "media_id": getattr(r, "media_id", None),
                        "width": None,
                        "height": None,
                        "safe_dpi": None,
                        "mean_intensity": None,
                        "ink_pixels": None,
                        "skew_deg": None,
                        "status": "failed",
                        "error": str(e),
                    }
                )
        yield pd.DataFrame(rows)


def preprocess_media(media: DataFrame) -> DataFrame:
    return media.select("media_id", "payload", "width", "height").mapInPandas(
        preprocess_kernel, schema=PREPROCESSED
    )
