"""O1/O2/O3: the OCR stage rebuilt as a batched, deterministic numpy kernel.

The reference wraps PaddleOCR/Tesseract subprocess-or-library calls per page
(/root/reference/Ocr/src/ocr/ocr_engine.py:81-261) behind an OcrEngine ABC
with an engine factory + fallback (:264-286). The north_star calls for a
batched kernel with connected-component line segmentation and decoded
character sequences inside a pandas UDF.

This container has no torch/ONNX/codecs, so the RECOGNITION model is a
deterministic *cipher font*: every printable character maps to a unique
7x5 bitmap derived from md5(char) (uniqueness asserted at import). The
renderer and the recognizer share that font, which makes the whole
image→text path exactly invertible and testable end-to-end:

    render(text) → page bitmap → segment lines (ink-row projection)
    → segment words/glyphs (column-gap projection) → match glyphs
    (exact, else nearest-by-Hamming with confidence 1 − d/35)
    → words(text, box, confidence) in reading order

— the same output schema the reference's engines produce
(ocr_engine.py:145-149), feeding the SAME downstream normalization and
field extraction. Swapping in a real CNN/CTC model changes only
``_decode_glyph``; segmentation, batching, schema, and the factory stay.

Geometry: glyph cell 7 rows x 5 cols, 1 blank col between glyphs, 3 blank
cols between words, 3 blank rows between lines, 4 px margins.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType

from ..schemas import WORD

GLYPH_H, GLYPH_W = 7, 5
GLYPH_GAP = 1      # blank cols between glyphs in a word
WORD_GAP = 3       # blank cols between words
LINE_GAP = 3       # blank rows between lines
MARGIN = 4

CHARSET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "$.,:/%!-+'&()#*=?@_\";<>~^[]{}|\\"
)


def _glyph_bits(ch: str, salt: int = 0) -> np.ndarray:
    digest = hashlib.md5(f"{salt}:{ch}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    return bits.reshape(GLYPH_H, GLYPH_W).astype(bool)


def _build_font() -> dict[str, np.ndarray]:
    font = {}
    seen = {}
    for ch in CHARSET:
        g = _glyph_bits(ch, 0).copy()
        # Segmentation invariants: every COLUMN must carry ink (else a glyph
        # splits on its internal blank gap) and every ROW must carry ink
        # (else a one-glyph line splits into two line bands).
        anchor = hashlib.md5(ch.encode()).digest()
        for c in range(GLYPH_W):
            if not g[:, c].any():
                g[anchor[c] % GLYPH_H, c] = True
        for r in range(GLYPH_H):
            if not g[r].any():
                g[r, anchor[GLYPH_W + r] % GLYPH_W] = True
        salt = 1
        while g.tobytes() in seen:  # uniqueness: perturb deterministically
            extra = _glyph_bits(ch, salt)
            g = g | extra
            for c in range(GLYPH_W):
                if not g[:, c].any():
                    g[anchor[c] % GLYPH_H, c] = True
            salt += 1
        assert g.tobytes() not in seen, f"cipher-font collision for {ch!r}"
        seen[g.tobytes()] = ch
        font[ch] = g
    return font


FONT = _build_font()
_FONT_CHARS = list(FONT.keys())
_FONT_MATRIX = np.stack([FONT[c] for c in _FONT_CHARS]).reshape(len(FONT), -1)


# --- renderer (the test-fixture generator for the OCR path) -----------------

def render_page(lines: list[str]) -> tuple[np.ndarray, list[tuple]]:
    """Render text lines into a white page; returns (HxW uint8 image,
    golden words [(text, x0, y0, x1, y1)] in reading order). Characters
    outside CHARSET render as '?'."""
    rendered_lines = [ln.split() for ln in lines]
    width = MARGIN * 2 + max(
        (
            sum(len(w) * (GLYPH_W + GLYPH_GAP) - GLYPH_GAP for w in ws)
            + max(0, len(ws) - 1) * (WORD_GAP + GLYPH_GAP)
            for ws in rendered_lines
            if ws
        ),
        default=GLYPH_W,
    )
    height = MARGIN * 2 + len(lines) * GLYPH_H + max(0, len(lines) - 1) * LINE_GAP
    img = np.full((height, width), 255, dtype=np.uint8)
    golden = []
    y = MARGIN
    for ws in rendered_lines:
        x = MARGIN
        for w in ws:
            x0 = x
            for ch in w:
                glyph = FONT.get(ch, FONT["?"])
                img[y : y + GLYPH_H, x : x + GLYPH_W][glyph] = 0
                x += GLYPH_W + GLYPH_GAP
            x1 = x - GLYPH_GAP
            golden.append((w, x0, y, x1, y + GLYPH_H))
            x += WORD_GAP
        y += GLYPH_H + LINE_GAP
    return img, golden


# --- the OCR engine -----------------------------------------------------------

def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """Maximal runs of True in a 1-D mask as [start, end) pairs."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def _decode_glyph(cell: np.ndarray) -> tuple[str, float]:
    """Nearest-template decode: exact match → conf 1.0, else minimal
    Hamming distance (ties by font order), conf = 1 − d/(7*5)."""
    target = np.zeros(GLYPH_H * GLYPH_W, dtype=bool)
    h, w = min(cell.shape[0], GLYPH_H), min(cell.shape[1], GLYPH_W)
    padded = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    padded[:h, :w] = cell[:h, :w]
    target = padded.reshape(-1)
    dists = (_FONT_MATRIX != target).sum(axis=1)
    best = int(dists.argmin())
    d = int(dists[best])
    return _FONT_CHARS[best], round(1.0 - d / (GLYPH_H * GLYPH_W), 6)


class TemplateOcrEngine:
    """Deterministic segmentation + template recognition (the 'paddle'
    analog — primary engine)."""

    name = "template"

    def detect_and_recognize(self, img: np.ndarray) -> list[dict]:
        if img.ndim == 3:
            img = img[..., 0]
        ink = img < 128
        words = []
        for y0, y1 in _runs(ink.any(axis=1)):
            band = ink[y0:y1]
            col_runs = _runs(band.any(axis=0))
            if not col_runs:
                continue
            # group glyph runs into words: gap > GLYPH_GAP separates words
            word_groups: list[list[tuple[int, int]]] = [[col_runs[0]]]
            for prev, cur in zip(col_runs, col_runs[1:]):
                if cur[0] - prev[1] > GLYPH_GAP:
                    word_groups.append([cur])
                else:
                    word_groups[-1].append(cur)
            for group in word_groups:
                chars = []
                confs = []
                for gx0, gx1 in group:
                    ch, conf = _decode_glyph(band[:, gx0:gx1])
                    chars.append(ch)
                    confs.append(conf)
                text = "".join(chars)
                if not text.strip():
                    continue  # empty-text skip, ocr_engine.py:131-133
                words.append(
                    {
                        "text": text,
                        "x0": int(group[0][0]),
                        "y0": int(y0),
                        "x1": int(group[-1][1]),
                        "y1": int(y1),
                        "confidence": round(sum(confs) / len(confs), 6),
                    }
                )
        return words


class FailingOcrEngine:
    """Stand-in for an unavailable backend (the ImportError path of
    ocr_engine.py:277-282)."""

    name = "unavailable"

    def detect_and_recognize(self, img: np.ndarray) -> list[dict]:
        raise RuntimeError("backend not available in this container")


def get_ocr_engine(name: str = "template"):
    """Engine factory with fallback, mirroring ocr_engine.py:264-286:
    unknown names raise ValueError; 'auto' falls back to the template
    engine when the preferred backend is unavailable."""
    if name in ("template", "auto"):
        return TemplateOcrEngine()
    if name == "unavailable":
        return FailingOcrEngine()
    raise ValueError(f"unknown OCR engine: {name}")


# --- Spark stage ----------------------------------------------------------------

@pandas_udf(ArrayType(WORD))
def ocr_words_udf(payload: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    """Batched OCR kernel over raw page bitmaps (binary column of HxW uint8
    bytes). Per-row failure yields an empty word list (the pipeline's
    status/error pair reports it downstream)."""
    engine = TemplateOcrEngine()  # per-batch; a real model would be a
    out = []                      # per-executor lazy singleton (M9 pattern)
    for buf, w, h in zip(payload, width, height):
        try:
            img = np.frombuffer(buf, dtype=np.uint8).reshape(int(h), int(w))
            out.append(engine.detect_and_recognize(img))
        except Exception:
            out.append([])
    return pd.Series(out)


def ocr_pages(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media(media_id, payload, width, height) → + words array<WORD>."""
    return media.withColumn(
        "words",
        ocr_words_udf(F.col(payload_col), F.col("width"), F.col("height")),
    )
