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


GLYPH_BITS = GLYPH_H * GLYPH_W  # the shared confidence denominator


def _pad_cell(cell: np.ndarray) -> np.ndarray:
    """Crop/zero-pad an ink cell to the flat GLYPH_H x GLYPH_W target both
    recognizers compare against templates."""
    h, w = min(cell.shape[0], GLYPH_H), min(cell.shape[1], GLYPH_W)
    padded = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    padded[:h, :w] = cell[:h, :w]
    return padded.reshape(-1)


def _decode_glyph(cell: np.ndarray) -> tuple[str, float]:
    """Nearest-template decode: exact match → conf 1.0, else minimal
    Hamming distance (ties by font order), conf = 1 − d/GLYPH_BITS."""
    dists = (_FONT_MATRIX != _pad_cell(cell)).sum(axis=1)
    best = int(dists.argmin())
    d = int(dists[best])
    return _FONT_CHARS[best], round(1.0 - d / GLYPH_BITS, 6)


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


class CCBeamOcrEngine:
    """Connected-component line segmentation + beam-decoded character
    sequences — the north_star's stated detector/recognizer architecture
    (PaddleOCR det→rec, Tesseract's CC analysis), built with real
    algorithms end-to-end; only the glyph MODEL is the cipher font:

    1. 8-connectivity component labeling (two-pass union-find, pure numpy);
    2. components cluster into LINES by transitive y-interval adjacency
       (the font guarantees every glyph row carries ink, so one line's
       fragments chain across the band; lines are 3 blank rows apart);
    3. per line, x-touching components merge into glyphs, glyphs with gap
       <= GLYPH_GAP into words — reproducing the projection segmentation
       exactly on any image the renderer produces;
    4. per word, BEAM SEARCH over per-glyph template log-likelihoods
       (log P ∝ −α·hamming) plus a deterministic character-class bigram
       prior — on clean glyphs the exact match dominates any prior bonus
       by construction (α=3 > λ·max log-ratio ≈ 1), so clean pages decode
       identically to TemplateOcrEngine (test-pinned); on corrupted
       glyphs the prior lets context repair what greedy argmax misreads.

    Swapping the cipher font for CNN glyph posteriors changes only
    `_glyph_logprobs`; segmentation, beam, batching, schema stay.
    """

    name = "ccbeam"
    ALPHA = 3.0      # log-likelihood per Hamming bit
    LAMBDA = 0.5     # bigram-prior weight
    BEAM = 4

    @staticmethod
    def _char_class(ch: str) -> int:
        if ch.isalpha():
            return 0
        if ch.isdigit():
            return 1
        return 2

    @classmethod
    def _bigram_logp(cls, prev_cls: int, cur_cls: int) -> float:
        # deterministic class-level LM: same class 0.7, else 0.15
        import math

        return math.log(0.7 if prev_cls == cur_cls else 0.15)

    @staticmethod
    def _label_components(ink: np.ndarray) -> list[dict]:
        """Two-pass union-find 8-connectivity labeling, pure numpy +
        python dict parents (images here are small; at scale this kernel
        runs per-page inside the Arrow batch, not per-corpus)."""
        h, w = ink.shape
        labels = np.zeros((h, w), dtype=np.int32)
        parent: list[int] = [0]

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union(a: int, b: int) -> None:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        nxt = 1
        for y in range(h):
            row = ink[y]
            for x in np.flatnonzero(row):
                neigh = []
                if y:
                    for dx in (-1, 0, 1):
                        xx = x + dx
                        if 0 <= xx < w and labels[y - 1, xx]:
                            neigh.append(labels[y - 1, xx])
                if x and labels[y, x - 1]:
                    neigh.append(labels[y, x - 1])
                if neigh:
                    m = min(neigh)
                    labels[y, x] = m
                    for n in neigh:
                        union(m, n)
                else:
                    labels[y, x] = nxt
                    parent.append(nxt)
                    nxt += 1
        comps: dict[int, list[int]] = {}
        ys, xs = np.nonzero(labels)
        for y, x in zip(ys.tolist(), xs.tolist()):
            r = find(labels[y, x])
            b = comps.setdefault(r, [y, y, x, x])
            b[0] = min(b[0], y); b[1] = max(b[1], y)
            b[2] = min(b[2], x); b[3] = max(b[3], x)
        return [
            {"y0": b[0], "y1": b[1] + 1, "x0": b[2], "x1": b[3] + 1}
            for b in comps.values()
        ]

    def _glyph_logprobs(self, cell: np.ndarray) -> np.ndarray:
        dists = (_FONT_MATRIX != _pad_cell(cell)).sum(axis=1)
        return -self.ALPHA * dists.astype(np.float64)

    def _beam_decode(self, cells: list[np.ndarray]) -> tuple[str, float]:
        beams: list[tuple[float, str, int, float]] = [(0.0, "", -1, 0.0)]
        # (total score, text, last char class, pure-likelihood sum)
        for cell in cells:
            lp = self._glyph_logprobs(cell)
            order = np.argsort(-lp, kind="stable")[: self.BEAM * 2]
            nxt = []
            for score, text, last_cls, like in beams:
                for ci in order.tolist():
                    ch = _FONT_CHARS[ci]
                    cls = self._char_class(ch)
                    prior = (
                        self.LAMBDA * self._bigram_logp(last_cls, cls)
                        if last_cls >= 0 else 0.0
                    )
                    nxt.append(
                        (score + lp[ci] + prior, text + ch, cls, like + lp[ci])
                    )
            # deterministic beam: score desc, then text asc as tiebreak
            nxt.sort(key=lambda t: (-t[0], t[1]))
            beams = nxt[: self.BEAM]
        _, text, _, like = beams[0]
        n = max(1, len(cells))
        # like = −α·Σd, so 1 + like/(n·α·GLYPH_BITS) = 1 − mean(d)/GLYPH_BITS
        # — the template engine's confidence scale (exact match → 1.0)
        conf = round(1.0 + like / (n * self.ALPHA * GLYPH_BITS), 6)
        return text, conf

    def detect_and_recognize(self, img: np.ndarray) -> list[dict]:
        if img.ndim == 3:
            img = img[..., 0]
        ink = img < 128
        comps = self._label_components(ink)
        if not comps:
            return []
        # lines: transitive y-interval adjacency (touch or overlap)
        comps.sort(key=lambda c: (c["y0"], c["x0"]))
        lines: list[list[dict]] = [[comps[0]]]
        band_end = comps[0]["y1"]
        for c in comps[1:]:
            if c["y0"] <= band_end:
                lines[-1].append(c)
                band_end = max(band_end, c["y1"])
            else:
                lines.append([c])
                band_end = c["y1"]
        words = []
        for line in lines:
            line.sort(key=lambda c: c["x0"])
            ly0 = min(c["y0"] for c in line)
            ly1 = max(c["y1"] for c in line)
            # x-touching components -> glyphs
            glyphs: list[list[dict]] = [[line[0]]]
            for c in line[1:]:
                if c["x0"] <= max(g["x1"] for g in glyphs[-1]):
                    glyphs[-1].append(c)
                else:
                    glyphs.append([c])
            spans = [
                (min(g["x0"] for g in gl), max(g["x1"] for g in gl))
                for gl in glyphs
            ]
            # glyphs -> words on the GLYPH_GAP threshold
            groups: list[list[tuple[int, int]]] = [[spans[0]]]
            for prev, cur in zip(spans, spans[1:]):
                if cur[0] - prev[1] > GLYPH_GAP:
                    groups.append([cur])
                else:
                    groups[-1].append(cur)
            band = ink[ly0:ly1]
            for group in groups:
                cells = [band[:, gx0:gx1] for gx0, gx1 in group]
                text, conf = self._beam_decode(cells)
                if not text.strip():
                    continue
                words.append(
                    {
                        "text": text,
                        "x0": int(group[0][0]),
                        "y0": int(ly0),
                        "x1": int(group[-1][1]),
                        "y1": int(ly1),
                        "confidence": conf,
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
    if name == "ccbeam":
        return CCBeamOcrEngine()
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
