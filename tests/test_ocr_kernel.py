"""OCR kernel (O1/O2/O3 analog): render→segment→decode roundtrip, noise
robustness, factory/fallback, Spark stage, and the full
image → OCR → normalize → extract path against the heuristic goldens."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from documentprocessor_spark import reference_semantics as ref
from documentprocessor_spark.operators.extract import attach_extraction
from documentprocessor_spark.operators.ocr_kernel import (
    CHARSET,
    FONT,
    FailingOcrEngine,
    TemplateOcrEngine,
    get_ocr_engine,
    ocr_pages,
    render_page,
)
from documentprocessor_spark.sources.synthetic import RECEIPT_LINES


def test_font_invariants():
    assert len(FONT) == len(CHARSET)
    seen = set()
    for ch, g in FONT.items():
        assert g.shape == (7, 5)
        assert g.any(axis=0).all(), f"{ch!r} has a blank column"
        assert g.any(axis=1).all(), f"{ch!r} has a blank row"
        assert g.tobytes() not in seen
        seen.add(g.tobytes())


def test_charset_roundtrip_exact():
    img, golden = render_page([CHARSET[:31], CHARSET[31:62], CHARSET[62:]])
    words = TemplateOcrEngine().detect_and_recognize(img)
    assert [w["text"] for w in words] == [g[0] for g in golden]
    assert all(w["confidence"] == 1.0 for w in words)
    # boxes are the rendered pixel boxes
    assert [(w["x0"], w["y0"], w["x1"], w["y1"]) for w in words] == [
        g[1:] for g in golden
    ]


def test_receipt_roundtrip_and_reading_order():
    img, golden = render_page(RECEIPT_LINES)
    words = TemplateOcrEngine().detect_and_recognize(img)
    assert [w["text"] for w in words] == [g[0] for g in golden]


def test_noisy_glyph_degrades_gracefully():
    img, _ = render_page(["TOTAL"])
    noisy = img.copy()
    ys, xs = np.where(img < 128)
    noisy[ys[0], xs[0]] = 255  # erase one ink pixel
    words = TemplateOcrEngine().detect_and_recognize(noisy)
    assert len(words) == 1
    assert words[0]["text"] == "TOTAL"  # nearest-template still wins
    assert words[0]["confidence"] < 1.0


def test_engine_factory_and_fallback():
    assert isinstance(get_ocr_engine("template"), TemplateOcrEngine)
    assert isinstance(get_ocr_engine("auto"), TemplateOcrEngine)
    with pytest.raises(ValueError):
        get_ocr_engine("nonexistent-engine")
    with pytest.raises(RuntimeError):
        FailingOcrEngine().detect_and_recognize(np.zeros((4, 4)))


def test_spark_ocr_to_extraction_end_to_end(spark):
    """Image bytes → OCR words → 0-1000 normalize → field extraction, all in
    Spark; fields must equal the pure-Python goldens computed from the OCR
    words (the full reference pipeline shape, receipt_processor.py:156-219)."""
    from documentprocessor_spark.functions.boxes import normalize_words_col

    pages = [
        ("ocr://receipt", RECEIPT_LINES),
        ("ocr://two-line", ["MEGA MART", "Total $26.98"]),
    ]
    rows = []
    for url, lines in pages:
        img, _ = render_page(lines)
        rows.append((url, img.tobytes(), img.shape[1], img.shape[0]))
    df = spark.createDataFrame(rows, "media_id string, payload binary, width int, height int")
    with_words = ocr_pages(df)
    normalized = with_words.withColumn(
        "words", normalize_words_col(F.col("words"), F.col("width"), F.col("height"))
    ).withColumnRenamed("media_id", "url")
    out = {
        r["url"]: r.asDict(recursive=True)
        for r in attach_extraction(normalized, "words").collect()
    }
    for url, lines in pages:
        img, _ = render_page(lines)
        words = TemplateOcrEngine().detect_and_recognize(img)
        tuples = [
            (w["text"], w["x0"], w["y0"], w["x1"], w["y1"], w["confidence"])
            for w in words
        ]
        normed = ref.normalize_words(tuples, img.shape[1], img.shape[0])
        golden = ref.extract_fields(normed)
        got = out[url]
        assert got["extracted_text"] == ref.raw_text(normed), url
        for f in ("vendor_name", "date", "total_amount", "subtotal",
                  "tax_amount", "currency"):
            assert got[f] == golden[f], f"{url}.{f}"
    # the rendered receipt's own content is recovered byte-identically
    assert out["ocr://receipt"]["extracted_text"] == " ".join(
        " ".join(ln.split()) for ln in RECEIPT_LINES if ln.strip()
    )
    assert out["ocr://two-line"]["total_amount"]["value"] == "26.98"


# ---------------------------------------------------------------------------
# CCBeamOcrEngine: CC segmentation + beam decode (north_star architecture)
# ---------------------------------------------------------------------------


def test_ccbeam_equals_template_on_clean_pages():
    """On renderer-clean pages the CC segmentation must reproduce the
    projection segmentation exactly and the beam (whose prior cannot
    overcome any integer Hamming advantage at alpha=3, lambda=0.5) must
    decode identically — boxes, texts, confidences."""
    from documentprocessor_spark.operators.ocr_kernel import (
        CCBeamOcrEngine, TemplateOcrEngine, render_page)

    img, _ = render_page(
        ["Hello World 123", "Total $45.67 TAX 0.99", "a b c", "Zz9?!"]
    )
    key = lambda w: (w["y0"], w["x0"])
    t = sorted(TemplateOcrEngine().detect_and_recognize(img), key=key)
    c = sorted(CCBeamOcrEngine().detect_and_recognize(img), key=key)
    assert t == c


def test_ccbeam_prior_repairs_equidistant_tie():
    """A corrupted glyph EXACTLY equidistant between a digit and an
    (earlier-in-font-order) letter: greedy template matching tie-breaks to
    the letter, the beam's character-class bigram prior repairs it in a
    digit context. Search the cipher font for such a pair, construct the
    ambiguous cell, embed it after two clean digits."""
    import numpy as np

    from documentprocessor_spark.operators.ocr_kernel import (
        FONT, GLYPH_GAP, GLYPH_H, GLYPH_W, MARGIN, CCBeamOcrEngine,
        TemplateOcrEngine, _FONT_CHARS, _FONT_MATRIX, render_page)

    found = None
    for d_ch in "0123456789":
        for l_ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
            a = FONT[d_ch].reshape(-1)
            b = FONT[l_ch].reshape(-1)
            diff = np.flatnonzero(a != b)
            if len(diff) % 2:
                continue
            cell = a.copy()
            cell[diff[: len(diff) // 2]] = b[diff[: len(diff) // 2]]
            dists = (_FONT_MATRIX != cell).sum(axis=1)
            best = dists.min()
            winners = {_FONT_CHARS[i] for i in np.flatnonzero(dists == best)}
            if winners == {d_ch, l_ch} and best == len(diff) // 2:
                found = (d_ch, l_ch, cell.reshape(GLYPH_H, GLYPH_W))
                break
        if found:
            break
    assert found, "cipher font has no equidistant digit/letter pair"
    d_ch, l_ch, cell = found

    img, _ = render_page([f"12{d_ch}"])
    # overwrite the third glyph cell with the ambiguous bitmap
    x = MARGIN + 2 * (GLYPH_W + GLYPH_GAP)
    patch = np.full((GLYPH_H, GLYPH_W), 255, dtype=np.uint8)
    patch[cell] = 0
    img[MARGIN:MARGIN + GLYPH_H, x:x + GLYPH_W] = patch

    greedy = TemplateOcrEngine().detect_and_recognize(img)[0]["text"]
    beamed = CCBeamOcrEngine().detect_and_recognize(img)[0]["text"]
    assert greedy == f"12{l_ch}"  # font-order tiebreak misreads
    assert beamed == f"12{d_ch}"  # class-bigram prior repairs it


def test_ccbeam_engine_factory():
    from documentprocessor_spark.operators.ocr_kernel import (
        CCBeamOcrEngine, get_ocr_engine)

    assert isinstance(get_ocr_engine("ccbeam"), CCBeamOcrEngine)
