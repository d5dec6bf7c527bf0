"""P1-P10 numpy kernels: guard math exactness (mirrors the reference's
test_image_preprocessor.py:343-412), per-op contracts, Spark stage."""

import numpy as np
import pytest

from documentprocessor_spark.operators import imageprep as ip
from documentprocessor_spark.operators.multimodal import synthetic_media


def test_guard_constants_exact():
    assert ip.TESSERACT_MAX_DIMENSION == 32767
    assert ip.PILLOW_MAX_PIXELS == 178956970


def test_resample_dimension_math_truncates():
    # 1000px @ 72dpi -> 300dpi: 1000 * 300/72 = 4166.66 -> 4166
    assert ip.calculate_resampled_dimensions(1000, 500, 72.0, 300) == (4166, 2083)
    # zero/negative dpi defaults to 72
    assert ip.calculate_resampled_dimensions(1000, 500, 0, 300) == (4166, 2083)


def test_find_safe_dpi_backoff():
    # small image: target dpi fits
    assert ip.find_safe_dpi(1000, 1000, 300.0, 300) == 300
    # huge: needs backoff below 300 (8000px @72 -> only 100 dpi fits Pillow cap)
    got = ip.find_safe_dpi(8000, 8000, 72.0, 300)
    assert got == 100
    w, h = ip.calculate_resampled_dimensions(8000, 8000, 72.0, got)
    assert w <= 32767 and h <= 32767 and w * h <= 178956970
    # hopeless even at 100 dpi (matches reference: None, no resample)
    assert ip.find_safe_dpi(10000, 10000, 72.0, 300) is None


def test_grayscale_and_threshold():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[..., 0] = 255  # pure red
    g = ip.grayscale(img)
    assert g.shape == (4, 4)
    assert int(g[0, 0]) == 76  # 0.299*255 rounded
    t = ip.threshold(g, 50)
    assert set(np.unique(t)) <= {0, 255}
    assert t[0, 0] == 0  # 76 <= 127.5


def test_auto_level_stretches():
    img = np.full((4, 4), 100, dtype=np.uint8)
    img[0, 0] = 50
    img[3, 3] = 150
    lev = ip.auto_level(img)
    assert lev.min() == 0 and lev.max() == 255


def test_remove_background_snaps_near_white():
    img = np.array([[250, 100], [200, 0]], dtype=np.uint8)
    out = ip.remove_background(img, fuzz_percent=30)  # cutoff 178.5
    # 250 and 200 snap to white pre-stretch; after auto-level max stays 255
    assert out[0, 0] == 255 and out[1, 0] == 255
    assert out[1, 1] == 0


def test_sigmoidal_contrast_is_monotone_lut():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = ip.sigmoidal_contrast(img)
    flat = out.astype(int).ravel()
    assert (np.diff(flat) >= 0).all()
    assert flat[0] == 0 and flat[-1] == 255


def test_denoise_smooths():
    img = np.zeros((5, 5), dtype=np.uint8)
    img[2, 2] = 255  # single hot pixel
    out = ip.denoise(img)
    assert out[2, 2] < 255
    assert out[0, 0] < 30


def test_deskew_recovers_sheared_stripe():
    # horizontal dark stripe sheared by +3 degrees; deskew should restore
    h, w = 60, 120
    img = np.full((h, w), 255, dtype=np.uint8)
    slope = np.tan(np.deg2rad(3))
    for c in range(w):
        r = 30 + int(c * slope)
        img[r - 1 : r + 2, c] = 0
    est = ip.estimate_skew(img)
    assert est != 0
    fixed = ip.deskew(img)
    # after deskew the ink rows concentrate: max row-ink increases
    assert (fixed < 128).sum(axis=1).max() > (img < 128).sum(axis=1).max()


def test_resample_shapes():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    up = ip.resample(img, 2.0)
    down = ip.resample(img, 0.5)
    assert up.shape == (20, 20) and down.shape == (5, 5)
    assert up[0, 0] == img[0, 0]


def test_preprocess_chain_shape_and_determinism():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (40, 30, 3), dtype=np.uint8)
    a = ip.preprocess_chain(img, do_deskew=True, do_denoise=True,
                            apply_threshold=True)
    b = ip.preprocess_chain(img, do_deskew=True, do_denoise=True,
                            apply_threshold=True)
    assert a.shape == (40, 30, 3)
    assert (a == b).all()
    assert (a[..., 0] == a[..., 1]).all()  # RGB from grayscale stack


def test_spark_preprocess_stage(spark):
    media = synthetic_media(spark, n=8)
    out = {r["media_id"]: r.asDict() for r in ip.preprocess_media(media).collect()}
    assert len(out) == 8
    for r in out.values():
        assert r["status"] == "done"
        assert r["safe_dpi"] == 300  # tiny fakes always fit
        assert 0.0 <= r["mean_intensity"] <= 255.0
