"""Multimodal plumbing: schema, batch shape, per-row failure contract."""

from documentprocessor_spark.operators import multimodal


def test_image_features_deterministic(spark):
    media = multimodal.synthetic_media(spark, n=12)
    out1 = sorted(
        (r.asDict(recursive=True) for r in
         multimodal.extract_image_features(media).collect()),
        key=lambda r: r["media_id"],
    )
    out2 = sorted(
        (r.asDict(recursive=True) for r in
         multimodal.extract_image_features(media).collect()),
        key=lambda r: r["media_id"],
    )
    assert out1 == out2
    assert all(r["status"] == "done" for r in out1)
    assert all(len(r["histogram"]) == 8 for r in out1)
    assert all(0.0 <= r["mean_luma"] <= 255.0 for r in out1)


def test_real_decode_is_explicit_stub(spark):
    media = multimodal.synthetic_media(spark, n=3)
    out = multimodal.extract_image_features(media, allow_fake=False).collect()
    assert all(r["status"] == "failed" for r in out)
    assert all("not in this container" in r["error"] for r in out)
