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


def test_audio_features_closed_form(spark):
    import math
    import struct

    # 4 samples: +100, -200, +300, 0  (little-endian int16) + odd tail byte
    payload = struct.pack("<4h", 100, -200, 300, 0) + b"\x7f"
    media = spark.createDataFrame(
        [("a1", payload), ("a2", b""), ("a3", None)],
        "media_id string, payload binary",
    )
    got = {
        r.media_id: r
        for r in multimodal.extract_audio_features(media).collect()
    }
    a1 = got["a1"]
    assert a1.n_samples == 4
    assert a1.duration_ms == 4 * 1000 // 16000
    assert a1.rms == round(
        math.sqrt((100**2 + 200**2 + 300**2 + 0) / 4), 6
    )
    # sign flips: +100/-200, -200/+300 -> 2 (0 counts as non-negative)
    assert a1.zero_crossings == 2
    assert got["a2"].status == "failed" and got["a3"].status == "failed"


def test_audio_real_decode_is_explicit_stub(spark):
    media = spark.createDataFrame(
        [("a1", b"\x00\x01")], "media_id string, payload binary"
    )
    out = multimodal.extract_audio_features(media, allow_fake=False).collect()
    assert out[0].status == "failed"
    assert "not in this container" in out[0].error


def test_video_frame_sampling_shape_and_determinism(spark):
    media = spark.createDataFrame(
        [
            ("v1", "video", bytes(range(48)), "video/fake", 8, 4, 5000),
            ("v2", "video", b"", "video/fake", 8, 4, 3000),
        ],
        multimodal.MEDIA,
    )
    rows = multimodal.sample_video_frames(media, every_n=2).collect()
    v1 = sorted(
        (r for r in rows if r.media_id == "v1"), key=lambda r: r.frame_idx
    )
    # 5 frames at 1 fps, every 2nd -> indexes 0, 2, 4
    assert [r.frame_idx for r in v1] == [0, 2, 4]
    assert all(r.status == "done" for r in v1)
    # frame 0 luma: tiled bytes 0..47 cycle over 8*4*3=96 byte slots
    import numpy as np

    frames = multimodal._decode_video_frames_stub(bytes(range(48)), 8, 4, 5)
    luma0 = (
        0.299 * frames[0, ..., 0]
        + 0.587 * frames[0, ..., 1]
        + 0.114 * frames[0, ..., 2]
    ).mean()
    assert v1[0].mean_luma == round(float(luma0), 6)
    v2 = [r for r in rows if r.media_id == "v2"]
    assert len(v2) == 1 and v2[0].status == "failed"
    # exploded inside the kernel: rerun is identical
    rows2 = multimodal.sample_video_frames(media, every_n=2).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))
