"""Multimodal column plumbing tests (north star)."""

from __future__ import annotations

import hashlib

from geohub_data_pipeline_spark.operators import multimodal as M


def _media(spark):
    rows = [
        (1, "image", M.fake_media_payload("image", width=640, height=480,
                                          n_channels=3, body=b"im1"), "s1"),
        (2, "audio", M.fake_media_payload("audio", n_channels=2,
                                          n_samples=44100 * 3,
                                          sample_rate=44100), "s1"),
        (3, "video", M.fake_media_payload("video", width=1920, height=1080,
                                          n_samples=900), "s2"),
        (4, "image", b"\x89PNG-not-really", "s2"),     # corrupt PNG
        # REAL media bytes, decoded by the stdlib codecs
        (5, "image", M.encode_png_gray(17, 9), "s3"),
        (6, "audio", M.encode_wav_pcm16(480, 16000, n_channels=2), "s3"),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_decode_media(spark):
    out = {r.media_id: r for r in M.decode_media(_media(spark)).collect()}
    assert out[1].ok and (out[1].width, out[1].height) == (640, 480)
    assert out[2].ok and out[2].sample_rate == 44100
    assert out[3].ok and out[3].n_samples == 900
    # failure is a quarantine row, not a task failure
    assert out[4].ok is False and "decode-error" in out[4].error
    # payload bytes + content hash always present (typed metadata)
    payload = M.fake_media_payload("image", width=640, height=480,
                                   n_channels=3, body=b"im1")
    assert out[1].payload_bytes == len(payload)
    assert out[1].content_hash == hashlib.md5(payload).hexdigest()
    # REAL PNG: width/height/channels come from actual IHDR + inflate
    assert out[5].ok and (out[5].width, out[5].height,
                          out[5].n_channels) == (17, 9, 1)
    # REAL WAV: frames/rate/channels come from the actual RIFF header
    assert out[6].ok and (out[6].n_samples, out[6].sample_rate,
                          out[6].n_channels) == (480, 16000, 2)


def test_stdlib_codecs_roundtrip():
    """Encoder/decoder pair on genuine bytes, no Spark involved."""
    png = M.encode_png_gray(5, 3)
    meta = M._decode_one("image", png)
    assert meta["ok"] and (meta["width"], meta["height"]) == (5, 3)
    # corrupt the IDAT length field -> decode-error, never an exception
    bad = png[:40] + b"\xff" + png[41:]
    assert "decode-error" in M._decode_one("image", bad)["error"]

    wav = M.encode_wav_pcm16(100, 8000)
    meta = M._decode_one("audio", wav)
    assert meta["ok"] and meta["n_samples"] == 100 \
        and meta["sample_rate"] == 8000
    assert "decode-error" in M._decode_one(
        "audio", wav[:20])["error"]


def test_frame_sample_plan(spark):
    decoded = M.decode_media(_media(spark))
    plan = M.frame_sample_plan(decoded, every_n=300).collect()
    # 900 frames sampled every 300 -> 0, 300, 600 (+ frame 899 boundary)
    idx = sorted(r.frame_idx for r in plan if r.media_id == 3)
    assert idx == [0, 300, 600]
    # only video rows produce frames
    assert {r.media_id for r in plan} == {3}
