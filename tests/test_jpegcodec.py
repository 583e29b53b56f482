"""Baseline JPEG codec tests: exact constant-tile roundtrips, smooth
tolerance, color subsampling, restart markers, quarantine paths."""

from __future__ import annotations

import numpy as np
import pytest

from geohub_data_pipeline_spark.functions import jpegcodec as J


def _tiled(vals):
    ny, nx = len(vals), len(vals[0])
    img = np.zeros((ny * 8, nx * 8), dtype=np.uint8)
    for ty in range(ny):
        for tx in range(nx):
            img[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = vals[ty][tx]
    return img


def test_zigzag_is_the_standard_order():
    # the canonical first and last entries of T.81 Figure 5
    assert J.ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                            (0, 2)]
    # d=13 is odd -> down-left traversal: (6,7) before (7,6)
    assert J.ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(J.ZIGZAG)) == 64


def test_constant_even_tiles_roundtrip_exactly():
    img = _tiled([[10, 60, 200, 128], [32, 90, 154, 246],
                  [0, 2, 250, 100]])
    dec = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img))
    np.testing.assert_array_equal(dec, img)


def test_smooth_gradient_within_quantization_error():
    g = (np.add.outer(np.arange(40), np.arange(56)) * 2 % 256) \
        .astype(np.uint8)
    d = J.decode_baseline_jpeg(J.encode_baseline_jpeg(g))
    assert d.shape == g.shape
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 4


def test_color_444_and_420():
    rgb = np.zeros((16, 24, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 64, 30
    rgb[8:, 8:16] = (10, 220, 90)
    d = J.decode_baseline_jpeg(J.encode_baseline_jpeg(rgb, "4:4:4"))
    assert d.shape == rgb.shape
    # flat regions reconstruct closely at full chroma resolution
    assert np.abs(d[:8, :8].astype(int)
                  - rgb[:8, :8].astype(int)).max() <= 6
    d = J.decode_baseline_jpeg(J.encode_baseline_jpeg(rgb, "4:2:0"))
    assert d.shape == rgb.shape
    # subsampled chroma rings near the color edge; bound the average
    assert np.abs(d.astype(int) - rgb.astype(int)).mean() <= 8


def test_restart_markers_and_odd_dims():
    img = _tiled([[20, 40], [60, 80]])
    d = J.decode_baseline_jpeg(J.encode_baseline_jpeg(
        img, restart_interval=1))
    np.testing.assert_array_equal(d, img)
    odd = (np.arange(13 * 21).reshape(13, 21) % 200).astype(np.uint8)
    d = J.decode_baseline_jpeg(J.encode_baseline_jpeg(odd))
    assert d.shape == (13, 21)


def test_quarantine_paths():
    with pytest.raises(ValueError):
        J.decode_baseline_jpeg(b"\x89PNG")
    # progressive SOF2 must be rejected, not mis-decoded
    img = _tiled([[100]])
    enc = bytearray(J.encode_baseline_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        J.decode_baseline_jpeg(bytes(enc))


def test_multimodal_decode_uses_real_pixels():
    """_decode_jpeg now reports decode-true metadata for baseline
    streams (and still probes dims for progressive)."""
    from geohub_data_pipeline_spark.operators import multimodal as MM

    img = _tiled([[10, 20], [30, 40], [50, 60]])   # 24x16
    enc = J.encode_baseline_jpeg(img)
    meta = MM._decode_one("image", enc)
    assert meta["ok"] and (meta["width"], meta["height"]) == (16, 24)
    assert meta["n_channels"] == 1

    prog = bytearray(enc)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    meta2 = MM._decode_one("image", bytes(prog))
    assert meta2["ok"] and (meta2["width"], meta2["height"]) == (16, 24)
