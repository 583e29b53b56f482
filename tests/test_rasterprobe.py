"""GeoTIFF probe tests (S5/S6): cogwriter output, endianness, and
quarantine behavior."""

from __future__ import annotations

import struct

import numpy as np

from geohub_data_pipeline_spark.operators import cogwriter as W
from geohub_data_pipeline_spark.operators import rasterprobe as P


def _write_sample(tmp_path, compress=True, epsg=3857):
    full = W._Level(width=300, height=280, tiles={
        (tx, ty): np.full((W.TILE, W.TILE), tx + ty, dtype=np.float64)
        for tx in range(2) for ty in range(2)})
    ovr = W._Level(width=150, height=140, tiles={
        (0, 0): np.zeros((W.TILE, W.TILE), dtype=np.float64)})
    path = str(tmp_path / "probe.tif")
    W.write_geotiff(path, [full, ovr], epsg=epsg,
                    pixel_scale=(10.0, 10.0), origin=(500.0, 900.0),
                    compress=compress)
    with open(path, "rb") as f:
        return f.read()


def test_probe_cogwriter_output(tmp_path):
    blob = _write_sample(tmp_path)
    m = P.probe_geotiff(blob)
    assert (m["width"], m["height"]) == (300, 280)
    assert m["n_bands"] == 1 and m["bits_per_sample"] == 64
    assert m["sample_format"] == 3                  # IEEE float
    assert m["tiled"] and (m["tile_width"], m["tile_height"]) == (256, 256)
    assert m["n_overviews"] == 1
    assert m["epsg"] == 3857
    assert (m["pixel_scale_x"], m["pixel_scale_y"]) == (10.0, 10.0)
    assert (m["origin_x"], m["origin_y"]) == (500.0, 900.0)
    assert m["compression"] in ("zstd", "deflate")
    # uncompressed variant records 'none'
    m2 = P.probe_geotiff(_write_sample(tmp_path, compress=False,
                                       epsg=32633))
    assert m2["compression"] == "none" and m2["epsg"] == 32633


def test_probe_big_endian_minimal():
    """Hand-built big-endian baseline TIFF: 7x5, one strip."""
    entries = [
        (256, 3, 1, 7 << 16),      # width (SHORT inline, left-justified)
        (257, 3, 1, 5 << 16),
        (259, 3, 1, 1 << 16),
        (277, 3, 1, 3 << 16),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(
        struct.pack(">HHII", *e) for e in entries) + struct.pack(">I", 0)
    blob = struct.pack(">2sHI", b"MM", 42, 8) + ifd
    m = P.probe_geotiff(blob)
    assert (m["width"], m["height"], m["n_bands"]) == (7, 5, 3)
    assert m["tiled"] is False and m["n_overviews"] == 0
    assert m["compression"] == "none" and m["epsg"] is None


def test_probe_rasters_dataframe(spark, tmp_path):
    good = _write_sample(tmp_path)
    rows = [("a.tif", good), ("bad.tif", b"II*\x00garbage"),
            ("not.tif", b"hello")]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r.path: r for r in P.probe_rasters(df).collect()}
    assert out["a.tif"].ok and out["a.tif"].width == 300 \
        and out["a.tif"].n_overviews == 1
    assert out["bad.tif"].ok is False \
        and "probe-error" in out["bad.tif"].error
    assert out["not.tif"].ok is False
