"""GeoTIFF pixel reader (sources/geotiff.py) — TIFF 6.0 layouts,
codecs, predictor, and the Spark BLOCK/georef integration."""

import struct

import numpy as np
import pytest

from geohub_data_pipeline_spark.sources import geotiff as GT


def _entry(tag, typ, count, value):
    sizes = {3: 2, 4: 4}
    if typ == 3 and count == 1:
        return struct.pack("<HHIHH", tag, typ, count, value, 0)
    return struct.pack("<HHII", tag, typ, count, value)


def build_strip_tiff(arr: np.ndarray, compression=1, predictor=1,
                     rows_per_strip=None, spp=1) -> bytes:
    """Minimal little-endian stripped TIFF writer for fixtures
    (uint8; chunky when spp > 1 with bands stacked in axis 2)."""
    if spp > 1:
        h, w, _ = arr.shape
    else:
        h, w = arr.shape
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        chunk = arr[y0:y0 + rps]
        if predictor == 2:
            chunk = chunk.astype(np.uint8)
            chunk = np.concatenate(
                [chunk[:, :1], np.diff(chunk, axis=1)], axis=1) \
                .astype(np.uint8)
        raw = chunk.tobytes()
        if compression == 5:
            raw = GT.tiff_lzw_encode(raw)
        elif compression == 8:
            import zlib
            raw = zlib.compress(raw)
        strips.append(raw)

    ntags = 11
    header = 8
    ifd_off = header
    ifd_size = 2 + 12 * ntags + 4
    arrays_off = ifd_off + ifd_size
    n = len(strips)
    offs_pos = arrays_off
    cnts_pos = offs_pos + 4 * n
    data_pos = cnts_pos + 4 * n
    offs = []
    pos = data_pos
    for s in strips:
        offs.append(pos)
        pos += len(s)
    tags = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
        (259, 3, 1, compression), (262, 3, 1, 1),
        (273, 4, n, offs[0] if n == 1 else offs_pos),
        (277, 3, 1, spp),
        (278, 4, 1, rps),
        (279, 4, n, len(strips[0]) if n == 1 else cnts_pos),
        (284, 3, 1, 1),
        (317, 3, 1, predictor),
    ]
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", ntags)
    for t in sorted(tags):
        out += _entry(*t)
    out += struct.pack("<I", 0)
    out += b"".join(struct.pack("<I", o) for o in offs)
    out += b"".join(struct.pack("<I", len(s)) for s in strips)
    for s in strips:
        out += s
    return bytes(out)


def test_tiff_lzw_roundtrip_and_early_change():
    rng = np.random.default_rng(9)
    for n in (1, 253, 254, 511, 5000, 100000):
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        assert GT.tiff_lzw_decode(GT.tiff_lzw_encode(data), n) == data
    rep = b"tobeornottobe" * 9000          # table resets
    assert GT.tiff_lzw_decode(GT.tiff_lzw_encode(rep), len(rep)) == rep


def test_packbits():
    assert GT._packbits_decode(
        bytes([2, 10, 20, 30, 255, 7]), 5) == bytes(
        [10, 20, 30, 7, 7])


def test_read_own_cog_output():
    """The engine's own COG (zstd, tiled, float64, GeoKeys) reads
    back bit-exact with georeferencing."""
    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )

    def tiles_of(a):
        h, w = a.shape
        out = {}
        for ty in range((h + 255) // 256):
            for tx in range((w + 255) // 256):
                t = np.zeros((256, 256))
                sub = a[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256]
                t[:sub.shape[0], :sub.shape[1]] = sub
                out[(tx, ty)] = t
        return out

    lv0 = np.arange(300 * 270, dtype=np.float64).reshape(300, 270)
    blob = geotiff_bytes([_Level(270, 300, tiles_of(lv0))],
                         epsg=32633, pixel_scale=(100.0, 100.0),
                         origin=(400000.0, 5300000.0))
    d = GT.read_geotiff(blob)
    assert (d["width"], d["height"], d["srid"]) == (270, 300, 32633)
    assert d["origin"] == (400000.0, 5300000.0)
    assert d["pixel_scale"] == (100.0, 100.0)
    assert np.array_equal(d["bands"][0], lv0)


@pytest.mark.parametrize("compression,predictor", [
    (1, 1), (5, 1), (5, 2), (8, 1), (8, 2), (32773, 1)])
def test_stripped_variants(compression, predictor):
    rng = np.random.default_rng(compression * 10 + predictor)
    arr = rng.integers(0, 255, size=(70, 90), dtype=np.uint8)
    if compression == 32773:
        # decode-only check (literal-run packbits stream); the module
        # ships no packbits encoder, so the container path is covered
        # by the uncompressed build + the raw codec check here
        raw = arr.tobytes()
        enc = bytearray()
        for i in range(0, len(raw), 128):
            chunk = raw[i:i + 128]
            enc.append(len(chunk) - 1)
            enc += chunk
        assert GT._packbits_decode(bytes(enc), len(raw)) == raw
        d0 = GT.read_geotiff(build_strip_tiff(arr, compression=1))
        assert np.array_equal(d0["bands"][0].astype(np.uint8), arr)
        return
    blob = build_strip_tiff(arr, compression=compression,
                            predictor=predictor, rows_per_strip=16)
    d = GT.read_geotiff(blob)
    assert np.array_equal(d["bands"][0].astype(np.uint8), arr), \
        (compression, predictor)


def test_chunky_multiband():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, size=(40, 30, 3), dtype=np.uint8)
    blob = build_strip_tiff(arr, spp=3, rows_per_strip=13)
    d = GT.read_geotiff(blob)
    assert len(d["bands"]) == 3
    for b in range(3):
        assert np.array_equal(d["bands"][b].astype(np.uint8),
                              arr[:, :, b])


def test_spark_blocks_and_cli_end_to_end(spark, tmp_path, capsys):
    """.tif -> BLOCK rows + georef -> CLI: warp -> cascade -> valid
    COG out (the reference's most common raster ingest)."""
    from geohub_data_pipeline_spark.cli import main
    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )
    from geohub_data_pipeline_spark.operators.rasterprobe import (
        probe_geotiff,
        validate_cog,
    )

    def tiles_of(a):
        h, w = a.shape
        out = {}
        for ty in range((h + 255) // 256):
            for tx in range((w + 255) // 256):
                t = np.zeros((256, 256))
                sub = a[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256]
                t[:sub.shape[0], :sub.shape[1]] = sub
                out[(tx, ty)] = t
        return out

    lv0 = (np.arange(300 * 280, dtype=np.float64)
           .reshape(300, 280) % 101)
    # a 4326 georeferenced source tif (0.01 deg pixels near 12E 48N)
    blob = geotiff_bytes([_Level(280, 300, tiles_of(lv0))],
                         epsg=4326, pixel_scale=(0.01, 0.01),
                         origin=(12.0, 48.0))
    (tmp_path / "up.tif").write_bytes(blob)

    blocks = GT.blocks_from_geotiff(spark, str(tmp_path / "up.tif"))
    assert blocks.count() == 4             # 280x300 -> 2x2 blocks
    g = GT.georef_from_geotiff(
        spark, str(tmp_path / "up.tif")).collect()[0]
    assert (g.origin_x, g.origin_y, g.georef_srid) == (12.0, 48.0, 4326)

    rc = main(["--raster", str(tmp_path / "up.tif"),
               "--dst", str(tmp_path / "out"),
               "--overview-levels", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "valid COG" in out
    import glob
    cogs = glob.glob(str(tmp_path / "out" / "cog" / "*.tif"))
    assert cogs
    payload = open(cogs[0], "rb").read()
    assert validate_cog(payload)["valid"]
    assert probe_geotiff(payload)["epsg"] == 3857   # warped


def test_zipped_raster_upload_cli(spark, tmp_path, capsys):
    """zip(.tif + .asc) --raster upload: members decode, warp,
    cascade and land as validated COGs (the /vsizip/ path)."""
    import io
    import zipfile

    from geohub_data_pipeline_spark.cli import main
    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )

    arr = (np.arange(80 * 70, dtype=np.float64).reshape(80, 70) % 13)
    tif = geotiff_bytes(
        [_Level(70, 80, {(0, 0): np.pad(
            arr, ((0, 176), (0, 186)))})],
        epsg=4326, pixel_scale=(0.02, 0.02), origin=(5.0, 47.0))
    asc = ("ncols 50\nnrows 40\nxllcorner 8.0\nyllcorner 44.0\n"
           "cellsize 0.05\nnodata_value -9999\n"
           + "\n".join(" ".join(str((r * 50 + c) % 7)
                                for c in range(50))
                       for r in range(40)))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("up/cover.tif", tif)
        zf.writestr("up/dem.asc", asc)
    (tmp_path / "up.zip").write_bytes(buf.getvalue())

    rc = main(["--raster", str(tmp_path / "up.zip"),
               "--dst", str(tmp_path / "out"),
               "--overview-levels", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("valid COG") == 2     # one per member dataset


def test_auto_rgb_dispatch_cli(spark, tmp_path, capsys):
    """T12 auto-dispatch: an RGB-photometric 3-band .tif becomes ONE
    composite COG while a gray sibling stays per-band — no flag."""
    from geohub_data_pipeline_spark.cli import main
    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )

    h, w = 80, 90
    rgb_tiles = {(0, 0): np.stack(
        [np.pad(((np.arange(h * w) * b) % 97).reshape(h, w)
                .astype(float), ((0, 176), (0, 166)))
         for b in (1, 2, 3)], axis=2)}
    (tmp_path / "rgb.tif").write_bytes(geotiff_bytes(
        [_Level(w, h, rgb_tiles)], epsg=4326,
        pixel_scale=(0.02, 0.02), origin=(6.0, 49.0)))
    gray = {(0, 0): np.pad((np.arange(h * w) % 50).reshape(h, w)
                           .astype(float), ((0, 176), (0, 166)))}
    (tmp_path / "gray.tif").write_bytes(geotiff_bytes(
        [_Level(w, h, gray)], epsg=4326,
        pixel_scale=(0.02, 0.02), origin=(6.0, 49.0)))

    rc = main(["--raster", str(tmp_path),
               "--dst", str(tmp_path / "out"),
               "--overview-levels", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3-band rgb" in out
    assert "band 1" in out                # gray stays per-band
    assert out.count("valid COG") == 2
