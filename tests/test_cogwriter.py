"""COG writer tests — verified with an INDEPENDENT minimal TIFF parser
(not the writer's own code paths)."""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest

from geohub_data_pipeline_spark.functions import compression as CMP
from geohub_data_pipeline_spark.operators import cogwriter as CW
from geohub_data_pipeline_spark.operators import raster as R

# what compress=True negotiates in THIS environment
NEGOTIATED_TAG = CW._TAG_OF[CMP.negotiate("zstd")]


def parse_tiff(path: str) -> list[dict]:
    """Minimal independent TIFF reader: returns one dict per IFD."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:4] == b"II\x2a\x00"
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    ifds = []
    while ifd_off:
        (n,) = struct.unpack_from("<H", buf, ifd_off)
        tags = {}
        for i in range(n):
            tag, typ, count, val = struct.unpack_from(
                "<HHII", buf, ifd_off + 2 + 12 * i)
            tags[tag] = (typ, count, val)
        ifds.append(tags)
        (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n)

    out = []
    for tags in ifds:
        w = tags[CW.T_IMAGE_WIDTH][2]
        h = tags[CW.T_IMAGE_LENGTH][2]
        n_tiles = tags[CW.T_TILE_OFFSETS][1]
        if n_tiles == 1:
            offsets = [tags[CW.T_TILE_OFFSETS][2]]
            counts = [tags[CW.T_TILE_BYTE_COUNTS][2]]
        else:
            o = tags[CW.T_TILE_OFFSETS][2]
            offsets = list(struct.unpack_from(f"<{n_tiles}I", buf, o))
            c = tags[CW.T_TILE_BYTE_COUNTS][2]
            counts = list(struct.unpack_from(f"<{n_tiles}I", buf, c))
        comp = tags[CW.T_COMPRESSION][2]

        def undo(blob, comp=comp):
            if comp == 8:
                return zlib.decompress(blob)
            if comp == 50000:
                # the Arrow zstd codec is an implementation
                # independent of the writer's byte path; the frame is
                # self-describing (RFC 8878 content size)
                assert blob[:4] == CMP.ZSTD_MAGIC
                return CMP.zstd_decompress(bytes(blob))
            return blob

        raw = [undo(buf[off:off + cnt])
               for off, cnt in zip(offsets, counts)]
        tiles = [
            np.frombuffer(t, dtype="<f8").reshape(CW.TILE, CW.TILE)
            for t in raw
        ]
        out.append({
            "width": w, "height": h, "tiles": tiles,
            "bits": tags[CW.T_BITS_PER_SAMPLE][2],
            "sample_format": tags[CW.T_SAMPLE_FORMAT][2],
            "compression": tags[CW.T_COMPRESSION][2],
            "has_geokeys": CW.T_GEO_KEY_DIRECTORY in tags,
        })
    return out


def _blocks(spark, grid_w=2, grid_h=2, dataset="r1", band=1):
    full_w, full_h = grid_w * R.BLOCK - 40, grid_h * R.BLOCK - 96
    rows = []
    for by in range(grid_h):
        for bx in range(grid_w):
            w = min(R.BLOCK, full_w - bx * R.BLOCK)
            h = min(R.BLOCK, full_h - by * R.BLOCK)
            px = [float((by * R.BLOCK + yy) * 1000 + bx * R.BLOCK + xx)
                  for yy in range(h) for xx in range(w)]
            rows.append((dataset, None, band, 0, bx, by, w, h, px, 0.0, 3857))
    return spark.createDataFrame(rows, R.BLOCK_SCHEMA), full_w, full_h


def test_assemble_cog_writes_valid_multilevel_tiff(spark, tmp_path):
    blocks, full_w, full_h = _blocks(spark)
    pyramid = R.overview_cascade(blocks, levels=1)
    manifest = CW.assemble_cog_tables(pyramid, str(tmp_path)).collect()
    assert len(manifest) == 1
    m = manifest[0]
    assert m.n_levels == 2 and m.n_blocks == 5

    ifds = parse_tiff(m.path)
    assert len(ifds) == 2                      # full res + 1 overview
    full, ovr = ifds
    assert (full["width"], full["height"]) == (full_w, full_h)
    assert (ovr["width"], ovr["height"]) == (
        math.ceil(full_w / 2), math.ceil(full_h / 2))
    for ifd in ifds:
        assert ifd["bits"] == 64 and ifd["sample_format"] == 3
        assert ifd["compression"] == NEGOTIATED_TAG and ifd["has_geokeys"]

    # pixel-level checks against the known pattern v = y*1000 + x
    t0 = full["tiles"][0]
    assert t0[0, 0] == 0.0 and t0[10, 7] == 10_007.0
    # second tile in the row starts at x=256
    t1 = full["tiles"][1]
    assert t1[0, 0] == 256.0
    # overview is the nearest-resampled pattern: (2y)*1000 + 2x
    o0 = ovr["tiles"][0]
    assert o0[3, 5] == 6_010.0


def test_zstd_negotiated_and_roundtrips(tmp_path):
    """The reference COG profile is COMPRESS=ZSTD; with pyarrow's
    codec present the writer must pick zstd, tag it 50000, and the
    tile bytes must be genuine RFC 8878 frames an independent
    decompressor reads back bit-exactly."""
    assert CMP.zstd_available()            # baked into this env
    assert NEGOTIATED_TAG == 50000
    tile = np.arange(CW.TILE * CW.TILE, dtype=np.float64) \
        .reshape(CW.TILE, CW.TILE)
    lv = CW._Level(CW.TILE, CW.TILE, {(0, 0): tile})
    path = str(tmp_path / "z.tif")
    CW.write_geotiff(path, [lv], compress="zstd")
    ifd = parse_tiff(path)[0]
    assert ifd["compression"] == 50000
    assert np.array_equal(ifd["tiles"][0], tile)
    # forced-deflate still works and is tagged honestly
    CW.write_geotiff(path, [lv], compress="deflate")
    ifd = parse_tiff(path)[0]
    assert ifd["compression"] == 8
    assert np.array_equal(ifd["tiles"][0], tile)


def test_zstd_frame_content_size_parse():
    for n in (10, 300, 70000, 600000):
        blob = (b"pattern" * (n // 7 + 1))[:n]
        frame = CMP.zstd_compress(blob)
        assert frame[:4] == CMP.ZSTD_MAGIC
        assert CMP.zstd_frame_content_size(frame) == n
        assert CMP.zstd_decompress(frame) == blob
    assert CMP.zstd_frame_content_size(b"notaframe") is None


def test_rgb_dataset_yields_one_file_per_band(spark, tmp_path):
    b1, *_ = _blocks(spark, dataset="m", band=1)
    b2, *_ = _blocks(spark, dataset="m", band=2)
    blocks = b1.unionByName(b2)
    manifest = {m.band: m for m in
                CW.assemble_cog_tables(blocks, str(tmp_path)).collect()}
    assert set(manifest) == {1, 2}
    assert manifest[1].path != manifest[2].path
    for m in manifest.values():
        assert parse_tiff(m.path)[0]["width"] > 0


def test_validate_cog_rules():
    """rio-cogeo-style validation (ref processing.py:511-514): our
    writer's output passes; layout violations are caught."""
    import struct as _struct

    import numpy as np

    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )
    from geohub_data_pipeline_spark.operators.rasterprobe import (
        validate_cog,
    )

    def tiles_of(arr):
        h, w = arr.shape
        out = {}
        for ty in range((h + 255) // 256):
            for tx in range((w + 255) // 256):
                t = np.zeros((256, 256))
                sub = arr[ty * 256:(ty + 1) * 256,
                          tx * 256:(tx + 1) * 256]
                t[:sub.shape[0], :sub.shape[1]] = sub
                out[(tx, ty)] = t
        return out

    lv0 = np.arange(600 * 700, dtype=np.float64).reshape(600, 700)
    lv1, lv2 = lv0[::2, ::2], lv0[::4, ::4]
    blob = geotiff_bytes([
        _Level(700, 600, tiles_of(lv0)),
        _Level(350, 300, tiles_of(lv1)),
        _Level(175, 150, tiles_of(lv2))])
    v = validate_cog(blob)
    assert v["valid"], v

    # big image, no overviews -> error
    v = validate_cog(geotiff_bytes([_Level(700, 600, tiles_of(lv0))]))
    assert not v["valid"] and "no overviews" in v["errors"][0]

    # small image, no overviews -> fine
    sm = np.ones((64, 80))
    v = validate_cog(geotiff_bytes([_Level(80, 64, tiles_of(sm))]))
    assert v["valid"], v

    # non-TIFF and truncated input -> one structured error
    assert not validate_cog(b"PNG nope")["valid"]
    assert not validate_cog(blob[:60])["valid"]

    # non-decreasing overview chain -> error
    v = validate_cog(geotiff_bytes([
        _Level(700, 600, tiles_of(lv0)),
        _Level(700, 600, tiles_of(lv0))]))
    assert not v["valid"] and "not smaller" in v["errors"][0]


def test_rgb_multiband_cog(spark, tmp_path):
    """T12 composite: 3 bands -> ONE chunky RGB COG, read back band-
    exact by the independent GeoTIFF pixel reader, valid COG layout."""
    import numpy as np

    from geohub_data_pipeline_spark.operators.cogwriter import (
        assemble_cog_rgb_tables,
    )
    from geohub_data_pipeline_spark.operators.rasterprobe import (
        probe_geotiff,
        validate_cog,
    )
    from geohub_data_pipeline_spark.sources.geotiff import read_geotiff

    h, w = 60, 80
    rows = []
    bands_data = {}
    for band in (1, 2, 3):
        arr = ((np.arange(h * w, dtype=np.float64) * band) % 97) \
            .reshape(h, w)
        bands_data[band] = arr
        rows.append(("img", None, band, 0, 0, 0, w, h,
                     arr.ravel().tolist(), 0.0, 3857))
    blocks = spark.createDataFrame(
        rows,
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int")
    m = assemble_cog_rgb_tables(blocks, str(tmp_path)).collect()[0]
    assert m.n_bands == 3
    payload = open(m.path, "rb").read()
    probe = probe_geotiff(payload)
    assert probe["n_bands"] == 3
    assert validate_cog(payload)["valid"]
    d = read_geotiff(payload)
    assert len(d["bands"]) == 3
    for band in (1, 2, 3):
        assert np.array_equal(d["bands"][band - 1][:h, :w],
                              bands_data[band])


def test_dtype_preserving_output():
    """u1/u2/i2/f4 COGs round-trip exact through the independent
    reader with the right BitsPerSample/SampleFormat tags; integer
    output rounds and clips out-of-range values predictably."""
    import numpy as np

    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )
    from geohub_data_pipeline_spark.operators.rasterprobe import (
        probe_geotiff,
        validate_cog,
    )
    from geohub_data_pipeline_spark.sources.geotiff import read_geotiff

    arr = (np.arange(256 * 256) % 256).reshape(256, 256).astype(float)
    lv = [_Level(256, 256, {(0, 0): arr})]
    for dt, bits, sfmt in (("u1", 8, 1), ("u2", 16, 1),
                           ("i2", 16, 2), ("f4", 32, 3)):
        blob = geotiff_bytes(lv, dtype=dt)
        p = probe_geotiff(blob)
        assert (p["bits_per_sample"], p["sample_format"]) == (bits,
                                                              sfmt)
        assert validate_cog(blob)["valid"]
        assert np.array_equal(read_geotiff(blob)["bands"][0], arr)
    # clipping: 300.7 -> 255 in u1; -5 -> 0
    clip = np.array([[300.7, -5.0]] * 256 * 128,
                    dtype=float).reshape(256, 256)
    d = read_geotiff(geotiff_bytes(
        [_Level(256, 256, {(0, 0): clip})], dtype="u1"))
    assert d["bands"][0].max() == 255 and d["bands"][0].min() == 0


def test_dtype_autopreserved_roundtrip(spark, tmp_path):
    """A u1 GeoTIFF in -> a u1 COG out with NO dtype flag: the probed
    source sample type rides the per-dataset dtype sidecar into COG
    assembly (the reference preserves dtype through rio-cogeo's
    profile, ref ingest/config.py:92-101)."""
    import numpy as np

    from geohub_data_pipeline_spark import cli
    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )
    from geohub_data_pipeline_spark.operators.rasterprobe import (
        probe_geotiff,
        validate_cog,
    )

    h, w = 48, 64
    arr = (np.arange(h * w, dtype=np.float64) % 251).reshape(h, w)
    tile = np.zeros((256, 256))
    tile[:h, :w] = arr
    src = tmp_path / "u1src.tif"
    src.write_bytes(geotiff_bytes(
        [_Level(w, h, {(0, 0): tile})], epsg=3857,
        pixel_scale=(500.0, 500.0), origin=(-1000000.0, 3000000.0),
        dtype="u1"))
    dst = tmp_path / "out"
    assert cli.main(["--raster", str(src), "--dst", str(dst)]) == 0
    cogs = list((dst / "cog").glob("*.tif"))
    assert len(cogs) == 1
    payload = cogs[0].read_bytes()
    probe = probe_geotiff(payload)
    # u1 preserved: unsigned-int sample format, 8 bits
    assert (probe["sample_format"], probe["bits_per_sample"]) == (1, 8)
    assert validate_cog(payload)["valid"]

    # explicit override still wins
    dst2 = tmp_path / "out2"
    assert cli.main(["--raster", str(src), "--dst", str(dst2),
                     "--cog-dtype", "f4"]) == 0
    p2 = next((dst2 / "cog").glob("*.tif")).read_bytes()
    probe2 = probe_geotiff(p2)
    assert (probe2["sample_format"], probe2["bits_per_sample"]) == (3, 32)


def test_validate_cog_path_bounded_memory(tmp_path):
    """validate_cog_path reads a HEADER PREFIX only: a multi-GB
    (sparse) COG validates without slurping the file, and a file
    whose IFD structures sit beyond the prefix is reported as
    'headers do not lead', not crashed on."""
    import struct as _struct

    import numpy as np

    from geohub_data_pipeline_spark.operators.cogwriter import (
        _Level,
        geotiff_bytes,
    )
    from geohub_data_pipeline_spark.operators.rasterprobe import (
        validate_cog_path,
    )

    def tiles_of(arr):
        h, w = arr.shape
        out = {}
        for ty in range((h + 255) // 256):
            for tx in range((w + 255) // 256):
                t = np.zeros((256, 256))
                sub = arr[ty * 256:(ty + 1) * 256,
                          tx * 256:(tx + 1) * 256]
                t[:sub.shape[0], :sub.shape[1]] = sub
                out[(tx, ty)] = t
        return out

    lv0 = np.arange(600 * 700, dtype=np.float64).reshape(600, 700)
    blob = geotiff_bytes([
        _Level(700, 600, tiles_of(lv0)),
        _Level(350, 300, tiles_of(lv0[::2, ::2])),
        _Level(175, 150, tiles_of(lv0[::4, ::4]))])

    big = tmp_path / "big.tif"
    with open(big, "wb") as f:
        f.write(blob)
        f.seek(3 << 30)                    # sparse 3 GB artifact
        f.write(b"\x00")
    import resource
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    v = validate_cog_path(str(big))
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert v["valid"], v
    # rss growth far below the 3 GB file (prefix is 4 MB)
    assert (after - before) < (512 << 10)  # KB units on linux

    # IFD beyond the prefix: reported as a layout error
    bad = tmp_path / "bad.tif"
    with open(bad, "wb") as f:
        f.write(b"II" + _struct.pack("<HI", 42, 2000))
        f.seek(4096)
        f.write(b"\x00")
    v = validate_cog_path(str(bad), prefix_bytes=1024)
    assert not v["valid"]
    assert any("headers do not lead" in e for e in v["errors"])
