"""NetCDF-4/HDF5 source tests: spec-built files through the reader,
chunked+filtered layouts, and the raster block pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from geohub_data_pipeline_spark.operators import raster as R
from geohub_data_pipeline_spark.sources import hdf5 as H5


def test_contiguous_roundtrip(tmp_path):
    temp = np.arange(12, dtype="<f8").reshape(3, 4) * 1.5
    path = str(tmp_path / "t.nc4")
    H5.write_hdf5(path, {"temp": temp})
    with open(path, "rb") as f:
        payload = f.read()
    dsets = H5.read_hdf5_datasets(payload)
    assert [d.name for d in dsets] == ["temp"]
    assert dsets[0].shape == [3, 4]
    np.testing.assert_array_equal(dsets[0].data, temp)


def test_chunked_deflate_shuffle_roundtrip(tmp_path):
    elev = np.arange(64, dtype="<f4").reshape(8, 8)
    path = str(tmp_path / "c.nc4")
    H5.write_hdf5(path, {"elev": elev}, chunked={"elev"})
    with open(path, "rb") as f:
        payload = f.read()
    (ds,) = H5.read_hdf5_datasets(payload)
    np.testing.assert_allclose(ds.data, elev.astype(np.float64))


def test_3d_int_and_fillvalue(tmp_path):
    cube = np.arange(24, dtype="<i4").reshape(2, 3, 4)
    path = str(tmp_path / "i.nc4")
    H5.write_hdf5(path, {"cube": cube}, fillvalues={"cube": -99.0})
    with open(path, "rb") as f:
        payload = f.read()
    (ds,) = H5.read_hdf5_datasets(payload)
    assert ds.shape == [2, 3, 4] and ds.fillvalue == -99.0
    np.testing.assert_array_equal(ds.data, cube.astype(np.float64))


def test_quarantine_contract():
    with pytest.raises(ValueError):
        H5.read_hdf5_datasets(b"CDF\x01not hdf5")
    with pytest.raises(ValueError):
        H5.read_hdf5_datasets(H5.SIGNATURE + b"\x09garbage")
    # classic NetCDF-3 bytes must NOT parse here (and vice versa:
    # netcdf3.parse rejects the HDF5 signature)
    from geohub_data_pipeline_spark.sources import netcdf3 as NC
    with pytest.raises(ValueError):
        NC.parse_netcdf3(H5.SIGNATURE + b"\x00" * 64)


def test_blocks_from_netcdf4_spark(spark, tmp_path):
    temp = np.arange(300 * 270, dtype="<f8").reshape(300, 270) % 100
    cube = np.arange(2 * 5 * 6, dtype="<f4").reshape(2, 5, 6)
    lat = np.arange(300, dtype="<f8")            # 1-D: skipped
    H5.write_hdf5(str(tmp_path / "a.nc4"),
                  {"temp": temp, "cube": cube, "lat": lat},
                  chunked={"temp"}, fillvalues={"cube": -1.0})
    with open(tmp_path / "junk.nc4", "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\n" + b"\xff" * 32)  # quarantined

    blocks = H5.blocks_from_netcdf4(spark, str(tmp_path))
    rows = blocks.collect()
    assert {r.dataset for r in rows} == {"a.nc4"}
    assert {(r.subdataset, r.band) for r in rows} == {
        ("temp", 1), ("cube", 1), ("cube", 2)}
    t00 = [r for r in rows
           if r.subdataset == "temp" and (r.block_x, r.block_y) == (0, 0)
           ][0]
    assert t00.pixels[0] == temp[0, 0]
    assert t00.width == 256 and t00.height == 256
    cb2 = [r for r in rows if r.subdataset == "cube" and r.band == 2][0]
    assert cb2.pixels[0] == float(cube[1, 0, 0])
    assert cb2.nodata == -1.0

    # same cascade -> COG path as every other raster format
    audit = {(r.subdataset, r.level): r.n_blocks for r in R.block_audit(
        R.overview_cascade(blocks, levels=1)).collect()
        if r.subdataset == "temp"}
    assert audit[("temp", 0)] == 4 and audit[("temp", 1)] == 1


def test_subgroup_walk(tmp_path):
    """Datasets keep group-qualified names (netCDF-4 groups)."""
    # build a file, then a second one whose dataset lives in the root —
    # grouped fixtures use the reader's recursive walk via nested
    # symbol tables, which the fixture writer emits flat; assert the
    # flat walk is stable and sorted
    a = np.ones((2, 2))
    b = np.zeros((2, 2))
    H5.write_hdf5(str(tmp_path / "m.nc4"), {"b": b, "a": a})
    with open(tmp_path / "m.nc4", "rb") as f:
        ds = H5.read_hdf5_datasets(f.read())
    assert [d.name for d in ds] == ["a", "b"]


def test_georef_of_netcdf4(tmp_path):
    temp = np.arange(12, dtype="<f8").reshape(3, 4)
    ys = np.array([50.0, 49.0, 48.0])            # descending: north-up
    xs = np.array([10.0, 10.5, 11.0, 11.5])
    H5.write_hdf5(str(tmp_path / "g.nc4"),
                  {"temp": temp, "y": ys, "x": xs})
    with open(tmp_path / "g.nc4", "rb") as f:
        g = H5.georef_of_netcdf4(f.read())
    assert g == (10.0 - 0.25, 50.0 + 0.5, 0.5, 1.0)
    # no coordinate datasets -> None
    H5.write_hdf5(str(tmp_path / "n.nc4"), {"temp": temp})
    with open(tmp_path / "n.nc4", "rb") as f:
        assert H5.georef_of_netcdf4(f.read()) is None


def test_cli_raster_nc4(spark, tmp_path, capsys):
    """.nc4 -> cascade -> georeferenced COG via the CLI (T11/T14)."""
    from geohub_data_pipeline_spark import cli
    from geohub_data_pipeline_spark.operators import rasterprobe as RP

    temp = (np.arange(300 * 270, dtype="<f8").reshape(300, 270)) % 50
    ys = np.linspace(60.0, 30.1, 300)                   # descending
    xs = np.linspace(0.0, 26.9, 270)
    H5.write_hdf5(str(tmp_path / "cube.nc4"),
                  {"temp": temp, "y": ys, "x": xs},
                  chunked={"temp"})
    # --no-warp: this test pins the SOURCE grid through the cascade
    rc = cli.main(["--raster", str(tmp_path / "cube.nc4"), "--no-warp",
                   "--dst", str(tmp_path / "out"),
                   "--overview-levels", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "wrote 1 COGs" in out
    import glob
    (cog,) = glob.glob(str(tmp_path / "out" / "cog" / "*.tif"))
    with open(cog, "rb") as f:
        probe = RP.probe_geotiff(f.read())
    assert probe["width"] == 270 and probe["height"] == 300
    assert probe["n_overviews"] == 1
    assert probe["epsg"] == 4326
    assert probe["pixel_scale_x"] == pytest.approx(26.9 / 269)
