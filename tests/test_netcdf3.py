"""Classic NetCDF-3 source tests: spec-built bytes through the
parser, subdataset/band mapping, and dispatch."""

from __future__ import annotations

import struct

import numpy as np

from geohub_data_pipeline_spark.operators import raster as R
from geohub_data_pipeline_spark.sources import netcdf3 as NC


# ---------------------------------------------------------------------------
# Minimal spec-following CDF-1 WRITER (tests only; UCAR classic format)
# ---------------------------------------------------------------------------

def _nm(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">I", len(b)) + b + b"\x00" * ((4 - len(b) % 4) % 4)


def _attr_f4(name: str, value: float) -> bytes:
    return _nm(name) + struct.pack(">II", 5, 1) + struct.pack(">f", value)


def write_cdf1(tmp=None) -> bytes:
    """time=2, y=3, x=4; vars: lat(y) skipped-1D, temp(time,y,x) f4
    with _FillValue, elev(y,x) f8."""
    dims = [("time", 2), ("y", 3), ("x", 4)]
    lat = np.arange(3, dtype=">f4")
    temp = np.arange(24, dtype=">f4").reshape(2, 3, 4)
    elev = (np.arange(12) * 1.5).astype(">f8").reshape(3, 4)

    def var(name, dimids, atts, nc_type, vsize, begin):
        return (_nm(name) + struct.pack(">I", len(dimids))
                + b"".join(struct.pack(">I", d) for d in dimids)
                + atts + struct.pack(">III", nc_type, vsize, begin))

    header = struct.pack(">3sBI", b"CDF", 1, 0)
    header += struct.pack(">II", 0x0A, len(dims))
    for n, sz in dims:
        header += _nm(n) + struct.pack(">I", sz)
    header += struct.pack(">II", 0, 0)                 # no global attrs
    # var list with placeholder begins to size the header
    no_atts = struct.pack(">II", 0, 0)
    fill = _attr_f4("_FillValue", -99.0)
    temp_atts = struct.pack(">II", 0x0C, 1) + fill

    def varlist(b0, b1, b2):
        return (struct.pack(">II", 0x0B, 3)
                + var("lat", [1], no_atts, 5, lat.nbytes, b0)
                + var("temp", [0, 1, 2], temp_atts, 5, temp.nbytes, b1)
                + var("elev", [1, 2], no_atts, 6, elev.nbytes, b2))

    hlen = len(header) + len(varlist(0, 0, 0))
    b0 = hlen
    b1 = b0 + lat.nbytes
    b2 = b1 + temp.nbytes
    return (header + varlist(b0, b1, b2)
            + lat.tobytes() + temp.tobytes() + elev.tobytes())


def test_parse_netcdf3():
    blob = write_cdf1()
    hdr = NC.parse_netcdf3(blob)
    names = [v["name"] for v in hdr]
    assert names == ["lat", "temp", "elev"]
    temp = hdr[1]
    assert [d[0] for d in temp["dims"]] == ["time", "y", "x"]
    assert temp["attrs"]["_FillValue"] == [-99.0]
    import pytest
    with pytest.raises(ValueError):
        NC.parse_netcdf3(b"\x89HDF\r\n\x1a\n")         # NetCDF-4/HDF5


def test_netcdf3_blocks_and_dispatch(spark, tmp_path):
    with open(tmp_path / "climate.nc", "wb") as f:
        f.write(write_cdf1())
    with open(tmp_path / "modern.nc", "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\nnot-classic")       # quarantined

    blocks = NC.blocks_from_netcdf3(spark, str(tmp_path))
    rows = blocks.collect()
    assert {r.dataset for r in rows} == {"climate.nc"}
    by_key = {(r.subdataset, r.band): r for r in rows}
    # temp -> subdataset with one band per time slice; elev -> band 1
    assert set(by_key) == {("temp", 1), ("temp", 2), ("elev", 1)}
    assert by_key[("temp", 2)].pixels[0] == 12.0       # slice t=1
    assert by_key[("elev", 1)].pixels[2] == 3.0        # 2*1.5
    assert by_key[("temp", 1)].nodata == -99.0
    assert by_key[("temp", 1)].width == 4 \
        and by_key[("temp", 1)].height == 3

    # reference dispatch rule: subdatasets go per-band below 3 bands
    from pyspark.sql import functions as F
    bands = blocks.select("dataset", "subdataset", "band").distinct() \
        .withColumn("colorinterp", F.lit(1)) \
        .withColumn("photometric", F.lit(None).cast("string"))
    modes = {(r.subdataset, r.band): r.cog_mode
             for r in R.rgb_dispatch(bands).collect()}
    assert modes[("temp", 1)] == "per_band"
    assert modes[("elev", 1)] == "per_band"


# ---------------------------------------------------------------------------
# Coordinate-variable georeferencing (ADVICE r3: thread geotransform)
# ---------------------------------------------------------------------------

def write_cdf1_with_coords(ys, xs) -> bytes:
    """y/x coordinate variables (CF cell centers) + elev(y, x) f8."""
    ny, nx = len(ys), len(xs)
    ya = np.asarray(ys, dtype=">f8")
    xa = np.asarray(xs, dtype=">f8")
    elev = np.arange(ny * nx, dtype=">f8").reshape(ny, nx)

    def var(name, dimids, nc_type, vsize, begin):
        return (_nm(name) + struct.pack(">I", len(dimids))
                + b"".join(struct.pack(">I", d) for d in dimids)
                + struct.pack(">II", 0, 0)
                + struct.pack(">III", nc_type, vsize, begin))

    header = struct.pack(">3sBI", b"CDF", 1, 0)
    header += struct.pack(">II", 0x0A, 2)
    header += _nm("y") + struct.pack(">I", ny)
    header += _nm("x") + struct.pack(">I", nx)
    header += struct.pack(">II", 0, 0)                 # no global attrs

    def varlist(b0, b1, b2):
        return (struct.pack(">II", 0x0B, 3)
                + var("y", [0], 6, ya.nbytes, b0)
                + var("x", [1], 6, xa.nbytes, b1)
                + var("elev", [0, 1], 6, elev.nbytes, b2))

    hlen = len(header) + len(varlist(0, 0, 0))
    b0 = hlen
    b1 = b0 + ya.nbytes
    b2 = b1 + xa.nbytes
    return (header + varlist(b0, b1, b2)
            + ya.tobytes() + xa.tobytes() + elev.tobytes())


def test_georef_of_netcdf3_north_up():
    """Descending y (north first): origin = first centers +- half."""
    blob = write_cdf1_with_coords([50.0, 49.0, 48.0],
                                  [10.0, 10.5, 11.0, 11.5])
    g = NC.georef_of_netcdf3(blob)
    assert g == (10.0 - 0.25, 50.0 + 0.5, 0.5, 1.0)
    # the fixture without coordinate vars has none
    from tests.test_netcdf3 import write_cdf1
    assert NC.georef_of_netcdf3(write_cdf1()) is None


def test_netcdf3_bottom_up_flip(spark, tmp_path):
    """Ascending y: data stored north-up (GDAL's bottom-up flip) and
    the georef's origin is the north edge, so both agree."""
    blob = write_cdf1_with_coords([48.0, 49.0, 50.0],
                                  [10.0, 10.5, 11.0, 11.5])
    with open(tmp_path / "b.nc", "wb") as f:
        f.write(blob)
    g = NC.georef_of_netcdf3(blob)
    assert g == (9.75, 50.5, 0.5, 1.0)
    rows = NC.blocks_from_netcdf3(spark, str(tmp_path)).collect()
    elev = [r for r in rows if r.subdataset == "elev"][0]
    # stored row 0 must now be the NORTH row (originally the last)
    assert elev.pixels[:4] == [8.0, 9.0, 10.0, 11.0]

    georef = NC.georef_from_netcdf3(spark, str(tmp_path)).collect()
    assert len(georef) == 1
    assert (georef[0].origin_x, georef[0].origin_y) == (9.75, 50.5)
    assert (georef[0].pixel_sx, georef[0].pixel_sy) == (0.5, 1.0)
