"""Numpy CRS twins (operators/crs_np.py) vs the scalar reference
implementations — every covered table srid sweeps a grid of points
through both paths in both directions."""

import numpy as np
import pytest

from geohub_data_pipeline_spark.operators import crs as C
from geohub_data_pipeline_spark.operators import crs_np as CN

# srid -> a plausible lon/lat window (lon0, lon1, lat0, lat1)
_WINDOWS = {
    2154: (-4.5, 8.0, 42.0, 51.0),       # Lambert-93
    31370: (2.6, 6.3, 49.6, 51.4),       # Belgian L72 (pole-origin)
    3978: (-135.0, -55.0, 42.0, 80.0),   # Canada Atlas LCC
    26985: (-79.5, -75.0, 37.9, 39.7),   # Maryland
    27572: (-4.0, 7.5, 42.5, 51.0),      # NTF Lambert II (Helmert)
    3112: (112.0, 154.0, -44.0, -10.0),  # GA Lambert (southern)
    28992: (3.3, 7.2, 50.7, 53.6),       # RD New (sterea + Helmert)
    27700: (-8.0, 1.8, 49.9, 60.8),      # OSGB (TM + Helmert)
    31467: (7.5, 10.5, 47.3, 55.0),      # DHDN GK3 (TM + Helmert)
    23031: (0.0, 6.0, 38.0, 52.0),       # ED50 UTM31 (TM + Helmert)
    26714: (-102.0, -96.0, 26.0, 49.0),  # NAD27 UTM14
    2180: (14.1, 24.2, 49.0, 55.0),      # Poland CS92
    3035: (-10.0, 35.0, 34.0, 70.0),     # LAEA Europe (oblique)
    6931: (-180.0, 180.0, 25.0, 89.0),   # EASE2-N (polar LAEA)
    6932: (-180.0, 180.0, -89.0, -25.0), # EASE2-S
    2163: (-125.0, -65.0, 24.0, 50.0),   # Atlas sphere LAEA
    3573: (-180.0, 180.0, 45.0, 89.0),   # North Pole LAEA Canada
    3413: (-180.0, 180.0, 35.0, 89.0),   # NSIDC PS North
    3031: (-180.0, 180.0, -89.0, -50.0), # Antarctic PS
    32661: (-180.0, 180.0, 60.0, 89.0),  # UPS North (variant A)
    6933: (-179.0, 179.0, -80.0, 80.0),  # EASE2 global CEA
    3410: (-179.0, 179.0, -80.0, 80.0),  # EASE1 sphere CEA
    5070: (-125.0, -66.0, 24.0, 50.0),   # CONUS Albers
    3577: (112.0, 154.0, -44.0, -10.0),  # Australian Albers
    102003: (-125.0, -66.0, 24.0, 50.0), # ESRI USA Albers
    2193: (166.0, 179.0, -47.5, -34.0),  # NZTM (plain TM)
    5514: (12.1, 22.5, 47.8, 51.0),      # Krovak (Helmert)
    2056: (6.0, 10.5, 45.8, 47.8),       # Swiss LV95 (HOM-B)
    21781: (6.0, 10.5, 45.8, 47.8),      # Swiss LV03
    54009: (-170.0, 170.0, -80.0, 80.0), # World Mollweide
    54034: (-170.0, 170.0, -80.0, 80.0), # World CEA
}


def _grid(w, n=9):
    lon = np.linspace(w[0], w[1], n)
    lat = np.linspace(w[2], w[3], n)
    LO, LA = np.meshgrid(lon, lat)
    return LO.ravel(), LA.ravel()


@pytest.mark.parametrize("srid", sorted(_WINDOWS))
def test_np_matches_scalar_both_directions(srid):
    pair = CN.pair_np(srid)
    assert pair is not None, f"no numpy twin for {srid}"
    fwd_np, inv_np = pair
    fwd_s, inv_s = C.from_lonlat(srid), C.to_lonlat(srid)

    lon, lat = _grid(_WINDOWS[srid])
    X, Y = fwd_np(lon, lat)
    # forward: numpy vs scalar
    for i in range(0, len(lon), 7):
        xs, ys = fwd_s(float(lon[i]), float(lat[i]))
        assert abs(X[i] - xs) < 1e-5 and abs(Y[i] - ys) < 1e-5, \
            (srid, lon[i], lat[i], X[i], xs)
    # inverse: numpy round-trip against the INPUT (stronger than
    # matching the scalar inverse)
    LO, LA = inv_np(X, Y)
    dlon = np.abs(LO - lon)
    dlon = np.minimum(dlon, 360.0 - dlon)   # +-180 are one meridian
    # 5e-7 deg (~5 cm): the Helmert codes' ECEF iteration tolerance,
    # identical to the scalar path's round-trip error class
    assert np.max(dlon) < 5e-7
    assert np.max(np.abs(LA - lat)) < 5e-7
    # inverse: numpy vs scalar on a sample
    for i in range(0, len(lon), 11):
        lo_s, la_s = inv_s(float(X[i]), float(Y[i]))
        d = abs(LO[i] - lo_s)
        assert min(d, 360.0 - d) < 1e-9 and abs(LA[i] - la_s) < 1e-9


def test_dispatch_returns_np_kernels():
    """to_lonlat_np / from_lonlat_np now cover every numpy family,
    including Helmert grids — the normalize and warp fast paths."""
    for srid in (2154, 28992, 27700, 3035, 6931, 3413, 5070, 6933,
                 31467, 23031):
        assert C.to_lonlat_np(srid) is not None, srid
        assert C.from_lonlat_np(srid) is not None, srid
    # every table family now has a twin
    for srid in (5514, 2056, 54009):
        assert C.to_lonlat_np(srid) is not None, srid


def test_np_scalar_parity_scalar_inputs():
    """The np kernels accept python floats too (warp calls them with
    scalars at tile corners)."""
    fwd, inv = CN.pair_np(2154)
    x, y = fwd(2.35, 48.85)
    lo, la = inv(float(x), float(y))
    assert abs(lo - 2.35) < 1e-9 and abs(la - 48.85) < 1e-9


_MODIS_SINU = """PROJCS["MODIS Sinusoidal",
 GEOGCS["WGS 84",DATUM["WGS_1984",
  SPHEROID["WGS 84",6378137,298.257223563]],
  PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
 PROJECTION["Sinusoidal"],
 PARAMETER["central_meridian",0],PARAMETER["false_easting",0],
 PARAMETER["false_northing",0],UNIT["metre",1]]"""


def test_wkt_np_kernels_match_scalar():
    """pair_from_wkt(use_np=True) builds array kernels from the same
    parsed parameters — parity vs the scalar closures across the
    fixture bank (ftUS units, TOWGS84 Helmert, Ferro meridian,
    aux-sphere Mercator, MODIS sinusoidal)."""
    from tests.test_crs_wkt import (
        _WKT_2263_FTUS,
        _WKT_27700,
        _WKT_5514_FERRO,
        _WKT_AUX_SPHERE,
        _WKT_ESRI_UTM33,
    )
    from geohub_data_pipeline_spark.operators import crs_wkt as CW

    cases = {
        _WKT_27700: (-5.0, 1.5, 50.2, 58.0),
        _WKT_ESRI_UTM33: (12.5, 17.5, 1.0, 70.0),
        _WKT_2263_FTUS: (-74.2, -71.9, 40.5, 41.2),
        _WKT_5514_FERRO: (12.5, 22.0, 48.0, 51.0),
        _WKT_AUX_SPHERE: (-170.0, 170.0, -80.0, 80.0),
        _MODIS_SINU: (-170.0, 170.0, -80.0, 80.0),
    }
    for wkt, w in cases.items():
        scal = CW.pair_from_wkt(wkt)
        vec = CW.pair_from_wkt(wkt, use_np=True)
        assert scal is not None and vec is not None, wkt[:40]
        lon, lat = _grid(w, n=7)
        X, Y = vec[0](lon, lat)
        for i in range(0, len(lon), 5):
            xs, ys = scal[0](float(lon[i]), float(lat[i]))
            assert abs(X[i] - xs) < 1e-5 and abs(Y[i] - ys) < 1e-5, \
                (wkt[:40], lon[i], lat[i])
        LO, LA = vec[1](X, Y)
        for i in range(0, len(lon), 5):
            lo_s, la_s = scal[1](float(X[i]), float(Y[i]))
            assert abs(LO[i] - lo_s) < 1e-9
            assert abs(LA[i] - la_s) < 1e-9


def test_reproject_array_uses_np_wkt_path():
    """normalize's array reprojector takes the vectorized WKT route
    for srid-0 + embedded-WKT features (e.g. MODIS sinusoidal or an
    AUTHORITY-less .prj)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    fwd = __import__(
        "geohub_data_pipeline_spark.operators.crs_wkt",
        fromlist=["x"]).from_lonlat_wkt(_MODIS_SINU)
    lon = np.linspace(-150, 150, 400)
    lat = np.linspace(-70, 70, 400)
    arr = np.column_stack([[fwd(lo, la)[0] for lo, la in zip(lon, lat)],
                           [fwd(lo, la)[1] for lo, la in zip(lon, lat)]])
    out = G._reproject_array(arr, 0, _MODIS_SINU)
    assert np.max(np.abs(out[:, 0] - lon)) < 1e-7
    assert np.max(np.abs(out[:, 1] - lat)) < 1e-7
