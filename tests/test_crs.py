"""CRS transform tests: published control points + round trips.

Control sources (public):
* IOGP Guidance Note 7-2, LAEA example: ETRS89 lat 50N lon 5E ->
  EPSG:3035 E 3962799.45, N 2999718.85 (also in PROJ's test suite).
* WGS84 meridian arc to 45N = 4984944.378 m (standard geodesy
  tables); UTM northing at the central meridian = 0.9996 * arc.
* Projection origins map to the false origin exactly by definition.
"""

from __future__ import annotations

import math

import pytest

from geohub_data_pipeline_spark.operators import crs as C


# ---------------------------------------------------------------------------
# UTM
# ---------------------------------------------------------------------------

def test_utm_zone_origin_exact():
    # central meridian x equator = (FE, 0) by definition
    e, n = C.lonlat_to_utm(15.0, 0.0, 33)
    assert math.isclose(e, 500000.0, abs_tol=1e-6)
    assert math.isclose(n, 0.0, abs_tol=1e-6)


def test_utm_central_meridian_scale_and_arc():
    # northing on the CM = k0 * meridian arc; arc(45N, WGS84) is the
    # published 4984944.378 m
    e, n = C.lonlat_to_utm(15.0, 45.0, 33)
    assert math.isclose(e, 500000.0, abs_tol=1e-6)
    assert math.isclose(n, 0.9996 * 4984944.378, abs_tol=0.01)


def test_utm_roundtrip_grid():
    for zone in (1, 18, 33, 60):
        lon0 = zone * 6.0 - 183.0
        for dlon in (-2.9, 0.0, 2.9):
            for lat in (-79.0, -30.0, 0.0, 30.0, 71.9):
                north = lat >= 0
                e, n = C.lonlat_to_utm(lon0 + dlon, lat, zone, north=north)
                lon2, lat2 = C.utm_to_lonlat(e, n, zone, north=north)
                assert math.isclose(lon0 + dlon, lon2, abs_tol=1e-9)
                assert math.isclose(lat, lat2, abs_tol=1e-9)


def test_utm_south_false_northing():
    e, n = C.lonlat_to_utm(15.0, -0.001, 33, north=False)
    assert n < 10000000.0 and n > 9999000.0     # just under FN_south


def test_utm_hemisphere_symmetry():
    eN, nN = C.lonlat_to_utm(16.0, 40.0, 33, north=True)
    eS, nS = C.lonlat_to_utm(16.0, -40.0, 33, north=False)
    assert math.isclose(eN, eS, abs_tol=1e-6)
    assert math.isclose(nN, 10000000.0 - nS, abs_tol=1e-6)


# ---------------------------------------------------------------------------
# EPSG:3035 — LAEA Europe
# ---------------------------------------------------------------------------

def test_laea_iogp_control_point():
    e, n = C.lonlat_to_laea(5.0, 50.0)
    assert math.isclose(e, 3962799.45, abs_tol=0.02)
    assert math.isclose(n, 2999718.85, abs_tol=0.02)
    lon, lat = C.laea_to_lonlat(3962799.45, 2999718.85)
    assert math.isclose(lon, 5.0, abs_tol=1e-7)
    assert math.isclose(lat, 50.0, abs_tol=1e-7)


def test_laea_origin_and_roundtrip():
    e, n = C.lonlat_to_laea(10.0, 52.0)
    assert math.isclose(e, 4321000.0, abs_tol=1e-6)
    assert math.isclose(n, 3210000.0, abs_tol=1e-6)
    for lon, lat in [(-10.0, 35.0), (30.0, 70.0), (10.0, 52.0),
                     (25.0, 40.0)]:
        e, n = C.lonlat_to_laea(lon, lat)
        lon2, lat2 = C.laea_to_lonlat(e, n)
        assert math.isclose(lon, lon2, abs_tol=1e-8)
        assert math.isclose(lat, lat2, abs_tol=1e-8)


# ---------------------------------------------------------------------------
# EPSG:2154 — Lambert-93
# ---------------------------------------------------------------------------

def test_lcc_origin_exact():
    e, n = C.lonlat_to_lcc(3.0, 46.5)
    assert math.isclose(e, 700000.0, abs_tol=1e-6)
    assert math.isclose(n, 6600000.0, abs_tol=1e-6)


def test_lcc_standard_parallels_true_scale():
    """On a standard parallel the cone is tangent: a 0.1-deg lon step
    must measure (cos(lat) * 0.1 deg of arc) within ~1e-6 relative."""
    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2 - f)
    for sp in (44.0, 49.0):
        phi = math.radians(sp)
        nu = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        expect = nu * math.cos(phi) * math.radians(0.1)
        e1, n1 = C.lonlat_to_lcc(3.0, sp)
        e2_, n2 = C.lonlat_to_lcc(3.1, sp)
        got = math.hypot(e2_ - e1, n2 - n1)
        assert got == pytest.approx(expect, rel=2e-6)


def test_lcc_roundtrip():
    for lon, lat in [(-4.5, 48.4), (7.7, 43.7), (3.0, 46.5),
                     (2.35, 48.86), (9.4, 41.9)]:
        e, n = C.lonlat_to_lcc(lon, lat)
        lon2, lat2 = C.lcc_to_lonlat(e, n)
        assert math.isclose(lon, lon2, abs_tol=1e-9)
        assert math.isclose(lat, lat2, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def test_epsg_dispatch_coverage():
    assert C.to_lonlat(32633) is not None       # UTM 33N WGS84
    assert C.to_lonlat(32733) is not None       # UTM 33S
    assert C.to_lonlat(25832) is not None       # ETRS89 / UTM 32N
    assert C.to_lonlat(3035) is not None
    assert C.to_lonlat(2154) is not None
    assert C.to_lonlat(27700) is None           # OSGB: not covered
    assert C.to_lonlat(4326) is None            # geographic: caller's no-op
    # inverse(forward) identity through the dispatcher too
    fwd, inv = C.from_lonlat(25832), C.to_lonlat(25832)
    lon, lat = inv(*fwd(9.0, 51.0))
    assert math.isclose(lon, 9.0, abs_tol=1e-9)
    assert math.isclose(lat, 51.0, abs_tol=1e-9)
