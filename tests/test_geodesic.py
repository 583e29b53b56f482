"""Geodesic (Vincenty) direct/inverse: published control line,
self-consistency, and failure-mode contracts."""

import math

import pytest

from geohub_data_pipeline_spark.operators import geodesic as G


def test_vincenty_published_control_line():
    """Vincenty's own published test line (Flinders Peak ->
    Buninyong, Geoscience Australia): s = 54972.271 m — the absolute
    mm-level pin for the inverse problem."""
    lat1 = -(37 + 57 / 60 + 3.72030 / 3600)
    lon1 = 144 + 25 / 60 + 29.52440 / 3600
    lat2 = -(37 + 39 / 60 + 10.15610 / 3600)
    lon2 = 143 + 55 / 60 + 35.38390 / 3600
    assert abs(G.geodesic_inverse(lon1, lat1, lon2, lat2)
               - 54972.271) < 0.001


def test_equatorial_degree_is_the_wgs84_arc():
    """Going due east on the equator, one degree of longitude is
    exactly a * pi / 180 (the equator is a circle of radius a)."""
    lon2, lat2 = G.geodesic_direct(0.0, 0.0, 90.0,
                                   6378137.0 * math.pi / 180.0)
    assert abs(lon2 - 1.0) < 1e-12 and abs(lat2) < 1e-12


def test_meridian_quarter_is_the_polar_arc():
    """Due north from the equator, the quarter meridian of WGS84 is
    10001965.729 m (the classic geodesy constant)."""
    lon2, lat2 = G.geodesic_direct(7.0, 0.0, 0.0, 10_001_965.7293)
    assert abs(lat2 - 90.0) < 1e-6


@pytest.mark.parametrize("lon,lat,az,s", [
    (10.0, 60.0, 37.0, 100_000.0),
    (-150.0, -45.0, 123.4, 2_000_000.0),
    (0.0, 0.0, 90.0, 5_000_000.0),
    (179.5, 30.0, 80.0, 300_000.0),      # dateline crossing
    (5.0, 89.0, 10.0, 50_000.0),         # near-polar
])
def test_direct_inverse_roundtrip(lon, lat, az, s):
    lon2, lat2 = G.geodesic_direct(lon, lat, az, s)
    assert abs(G.geodesic_inverse(lon, lat, lon2, lat2) - s) < 1e-3


def test_inverse_raises_near_antipodal():
    with pytest.raises(RuntimeError, match="antipodal"):
        G.geodesic_inverse(0.0, 0.5, 179.7, -0.5)


def test_coincident_points_are_zero():
    assert G.geodesic_inverse(12.3, 45.6, 12.3, 45.6) == 0.0


def test_buffer_points_fanout_and_radius(spark):
    from pyspark.sql import functions as F
    pts = spark.createDataFrame(
        [(1, 10.0, 60.0), (2, -70.0, -33.0)],
        "id long, lon double, lat double")
    rings = G.buffer_points(pts, 50_000.0, 8).collect()
    assert len(rings) == 16
    by_id = {(r.id, r.k): (r.vlon, r.vlat) for r in rings}
    for (pid, _k), (vlon, vlat) in by_id.items():
        lon, lat = (10.0, 60.0) if pid == 1 else (-70.0, -33.0)
        assert abs(G.geodesic_inverse(lon, lat, vlon, vlat)
                   - 50_000.0) < 1e-3
