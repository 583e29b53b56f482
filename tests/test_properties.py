"""Property-based checks (SURVEY §5: 'property-based where cheap').

Driver-side properties of the pure kernels — no Spark session needed,
so hypothesis can run hundreds of cases in seconds.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from geohub_data_pipeline_spark.operators import geometry as G

lon = st.floats(min_value=-179.999, max_value=179.999,
                allow_nan=False, allow_infinity=False)
lat = st.floats(min_value=-84.999, max_value=84.999,
                allow_nan=False, allow_infinity=False)
coord = st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False)


@given(x=coord, y=coord)
@settings(max_examples=200, deadline=None)
def test_wkb_point_roundtrip(x, y):
    parsed = G.parse_wkb(G.wkb_point(x, y))
    assert parsed["type"] == G.POINT
    assert parsed["coords"] == [x, y]


@given(pts=st.lists(st.tuples(coord, coord), min_size=2, max_size=50))
@settings(max_examples=100, deadline=None)
def test_wkb_linestring_roundtrip_and_promote(pts):
    wkb = G.wkb_linestring(pts)
    parsed = G.parse_wkb(wkb)
    assert parsed["type"] == G.LINESTRING
    assert len(parsed["coords"]) == 2 * len(pts)
    promoted = G.parse_wkb(G.promote_to_multi(wkb))
    assert promoted["type"] == G.MULTILINESTRING
    assert promoted["coords"] == parsed["coords"]


@given(lo=lon, la=lat)
@settings(max_examples=300, deadline=None)
def test_mercator_roundtrip_property(lo, la):
    x, y = G.lonlat_to_mercator(lo, la)
    lo2, la2 = G.mercator_to_lonlat(x, y)
    assert math.isclose(lo, lo2, abs_tol=1e-8)
    assert math.isclose(la, la2, abs_tol=1e-8)


@given(lo=lon, la=lat, z=st.integers(min_value=0, max_value=18))
@settings(max_examples=300, deadline=None)
def test_tile_contains_its_point(lo, la, z):
    """The slippy tile assigned to a point must contain that point."""
    n = 2 ** z
    x = min(max(int(math.floor(n * (lo + 180.0) / 360.0)), 0), n - 1)
    rad = math.radians(la)
    y = min(max(int(math.floor(
        n * (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
             / math.pi) / 2.0)), 0), n - 1)
    # tile x bounds
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0
    assert lon0 - 1e-9 <= lo <= lon1 + 1e-9

    def lat_of(yy):
        t = math.pi * (1 - 2 * yy / n)
        return math.degrees(math.atan(math.sinh(t)))

    assert lat_of(y + 1) - 1e-9 <= la <= lat_of(y) + 1e-9


@given(payload=st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_parse_wkb_never_crashes_on_garbage(payload):
    """-skipfailures contract: arbitrary bytes parse to None or a
    structurally valid result, never an exception."""
    out = G.parse_wkb(payload)
    assert out is None or (
        out["type"] in (1, 2, 3, 4, 5, 6)
        and len(out["coords"]) % 2 == 0
    )
