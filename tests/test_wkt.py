"""WKT codec (functions/wkt.py) + CSV WKT-column route, including
hypothesis round-trip properties for the geometry text/binary pair."""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geohub_data_pipeline_spark.functions import wkt as W
from geohub_data_pipeline_spark.operators import geometry as G

_CASES = [
    ("POINT (3.5 -7.25)", G.POINT),
    ("LINESTRING (0 0, 1 1, 2 0.5)", G.LINESTRING),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
     G.POLYGON),
    ("MULTIPOINT (1 2, 3 4)", G.MULTIPOINT),
    ("MULTIPOINT ((1 2), (3 4))", G.MULTIPOINT),
    ("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
     G.MULTILINESTRING),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
     "((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, 5.4 5.4, 5.2 5.2)))",
     G.MULTIPOLYGON),
]


@pytest.mark.parametrize("text,gtype", _CASES)
def test_wkt_parse_and_canonical_roundtrip(text, gtype):
    wkb = W.wkt_to_wkb(text)
    assert wkb is not None
    assert G.parse_wkb(wkb)["type"] == gtype
    # canonical text -> same WKB again (idempotent round-trip)
    canon = W.wkb_to_wkt(wkb)
    assert W.wkt_to_wkb(canon) == wkb


def test_wkt_rejects_and_z_handling():
    assert W.wkt_to_wkb("POINT EMPTY") is None
    assert W.wkt_to_wkb("GEOMETRYCOLLECTION (POINT (1 2))") is None
    assert W.wkt_to_wkb("garbage") is None
    assert W.wkt_to_wkb("") is None
    assert W.wkt_to_wkb(None) is None
    # Z/M ordinates parse and drop
    assert W.wkt_to_wkb("POINT Z (1 2 3)") == G.wkb_point(1.0, 2.0)
    assert W.wkt_to_wkb("point zm (1 2 3 4)") == G.wkb_point(1.0, 2.0)


_coord = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)
_pt = st.tuples(_coord, _coord)


@settings(max_examples=60, deadline=None)
@given(st.lists(_pt, min_size=2, max_size=12))
def test_linestring_text_binary_roundtrip(pts):
    wkb = G.wkb_linestring(pts)
    text = W.wkb_to_wkt(wkb)
    assert W.wkt_to_wkb(text) == wkb


@settings(max_examples=60, deadline=None)
@given(_pt)
def test_point_text_binary_roundtrip(pt):
    wkb = G.wkb_point(*pt)
    assert W.wkt_to_wkb(W.wkb_to_wkt(wkb)) == wkb


@settings(max_examples=40, deadline=None)
@given(st.lists(_pt, min_size=3, max_size=8))
def test_polygon_text_binary_roundtrip(ring):
    ring = ring + [ring[0]]                # close it
    wkb = G.wkb_polygon([ring])
    assert W.wkt_to_wkb(W.wkb_to_wkt(wkb)) == wkb


def test_csv_wkt_column_route(spark, tmp_path):
    """PostGIS-export shape: CSV with a WKT geometry column carries
    any geometry type through the Spark-native route."""
    from geohub_data_pipeline_spark.sources import csvpoints as CSVP

    p = tmp_path / "shapes.csv"
    p.write_text(
        'name,WKT\n'
        'a,"POINT (1 2)"\n'
        'b,"LINESTRING (0 0, 1 1)"\n'
        'c,"POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"\n'
        'bad,"not wkt"\n')
    rows = CSVP.features_from_csv(spark, str(p)).collect()
    assert len(rows) == 3
    kinds = sorted(G.parse_wkb(bytes(r.geometry))["type"] for r in rows)
    assert kinds == [G.POINT, G.LINESTRING, G.POLYGON]
    names = {json.loads(r.properties)["name"] for r in rows}
    assert names == {"a", "b", "c"}
    # bytes form (archive members)
    rows2 = list(CSVP.read_csv_bytes(p.read_bytes(), "shapes.csv"))
    assert len(rows2) == 3
