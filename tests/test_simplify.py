"""Zoom-conditional simplification tests (tippecanoe
--simplify-only-low-zooms analog)."""

from __future__ import annotations

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators import simplify as S


def test_dp_collinear_collapses():
    line = [0.0, 0.0, 1.0, 0.0, 2.0, 0.0, 3.0, 0.0]
    assert S.douglas_peucker(line, 0.01) == [0.0, 0.0, 3.0, 0.0]


def test_dp_keeps_significant_vertex():
    line = [0.0, 0.0, 1.0, 5.0, 2.0, 0.0]
    assert S.douglas_peucker(line, 0.5) == line
    # huge tolerance flattens it
    assert S.douglas_peucker(line, 10.0) == [0.0, 0.0, 2.0, 0.0]


def test_dp_is_monotone_in_tolerance():
    import math
    line = []
    for i in range(200):
        line += [i * 0.1, math.sin(i * 0.3)]
    sizes = [len(S.douglas_peucker(line, t)) for t in (0.001, 0.01, 0.1, 1.0)]
    assert sizes == sorted(sizes, reverse=True)
    assert sizes[-1] < len(line)


def test_simplify_for_zoom_dataframe(spark):
    import math
    wiggly = [(i * 0.01, 0.001 * math.sin(i)) for i in range(500)]
    rows = [
        ("d", "l", 1, G.wkb_linestring(wiggly), 4326),
        ("d", "l", 2, G.wkb_point(1.0, 2.0), 4326),
    ]
    df = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, geometry binary, "
              "srid int")

    # low zoom: the wiggle is subpixel -> collapses to few points
    low = S.simplify_for_zoom(df, z=2)
    out = {r.fid: G.parse_wkb(bytes(r.geometry)) for r in low.collect()}
    assert len(out[1]["coords"]) < 20
    assert out[2]["coords"] == [1.0, 2.0]       # points untouched

    # high zoom: passthrough (simplify-only-low-zooms)
    hi = S.simplify_for_zoom(df, z=12)
    out_hi = {r.fid: G.parse_wkb(bytes(r.geometry)) for r in hi.collect()}
    assert len(out_hi[1]["coords"]) == 1000


def test_polygon_stays_closed(spark):
    ring = [(0.0, 0.0), (1.0, 0.001), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0),
            (0.0, 0.0)]
    df = spark.createDataFrame(
        [("d", "l", 1, G.wkb_polygon([ring]), 4326)],
        "dataset string, layer string, fid long, geometry binary, srid int")
    out = S.simplify_for_zoom(df, z=3).collect()
    parsed = G.parse_wkb(bytes(out[0].geometry))
    assert parsed["type"] == G.POLYGON
    ring_out = parsed["parts"][0]
    assert (ring_out[0], ring_out[1]) == (ring_out[-2], ring_out[-1])
    assert len(ring_out) >= 8
