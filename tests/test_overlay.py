"""Dissolve / buffer operator tests (operators/overlay.py).

The reference never overlays geometry (its pipeline is probe/convert/
tile — /root/reference/ingest/processing.py); these pin the analytics
extension: edge-cancellation dissolve over coverage topologies and
the planar polygonal buffer.
"""

from __future__ import annotations

import math

import numpy as np

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators import overlay as OV
from geohub_data_pipeline_spark.operators.spatial import pnpoly_mask


def _cell(i: int, j: int, key: int = 0):
    ring = [(float(i), float(j)), (float(i + 1), float(j)),
            (float(i + 1), float(j + 1)), (float(i), float(j + 1)),
            (float(i), float(j))]
    return (key, G.wkb_polygon([ring]))


def test_dissolve_hole_and_pinch(spark):
    """3x3 block minus its center dissolves to shell+hole; two cells
    touching only at a corner stitch as two rings through the pinch
    vertex (rightmost-turn rule)."""
    rows = [_cell(i, j, 0) for i in range(3) for j in range(3)
            if (i, j) != (1, 1)]
    rows += [_cell(5, 5, 1), _cell(6, 6, 1)]
    df = spark.createDataFrame(rows, "key long, geometry binary")
    out = {r.key: r for r in OV.dissolve(df).collect()}
    assert out[0].n_rings == 2 and out[0].n_open == 0
    assert out[1].n_rings == 2 and out[1].n_open == 0
    audit = {r.key: r for r in OV.geometry_audit(
        OV.dissolve(df)).collect()}
    assert audit[0].area == 8.0 and audit[0].perimeter == 16.0
    assert audit[1].area == 2.0 and audit[1].perimeter == 8.0


def test_dissolve_respects_winding_and_input_holes(spark):
    """A polygon WITH a hole dissolved against a neighbor keeps the
    hole; CW-wound input shells are normalized before cancellation."""
    donut = G.wkb_polygon([
        [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0)],
        [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)],
    ])
    # neighbor shares the right border, wound CW (backwards)
    cw = G.wkb_polygon([
        [(3.0, 0.0), (3.0, 3.0), (5.0, 3.0), (5.0, 0.0), (3.0, 0.0)]])
    df = spark.createDataFrame(
        [(0, donut), (0, cw)], "key long, geometry binary")
    a = OV.geometry_audit(OV.dissolve(df)).collect()[0]
    assert a.n_rings == 2                     # outer + preserved hole
    assert a.area == 15.0 - 1.0               # 3x3 + 2x3 - hole
    assert a.perimeter == 16.0 + 4.0          # outline + hole ring


def test_dissolve_flags_non_coverage(spark):
    """Duplicated same-key polygons (stacked borders) are NOT a
    coverage: their edges net to |mult|=2, the stitcher can absorb
    each only once, and the surplus surfaces as n_open instead of
    silently vanishing."""
    a = G.wkb_polygon([[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0),
                        (0.0, 2.0), (0.0, 0.0)]])
    df = spark.createDataFrame(
        [(0, a), (0, a)], "key long, geometry binary")
    out = OV.dissolve(df).collect()[0]
    assert out.n_open == 4                    # one square's surplus
    # a clean coverage stays at 0
    clean = spark.createDataFrame(
        [_cell(0, 0, 0), _cell(1, 0, 0)], "key long, geometry binary")
    assert OV.dissolve(clean).collect()[0].n_open == 0


def test_buffer_point_octagon_exact(spark):
    """Point buffer at segments=8 is the exact regular octagon:
    area 2*sqrt(2)*R^2, perimeter 16*R*sin(pi/8)."""
    pts = spark.createDataFrame(
        [(1, 2.0, -3.0)], "point_id long, lon double, lat double")
    b = OV.buffer_points(pts, 1.0, segments=8)
    a = OV.geometry_audit(
        b.withColumnRenamed("poly_id", "key")).collect()[0]
    assert abs(a.area - 2.0 * math.sqrt(2.0)) < 1e-5
    assert abs(a.perimeter - 16.0 * math.sin(math.pi / 8.0)) < 1e-5


def test_buffer_polygon_and_line_against_distance_field(spark):
    """Concave polygon and right-angle polyline buffers agree with
    the brute-force distance field everywhere off the polygonal-
    approximation tolerance band."""
    L = G.wkb_polygon([[(0.0, 0.0), (3.0, 0.0), (3.0, 1.0),
                        (1.0, 1.0), (1.0, 3.0), (0.0, 3.0),
                        (0.0, 0.0)]])
    line = G.wkb_linestring([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0)])
    feats = spark.createDataFrame(
        [("d", "l", 1, bytearray(L)), ("d", "l", 2, bytearray(line))],
        "dataset string, layer string, fid long, geometry binary")
    got = {r.fid: r for r in
           OV.buffer_features(feats, 0.5, segments=32).collect()}

    def field_check(fid, ring_pts, closed):
        p = G.parse_wkb(bytes(got[fid].geometry))
        rings = [np.asarray(part, float).reshape(-1, 2)
                 for part in p["parts"]]
        xs = np.linspace(-1.5, 4.5, 241)
        X, Y = np.meshgrid(xs, xs)
        px, py = X.ravel(), Y.ravel()
        inside = pnpoly_mask(px, py, rings)
        ring = np.asarray(ring_pts, float)
        base = pnpoly_mask(px, py, [ring]) if closed \
            else np.zeros(px.shape, bool)
        d = np.full(px.shape, np.inf)
        for i in range(len(ring) - 1):
            a, b = ring[i], ring[i + 1]
            ab = b - a
            t = np.clip(((px - a[0]) * ab[0] + (py - a[1]) * ab[1])
                        / (ab @ ab), 0, 1)
            d = np.minimum(d, np.hypot(px - (a[0] + t * ab[0]),
                                       py - (a[1] + t * ab[1])))
        true = base | (d <= 0.5)
        far = (np.abs(d - 0.5) > 0.03) | base
        assert (inside == true)[far].all()

    field_check(1, [(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3),
                    (0, 0)], True)
    field_check(2, [(0, 0), (2, 0), (2, 2)], False)


def test_dissolve_features_string_keys(spark):
    """dissolve_features groups feature rows by a string column and
    keys survive with their type (no long-only restriction)."""
    rows = []
    for i in range(2):
        for j in range(2):
            ring = [(float(i), float(j)), (float(i + 1), float(j)),
                    (float(i + 1), float(j + 1)),
                    (float(i), float(j + 1)), (float(i), float(j))]
            rows.append(("d", "east" if i else "west", i * 2 + j,
                         G.wkb_polygon([ring])))
    feats = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, "
              "geometry binary")
    out = {r.layer: r for r in OV.dissolve_features(feats).collect()}
    assert set(out) == {"east", "west"}
    assert out["east"].n_rings == 1 and out["east"].n_open == 0
    a = {r.key: r for r in OV.geometry_audit(
        spark.createDataFrame(
            [(k, bytes(v.geometry)) for k, v in out.items()],
            "key string, geometry binary")).collect()}
    assert a["east"].area == 2.0 and a["east"].perimeter == 6.0


def test_polygonize_blocks_cross_block_and_nodata(spark):
    """Raster polygonize: regions crossing block borders stitch via
    edge cancellation (no halo), nodata pixels polygonize nothing,
    corner-touching same-value cells keep separate rings."""
    import numpy as np

    h = w = 40
    bs = 15                                 # borders cut regions
    v = ((np.add.outer(np.arange(h) // 10, np.arange(w) // 10))
         % 2).astype(float)
    v[0:10, 0:10] = np.nan                  # a value-0 cell -> nodata
    rows = []
    for by in range(0, h, bs):
        for bx in range(0, w, bs):
            t = v[by:by + bs, bx:bx + bs]
            rows.append(("dem", None, 1, 0, bx // bs, by // bs,
                         t.shape[1], t.shape[0], t.ravel().tolist(),
                         None, 4326))
    blocks = spark.createDataFrame(rows, (
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int"))
    georef = spark.createDataFrame(
        [("dem", 0.0, 4.0, 0.1, 0.1, 4326)],
        "dataset string, origin_x double, origin_y double, "
        "pixel_sx double, pixel_sy double, srid int")
    out = {r.value: r for r in OV.polygonize_blocks(
        blocks, georef, block_size=bs).collect()}
    assert set(out) == {0.0, 1.0}
    assert all(r.n_open == 0 for r in out.values())
    aud = {a.key: a for a in OV.geometry_audit(
        OV.polygonize_blocks(blocks, georef, block_size=bs)
        .selectExpr("cast(value as long) as key", "geometry"))
        .collect()}
    # 4x4 cells of 1x1: value0 at even (r+c), 8 cells minus nodata=7;
    # value1 the other 8.  Corner-only contact -> one ring per cell.
    assert aud[0].area == 7.0 and aud[0].n_rings == 7
    assert aud[1].area == 8.0 and aud[1].n_rings == 8
    assert aud[0].perimeter == 28.0 and aud[1].perimeter == 32.0


def test_clip_features_polygon_line_point(spark):
    """Convex clip: polygon S-H (holes survive), line parametric clip
    (split parts re-group), point filter; empty results drop."""
    win = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
           (0.0, 0.0)]
    donut = G.wkb_polygon([
        [(1.0, 1.0), (6.0, 1.0), (6.0, 3.0), (1.0, 3.0), (1.0, 1.0)],
        [(2.0, 1.5), (2.0, 2.5), (3.0, 2.5), (3.0, 1.5), (2.0, 1.5)],
    ])
    zigzag = G.wkb_linestring([(-1.0, 2.0), (2.0, 2.0), (2.0, 6.0),
                               (3.0, 6.0), (3.0, 2.0), (7.0, 2.0)])
    pin = G.wkb_point(1.0, 1.0)
    pout = G.wkb_point(9.0, 9.0)
    feats = spark.createDataFrame(
        [("d", "l", 1, donut), ("d", "l", 2, zigzag),
         ("d", "l", 3, pin), ("d", "l", 4, pout)],
        "dataset string, layer string, fid long, geometry binary")
    out = {r.fid: r for r in OV.clip_features(feats, win).collect()}
    assert set(out) == {1, 2, 3}            # pout dropped
    a = OV.geometry_audit(spark.createDataFrame(
        [(1, bytes(out[1].geometry))], "key long, geometry binary")
    ).collect()[0]
    # clipped donut: 3x2 box minus the fully-inside 1x1 hole
    assert a.area == 6.0 - 1.0
    assert a.n_rings == 2
    line = G.parse_wkb(bytes(out[2].geometry))
    # zigzag: two disjoint in-window runs -> multilinestring
    assert line["type"] == G.MULTILINESTRING
    assert len(line["parts"]) == 2
