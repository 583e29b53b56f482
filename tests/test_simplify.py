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


# ---------------------------------------------------------------------------
# joint shared-border simplification
# ---------------------------------------------------------------------------

def _wiggle(p, q, n=9, amp=0.004):
    """A noisy polyline from p to q (shared-border fixture): vertices
    identical for both owners, as well-noded inputs guarantee."""
    out = []
    for i in range(n + 1):
        t = i / n
        x = p[0] + (q[0] - p[0]) * t
        y = p[1] + (q[1] - p[1]) * t
        if 0 < i < n:
            x += amp * ((-1) ** i)
            y += amp * ((-1) ** (i + 1))
        out.append((x, y))
    return out


def _grid_rings():
    """2x1 grid of unit squares with wiggly edges: A and B share the
    vertical border x=1; every edge has intermediate vertices."""
    c = {}
    c["ab"] = _wiggle((1.0, 0.0), (1.0, 1.0))          # shared
    a_ring = (_wiggle((0.0, 0.0), (1.0, 0.0)) + c["ab"][1:]
              + _wiggle((1.0, 1.0), (0.0, 1.0))[1:]
              + _wiggle((0.0, 1.0), (0.0, 0.0))[1:])
    b_ring = (_wiggle((1.0, 0.0), (2.0, 0.0)) + _wiggle((2.0, 0.0), (2.0, 1.0))[1:]
              + _wiggle((2.0, 1.0), (1.0, 1.0))[1:]
              + list(reversed(c["ab"]))[1:])           # same verts, reversed
    return a_ring, b_ring, c["ab"]


def _border_chain(ring, x=1.0):
    """Extract the maximal run of vertices on the shared border line."""
    on = [(px, py) for px, py in ring[:-1] if abs(px - 1.0) < 0.05]
    return sorted(set(on))


def test_joint_ring_simplify_is_crack_free():
    a_ring, b_ring, _ = _grid_rings()
    # segment keys computed as the operator would: shared segments of
    # A and B get the same nonzero key
    shared = {tuple(sorted((p, q)))
              for p, q in zip(b_ring, b_ring[1:])} & {
              tuple(sorted((p, q))) for p, q in zip(a_ring, a_ring[1:])}

    def keys(ring):
        return [7 if tuple(sorted((p, q))) in shared else 0
                for p, q in zip(ring, ring[1:])]

    for z in (1, 3, 5, 7):
        tol = S.zoom_tolerance(z)
        sa = S.joint_simplify_ring(a_ring, keys(a_ring), tol)
        sb = S.joint_simplify_ring(b_ring, keys(b_ring), tol)
        assert sa and sb
        # both rings stay closed
        assert sa[0] == sa[-1] and sb[0] == sb[-1]
        # THE invariant: the shared border simplified identically
        assert _border_chain(sa) == _border_chain(sb), z
        # junction vertices (1,0) and (1,1) pinned at every zoom
        assert (1.0, 0.0) in sa and (1.0, 1.0) in sa
        assert (1.0, 0.0) in sb and (1.0, 1.0) in sb
    # and the coarse zoom actually simplified something
    assert len(S.joint_simplify_ring(a_ring, keys(a_ring),
                                     S.zoom_tolerance(1))) < len(a_ring)


def test_joint_simplify_rings_dataframe(spark):
    """End-to-end through the Spark operator: the census discovers the
    shared border itself, and adjacent polygons come back crack-free
    at every zoom."""
    a_ring, b_ring, _ = _grid_rings()
    rows = [(1, [{"x": x, "y": y} for x, y in a_ring]),
            (2, [{"x": x, "y": y} for x, y in b_ring])]
    rings = spark.createDataFrame(
        rows, "rid long, ring array<struct<x: double, y: double>>")
    for z in (2, 6):
        out = {r.rid: [(p["x"], p["y"]) for p in r.ring]
               for r in S.simplify_rings_joint(
                   rings, S.zoom_tolerance(z)).collect()}
        assert set(out) == {1, 2}
        assert _border_chain(out[1]) == _border_chain(out[2]), z
        assert out[1][0] == out[1][-1] and out[2][0] == out[2][-1]


def test_joint_simplify_uniform_ring_consistent():
    """A ring fully shared between two owners (stacked duplicates)
    simplifies to the same cycle for both — same vertex set regardless
    of orientation — while each output PRESERVES its input winding
    (canonicalization is internal; callers keep OGC winding)."""
    ring = _wiggle((0.0, 0.0), (1.0, 0.0)) + _wiggle((1.0, 0.0), (0.5, 1.0))[1:] \
        + _wiggle((0.5, 1.0), (0.0, 0.0))[1:]
    rev = list(reversed(ring))
    keys = [5] * (len(ring) - 1)
    tol = S.zoom_tolerance(3)
    sa = S.joint_simplify_ring(ring, keys, tol)
    sb = S.joint_simplify_ring(rev, keys, tol)
    assert sa == sb[::-1]              # same cycle, opposite traversal
    # winding of each output matches its own input
    assert (S._signed_area2(sa) > 0) == (S._signed_area2(ring) > 0)
    assert (S._signed_area2(sb) > 0) == (S._signed_area2(rev) > 0)
