"""Polygon overlay analytics: dissolve (merge-by-key) and buffer.

The reference pipeline never overlays geometry (its processing is
probe/convert/tile — /root/reference/ingest/processing.py has no
geometry math); these are the analytics operators a user reaches for
right after ``points_in_polygons`` / ``zonal_stats``: admin-area
dissolve, buffer-then-join.

Dissolve — the distributed EDGE-CANCELLATION form:

1. every polygon explodes to its directed boundary edges (map-side
   Arrow kernel; ring winding normalized shell-CCW / hole-CW first);
2. an interior boundary shared by two polygons of the same key
   appears ONCE IN EACH DIRECTION, so summing a +/-1 direction sign
   per (key, undirected edge) cancels it — a partial-aggregated
   ``groupBy``, the same map-side-combine shape as the substring-
   dedup gram marking, never a pairwise geometry union;
3. the surviving net edges are exactly the dissolved region's
   boundary, stitched back into closed rings per key
   (``applyInPandas``; rightmost-turn rule at pinch vertices), holes
   homed to their containing shell by ray cast.

This is the topology form of dissolve: EXACT for polygonal coverages
(shared borders vertex-identical, interiors disjoint — the admin/
cadastral/grid inputs dissolve exists for; the same contract under
which ``tiling.shared_border_stats`` detects shared borders).
OVERLAPPING same-key polygons do not cancel edge-wise; their
boundaries survive inside the result and render even-odd (the
documented coverage contract — duplicated/collinear-stacked borders
ARE flagged via ``n_open`` > 0, but interior overlap detection needs
a geometric join, e.g. ``spatial.points_in_polygons`` sampling, and
is out of dissolve's scope).  Scale: one shuffle of all
edges (map-side combine collapses duplicates), then one shuffle of
only the surviving BOUNDARY edges — the per-key stitch group is the
dissolved outline, not the input volume.

Buffer — planar polygonal approximation (k-segment round joins):
points become regular k-gons (exact); lines/polygons offset each
edge and insert circular-arc fans at convex joins, then repair any
concave-join self-intersection through ``make_valid_polygons`` —
the polygonal approximation every tiling engine ships.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dissolve", "dissolve_edges", "dissolve_features",
           "buffer_points", "buffer_features", "geometry_audit",
           "polygonize_blocks", "clip_features",
           "intersect_polygons", "overlay_intersection",
           "clip_lines_to_polygons", "overlay_erase"]


# ---------------------------------------------------------------------------
# dissolve
# ---------------------------------------------------------------------------

def _oriented_rings(wkb: bytes) -> list[np.ndarray]:
    """Polygon/MultiPolygon WKB -> closed ring arrays, wound
    shell-CCW / hole-CW regardless of source winding (the sign
    convention edge-cancellation needs)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    p = G.parse_wkb(wkb)
    if p is None or p["type"] not in (G.POLYGON, G.MULTIPOLYGON):
        return []
    parts = p.get("parts") or []
    roles = p.get("roles") or [True] * len(parts)
    out = []
    for part, is_shell in zip(parts, roles):
        c = np.asarray(part, np.float64).reshape(-1, 2)
        if len(c) < 4:
            continue
        area2 = float(np.sum(c[:-1, 0] * c[1:, 1] - c[1:, 0] * c[:-1, 1]))
        if (area2 > 0) != is_shell:
            c = c[::-1]
        out.append(c)
    return out


def dissolve_edges(polys: DataFrame, key_col: str = "key",
                   geom_col: str = "geometry") -> DataFrame:
    """Stage 1+2 of dissolve: directed boundary edges with their
    per-(key, undirected edge) NET direction sign — net 0 edges
    (interior boundaries) are already cancelled.  Exposed for tests
    and for callers that only need boundary statistics."""
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(polys.sparkSession)

    def edges(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ks, ax, ay, bx, by = [], [], [], [], []
            for k, wkb in zip(pdf[key_col], pdf[geom_col]):
                for ring in _oriented_rings(bytes(wkb)):
                    a, b = ring[:-1], ring[1:]
                    keep = (a != b).any(axis=1)
                    a, b = a[keep], b[keep]
                    ks.extend([k] * len(a))
                    ax.append(a[:, 0]); ay.append(a[:, 1])
                    bx.append(b[:, 0]); by.append(b[:, 1])
            yield pd.DataFrame({
                key_col: ks,
                "ax": np.concatenate(ax) if ax else [],
                "ay": np.concatenate(ay) if ay else [],
                "bx": np.concatenate(bx) if bx else [],
                "by": np.concatenate(by) if by else [],
            })

    ktype = polys.schema[key_col].dataType.simpleString()
    e = polys.select(key_col, geom_col).mapInPandas(
        edges, f"{key_col} {ktype}, ax double, ay double, "
               "bx double, by double")

    # undirected canonical key: lexicographic (x, y) smaller endpoint
    # first; the direction sign rides as +/-1 and SUMS — a shared
    # border (one pass each way) nets to 0 and drops map-side.
    fwd = (F.col("ax") < F.col("bx")) | (
        (F.col("ax") == F.col("bx")) & (F.col("ay") < F.col("by")))
    canon = e.select(
        key_col,
        F.when(fwd, F.col("ax")).otherwise(F.col("bx")).alias("x1"),
        F.when(fwd, F.col("ay")).otherwise(F.col("by")).alias("y1"),
        F.when(fwd, F.col("bx")).otherwise(F.col("ax")).alias("x2"),
        F.when(fwd, F.col("by")).otherwise(F.col("ay")).alias("y2"),
        F.when(fwd, F.lit(1)).otherwise(F.lit(-1)).alias("sign"),
    )
    net = (canon.groupBy(key_col, "x1", "y1", "x2", "y2")
           .agg(F.sum("sign").alias("net"))
           .filter(F.col("net") != 0))
    # restore traversal direction from the net sign
    pos = F.col("net") > 0
    return net.select(
        key_col,
        F.when(pos, F.col("x1")).otherwise(F.col("x2")).alias("ax"),
        F.when(pos, F.col("y1")).otherwise(F.col("y2")).alias("ay"),
        F.when(pos, F.col("x2")).otherwise(F.col("x1")).alias("bx"),
        F.when(pos, F.col("y2")).otherwise(F.col("y1")).alias("by"),
        F.abs(F.col("net")).alias("mult"),
    )


def _stitch_rings(edges: np.ndarray) -> tuple[list[np.ndarray], int]:
    """Directed edges [n, 4] -> (closed rings, n_unclosed_edges).

    Each ring follows successor edges start==end; at a pinch vertex
    (several outgoing edges — e.g. two blocks meeting at a corner)
    the RIGHTMOST turn relative to the incoming direction keeps each
    loop simple.  Leftover edges that close no loop (non-coverage
    input) are counted, not silently dropped.
    """
    n = len(edges)
    by_start: dict[tuple[float, float], list[int]] = {}
    for i in range(n):
        by_start.setdefault((edges[i, 0], edges[i, 1]), []).append(i)
    used = np.zeros(n, dtype=bool)
    rings: list[np.ndarray] = []
    for start in range(n):
        if used[start]:
            continue
        path = [start]
        used[start] = True
        closed = False
        for _ in range(n):
            cur = edges[path[-1]]
            end = (cur[2], cur[3])
            cands = [i for i in by_start.get(end, []) if not used[i]]
            if not cands and end == (edges[start, 0], edges[start, 1]):
                closed = True
                break
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # rightmost turn: maximal clockwise angle from the
                # incoming direction (interior stays on the left)
                ang_in = math.atan2(cur[3] - cur[1], cur[2] - cur[0])

                def turn(i: int) -> float:
                    a = math.atan2(edges[i, 3] - edges[i, 1],
                                   edges[i, 2] - edges[i, 0])
                    return (a - ang_in - math.pi) % (2.0 * math.pi)

                nxt = max(cands, key=turn)
            used[nxt] = True
            path.append(nxt)
            if (edges[nxt, 2], edges[nxt, 3]) == (
                    edges[start, 0], edges[start, 1]):
                closed = True
                break
        if closed:
            pts = np.vstack([edges[path, :2], edges[path[-1], 2:4]])
            rings.append(pts)
        else:
            used[path] = True      # leave marked; counted below
    n_open = int(n - sum(len(r) - 1 for r in rings))
    return rings, max(n_open, 0)


def _assemble_multipolygon(rings: list[np.ndarray]) -> bytes:
    """Signed-area classification (CCW shell / CW hole) + ray-cast
    hole homing -> MULTIPOLYGON WKB."""
    from geohub_data_pipeline_spark.operators import geometry as G

    shells, holes = [], []
    for r in rings:
        area2 = float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
        (shells if area2 > 0 else holes).append((abs(area2), r))
    shells.sort(key=lambda t: t[0])        # smallest first: innermost
    polys: list[list[list[tuple[float, float]]]] = [
        [[tuple(p) for p in s]] for _, s in shells]
    for _, h in holes:
        pt = (float(h[0, 0]), float(h[0, 1]))
        # a hole vertex lies ON the shell only in degenerate inputs;
        # probe the edge midpoint nudged nowhere — ray cast suffices
        # against candidate shells smallest-to-largest
        homed = False
        for i, (_, s) in enumerate(shells):
            if G._point_in_ring(pt, [tuple(p) for p in s]) or any(
                    G._point_in_ring((float(x), float(y)),
                                     [tuple(p) for p in s])
                    for x, y in h[1:3]):
                polys[i].append([tuple(p) for p in h])
                homed = True
                break
        if not homed and polys:
            polys[0].append([tuple(p) for p in h])
    return G.wkb_multipolygon(polys)


def dissolve(polys: DataFrame, key_col: str = "key",
             geom_col: str = "geometry") -> DataFrame:
    """Merge all polygons of a key into one MultiPolygon with
    interior boundaries removed.

    Input: (key, geometry binary WKB Polygon/MultiPolygon) — the key
    column keeps its input type (long id, string admin code, ...) —
    in a
    coverage topology (shared borders vertex-identical).  Output one
    row per key: (key, geometry MULTIPOLYGON WKB, n_rings int,
    n_open int) — ``n_open`` > 0 flags boundary multiplicity the
    stitcher could not absorb (duplicated polygons, stacked borders,
    dangling nets: non-coverage input), the quarantine signal.

    Scale: see module docstring — two shuffles, the second carrying
    only the dissolved outline; the stitch group per key is the
    boundary of the dissolved region, not its input polygons.
    """
    net = dissolve_edges(polys, key_col, geom_col)

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        k = pdf[key_col].iloc[0]
        e = pdf[["ax", "ay", "bx", "by"]].to_numpy(np.float64)
        rings, _ = _stitch_rings(e)
        # multiplicity deficit: a net |mult| > 1 edge (duplicated
        # boundary — stacked polygons, collinear overlap) can be
        # stitched only once; the surplus is the non-coverage signal
        n_open = int(pdf["mult"].sum()
                     - sum(len(r) - 1 for r in rings))
        if not rings:
            return pd.DataFrame({key_col: [k], "geometry": [b""],
                                 "n_rings": [0], "n_open": [n_open]})
        return pd.DataFrame({
            key_col: [k],
            "geometry": [_assemble_multipolygon(rings)],
            "n_rings": [len(rings)],
            "n_open": [n_open],
        })

    ktype = polys.schema[key_col].dataType.simpleString()
    return net.groupBy(key_col).applyInPandas(
        stitch, f"{key_col} {ktype}, geometry binary, n_rings int, "
                "n_open int")


def dissolve_features(features: DataFrame,
                      by: str = "layer") -> DataFrame:
    """Dissolve engine FEATURE rows (dataset, layer, fid, geometry,
    ...) grouped by the ``by`` column within each dataset — the
    admin-area merge a user runs right after normalize.  Output one
    row per (dataset, by-value): (dataset, layer, geometry
    MULTIPOLYGON WKB, n_rings, n_open)."""
    from pyspark.sql import functions as F

    keyed = features.select(
        F.concat_ws("\x1f", "dataset", by).alias("key"),
        "dataset", F.col(by).alias("layer"), "geometry")
    out = dissolve(keyed.select("key", "geometry"), "key")
    names = keyed.select("key", "dataset", "layer").dropDuplicates(
        ["key"])
    return (out.join(names, "key")
            .select("dataset", "layer", "geometry", "n_rings",
                    "n_open"))


# ---------------------------------------------------------------------------
# buffer
# ---------------------------------------------------------------------------

def _kgon(cx: float, cy: float, r: float,
          segments: int) -> list[tuple[float, float]]:
    """Closed CCW regular k-gon with a vertex at angle 0 (so the
    half-plane containment form has apothem r*cos(pi/k))."""
    pts = [(cx + r * math.cos(2.0 * math.pi * i / segments),
            cy + r * math.sin(2.0 * math.pi * i / segments))
           for i in range(segments)]
    return pts + [pts[0]]


def buffer_points(points: DataFrame, radius: float,
                  segments: int = 8,
                  id_col: str = "point_id") -> DataFrame:
    """Point buffer: each (id, lon, lat) row becomes a regular
    ``segments``-gon of circumradius ``radius`` (planar degrees) —
    exact polygonal form, map-side Arrow kernel, no shuffle.
    Output: (poly_id, geometry binary WKB)."""
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(points.sparkSession)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [(int(i), G.wkb_polygon(
                [_kgon(float(x), float(y), radius, segments)]))
                for i, x, y in zip(pdf[id_col], pdf["lon"], pdf["lat"])]
            yield pd.DataFrame(rows, columns=["poly_id", "geometry"])

    return points.select(id_col, "lon", "lat").mapInPandas(
        kernel, "poly_id long, geometry binary")


def _offset_ring(c: np.ndarray, r: float,
                 segments: int) -> list[tuple[float, float]]:
    """Outward offset of a closed CCW ring with round (arc-fan)
    joins at convex vertices; concave joins emit the two offset
    edge endpoints (the resulting local self-crossing is repaired by
    make_valid downstream)."""
    pts: list[tuple[float, float]] = []
    n = len(c) - 1
    for i in range(n):
        p0, p1, p2 = c[(i - 1) % n], c[i], c[(i + 1) % n]
        d0 = p1 - p0
        d1 = p2 - p1
        l0 = math.hypot(*d0) or 1.0
        l1 = math.hypot(*d1) or 1.0
        # outward normals of a CCW ring point right of travel
        n0 = (d0[1] / l0, -d0[0] / l0)
        n1 = (d1[1] / l1, -d1[0] / l1)
        pts.append((p1[0] + r * n0[0], p1[1] + r * n0[1]))
        cross = d0[0] * d1[1] - d0[1] * d1[0]
        dot = d0[0] * d1[0] + d0[1] * d1[1]
        a0 = math.atan2(n0[1], n0[0])
        a1 = math.atan2(n1[1], n1[0])
        # convex corner of a CCW ring (left turn) gets a round-join
        # arc fan; a 180-degree reversal (the end cap of a line walk)
        # gets the half-circle fan
        if cross > 0 or (cross == 0 and dot < 0):
            sweep = (a1 - a0) % (2.0 * math.pi) or math.pi
            steps = max(1, int(round(segments * sweep
                                     / (2.0 * math.pi))))
            for s in range(1, steps):
                a = a0 + sweep * s / steps
                pts.append((p1[0] + r * math.cos(a),
                            p1[1] + r * math.sin(a)))
        pts.append((p1[0] + r * n1[0], p1[1] + r * n1[1]))
    pts.append(pts[0])
    return pts


def _outer_shells(cands: list[list[tuple[float, float]]]
                  ) -> list[list[tuple[float, float]]]:
    """Drop shells nested inside a larger kept shell: the node-split
    repair of a concave-join self-crossing reorients the backward-
    swept mini-loop as a standalone shell INSIDE the outline — under
    even-odd rendering it would punch a hole out of the buffer.
    Containment test: ring centroid ray cast against bigger shells."""
    from geohub_data_pipeline_spark.operators import geometry as G

    def area(r):
        c = np.asarray(r, np.float64)
        return abs(float(np.sum(c[:-1, 0] * c[1:, 1]
                                - c[1:, 0] * c[:-1, 1]))) / 2.0

    ordered = sorted(cands, key=area, reverse=True)
    kept: list[list[tuple[float, float]]] = []
    for r in ordered:
        c = np.asarray(r, np.float64)
        rep = (float(c[:-1, 0].mean()), float(c[:-1, 1].mean()))
        if any(G._point_in_ring(rep, k) for k in kept):
            continue
        kept.append(r)
    return kept


def buffer_features(features: DataFrame, radius: float,
                    segments: int = 8) -> DataFrame:
    """Planar buffer of engine feature rows (dataset, layer, fid,
    geometry WKB): points -> k-gons, polygons -> round-join edge
    offsets (exterior ring; holes shrink is out of scope and holes
    are dropped from the buffered outline), linestrings -> both-side
    offset walk.  Concave-join self-crossings are node-split by
    ``make_valid_wkb``.  Map-side kernel, no shuffle."""
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(features.sparkSession)

    def one(wkb: bytes) -> bytes | None:
        p = G.parse_wkb(wkb)
        if p is None:
            return None
        t = p["type"]
        if t in (G.POINT, G.MULTIPOINT):
            c = np.asarray(p["coords"], np.float64).reshape(-1, 2)
            return G.wkb_multipolygon(
                [[_kgon(float(x), float(y), radius, segments)]
                 for x, y in c])
        if t in (G.POLYGON, G.MULTIPOLYGON):
            rings = _oriented_rings(wkb)
            roles_shell = [r for r in rings if float(np.sum(
                r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])) > 0]
            out = []
            for s in roles_shell:
                ring = _offset_ring(s, radius, segments)
                fixed, _ = G.make_valid_wkb(G.wkb_polygon([ring]))
                q = G.parse_wkb(fixed)
                if q and q["type"] in (G.POLYGON, G.MULTIPOLYGON):
                    parts = q.get("parts") or []
                    roles = q.get("roles") or [True] * len(parts)
                    shells = [
                        [tuple(pt) for pt in np.asarray(
                            part, np.float64).reshape(-1, 2)]
                        for part, is_s in zip(parts, roles) if is_s]
                    out.extend([s2] for s2 in _outer_shells(shells))
            return G.wkb_multipolygon(out) if out else None
        if t in (G.LINESTRING, G.MULTILINESTRING):
            out = []
            for part in p["parts"]:
                c = np.asarray(part, np.float64).reshape(-1, 2)
                if len(c) < 2:
                    continue
                # closed walk: down one side, half-circle end cap,
                # back the other side, start cap — a degenerate
                # zero-area "ring" around the path whose offset is
                # the buffer outline, then the same repair as
                # polygons (no consecutive duplicate vertices)
                loop = np.vstack([c, c[-2:0:-1], c[:1]])
                ring = _offset_ring(loop, radius, segments)
                fixed, _ = G.make_valid_wkb(G.wkb_polygon([ring]))
                q = G.parse_wkb(fixed)
                if q and q["type"] in (G.POLYGON, G.MULTIPOLYGON):
                    parts2 = q.get("parts") or []
                    roles2 = q.get("roles") or [True] * len(parts2)
                    shells2 = [
                        [tuple(pt) for pt in np.asarray(
                            pp, np.float64).reshape(-1, 2)]
                        for pp, is_s in zip(parts2, roles2) if is_s]
                    out.extend([s2] for s2 in _outer_shells(shells2))
            return G.wkb_multipolygon(out) if out else None
        return None

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = one(bytes(r.geometry))
                if buf is not None:
                    rows.append((r.dataset, r.layer, int(r.fid), buf))
            yield pd.DataFrame(rows, columns=[
                "dataset", "layer", "fid", "geometry"])

    return features.select(
        "dataset", "layer", "fid", "geometry").mapInPandas(
        kernel, "dataset string, layer string, fid long, "
                "geometry binary")


# ---------------------------------------------------------------------------
# audit: closed-form checkable geometry measures
# ---------------------------------------------------------------------------

def geometry_audit(df: DataFrame, key_col: str = "key",
                   geom_col: str = "geometry",
                   ndigits: int = 6) -> DataFrame:
    """Planar shoelace area / perimeter / ring count per row — the
    oracle-checkable summary of an overlay result (closed-form for
    synthetic coverages).  Map-side kernel."""
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(df.sparkSession)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for k, wkb in zip(pdf[key_col], pdf[geom_col]):
                p = G.parse_wkb(bytes(wkb))
                if p is None or p["type"] not in (G.POLYGON,
                                                  G.MULTIPOLYGON):
                    rows.append((k, 0, 0.0, 0.0))
                    continue
                parts = p.get("parts") or []
                roles = p.get("roles") or [True] * len(parts)
                area = perim = 0.0
                for part, is_shell in zip(parts, roles):
                    c = np.asarray(part, np.float64).reshape(-1, 2)
                    if len(c) < 4:
                        continue
                    a2 = float(np.sum(c[:-1, 0] * c[1:, 1]
                                      - c[1:, 0] * c[:-1, 1]))
                    area += (1.0 if is_shell else -1.0) * abs(a2) / 2.0
                    perim += float(
                        np.hypot(*(c[1:] - c[:-1]).T).sum())
                rows.append((k, len(parts),
                             round(area, ndigits),
                             round(perim, ndigits)))
            yield pd.DataFrame(rows, columns=[
                key_col, "n_rings", "area", "perimeter"])

    ktype = df.schema[key_col].dataType.simpleString()
    return df.select(key_col, geom_col).mapInPandas(
        kernel, f"{key_col} {ktype}, n_rings int, area double, "
                "perimeter double")


# ---------------------------------------------------------------------------
# raster polygonize (gdal_polygonize parity) on the dissolve machinery
# ---------------------------------------------------------------------------

def polygonize_blocks(blocks: DataFrame, georef: DataFrame,
                      block_size: int | None = None) -> DataFrame:
    """Vectorize a categorical raster: one (Multi)Polygon per
    distinct pixel VALUE per (dataset, band) — the engine's
    ``gdal_polygonize`` analog, built on the dissolve machinery.

    Per block (map-side numpy): emit only the REGION-BOUNDARY edges —
    a pixel side where the neighbor value differs (or is nodata /
    the block border) — oriented interior-on-the-left, with world
    coordinates computed from the GLOBAL pixel index so the same
    physical edge is bit-identical in adjacent blocks.  Then the
    dissolve cancellation does the rest: a block-border edge whose
    neighbor block holds the SAME value appears once from each side
    in opposite directions and nets to zero in the partial-aggregated
    groupBy — cross-block region stitching falls out of the same one
    shuffle, no halo exchange needed.  Ring assembly per
    (dataset, band, value) is the dissolve stitcher (pinch-corner
    rightmost turns, hole homing).

    Output: (dataset, band, value, geometry MULTIPOLYGON WKB,
    n_rings, n_open).

    Scale: emitted edge volume is the region-boundary length (not
    pixels x 4); the stitch group per value is its outline.  Run-
    length merging of collinear boundary edges would shrink the
    shuffle further (left as an optimization; the stitcher is
    indifferent to collinear vertices).
    """
    from pyspark.sql.functions import broadcast

    from geohub_data_pipeline_spark.operators.raster import BLOCK
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(blocks.sparkSession)

    bs = block_size or BLOCK
    geo = (blocks.filter(F.col("level") == 0)
           .select("dataset", "band", "block_x", "block_y",
                   "width", "height", "pixels", "nodata")
           .join(broadcast(georef.dropDuplicates(["dataset"])
                           .select("dataset", "origin_x", "origin_y",
                                   "pixel_sx", "pixel_sy")),
                 "dataset"))

    def edges(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for r in pdf.itertuples(index=False):
                h, w = int(r.height), int(r.width)
                v = np.asarray(r.pixels, np.float64).reshape(h, w)
                valid = np.isfinite(v)
                if r.nodata is not None and not np.isnan(r.nodata):
                    valid &= v != r.nodata
                ox, oy = float(r.origin_x), float(r.origin_y)
                psx, psy = float(r.pixel_sx), abs(float(r.pixel_sy))
                c0 = int(r.block_x) * bs
                r0 = int(r.block_y) * bs

                def X(c):
                    return ox + (c0 + c) * psx

                def Y(rr):
                    return oy - (r0 + rr) * psy

                def differs(a_val, a_ok, b_val, b_ok):
                    return a_ok & (~b_ok | (a_val != b_val))

                pad_v = np.pad(v, 1, constant_values=np.nan)
                pad_ok = np.pad(valid, 1, constant_values=False)
                nb = {"E": (pad_v[1:-1, 2:], pad_ok[1:-1, 2:]),
                      "W": (pad_v[1:-1, :-2], pad_ok[1:-1, :-2]),
                      "N": (pad_v[:-2, 1:-1], pad_ok[:-2, 1:-1]),
                      "S": (pad_v[2:, 1:-1], pad_ok[2:, 1:-1])}
                def runs(rr, cc, vals, along_rows):
                    """Collapse consecutive boundary pixels into
                    maximal runs (inputs ordered along the run
                    axis).  Returns (r_lo, c_lo, r_hi, c_hi, val)
                    with hi inclusive."""
                    if along_rows:       # horizontal runs: same r,
                        brk = (np.diff(rr) != 0) | (np.diff(cc) != 1)
                    else:                # vertical runs: same c
                        brk = (np.diff(cc) != 0) | (np.diff(rr) != 1)
                    brk = brk | (np.diff(vals) != 0)
                    starts = np.concatenate(
                        ([0], np.nonzero(brk)[0] + 1))
                    ends = np.concatenate(
                        (np.nonzero(brk)[0], [len(rr) - 1]))
                    return (rr[starts], cc[starts], rr[ends],
                            cc[ends], vals[starts])

                for side, (bv, bok) in nb.items():
                    mask = differs(v, valid, bv, bok)
                    # block-border edges may have to CANCEL against
                    # the neighbor block's per-pixel emission, so
                    # they stay unit-length; interior region
                    # boundaries never cancel (their pair carries a
                    # different value key) and merge into maximal
                    # runs — typically a 10-50x cut of the shuffle.
                    border = np.zeros_like(mask)
                    if side == "E":
                        border[:, -1] = mask[:, -1]
                    elif side == "W":
                        border[:, 0] = mask[:, 0]
                    elif side == "N":
                        border[0, :] = mask[0, :]
                    else:
                        border[-1, :] = mask[-1, :]
                    interior = mask & ~border
                    segs = []
                    if side in ("E", "W"):     # vertical: runs in r
                        ccT, rrT = np.nonzero(interior.T)
                        if len(rrT):
                            segs.append(runs(rrT, ccT,
                                             v[rrT, ccT], False))
                    else:                      # horizontal: runs in c
                        rrH, ccH = np.nonzero(interior)
                        if len(rrH):
                            segs.append(runs(rrH, ccH,
                                             v[rrH, ccH], True))
                    rb, cb = np.nonzero(border)
                    if len(rb):
                        segs.append((rb, cb, rb, cb, v[rb, cb]))
                    for r_lo, c_lo, r_hi, c_hi, val in segs:
                        if side == "E":  # interior west: south->north
                            x1 = x2 = X(c_lo + 1)
                            y1, y2 = Y(r_hi + 1), Y(r_lo)
                        elif side == "W":  # interior east: north->south
                            x1 = x2 = X(c_lo)
                            y1, y2 = Y(r_lo), Y(r_hi + 1)
                        elif side == "N":  # interior south: east->west
                            x1, x2 = X(c_hi + 1), X(c_lo)
                            y1 = y2 = Y(r_lo)
                        else:              # interior north: west->east
                            x1, x2 = X(c_lo), X(c_hi + 1)
                            y1 = y2 = Y(r_lo + 1)
                        x1 = np.broadcast_to(x1, val.shape)
                        x2 = np.broadcast_to(x2, val.shape)
                        y1 = np.broadcast_to(y1, val.shape)
                        y2 = np.broadcast_to(y2, val.shape)
                        out_rows.append(pd.DataFrame({
                            "dataset": r.dataset, "band": int(r.band),
                            "value": val, "ax": x1, "ay": y1,
                            "bx": x2, "by": y2}))
            yield (pd.concat(out_rows) if out_rows else pd.DataFrame({
                "dataset": pd.Series([], dtype=str),
                "band": pd.Series([], dtype="int32"),
                "value": pd.Series([], dtype=float),
                "ax": pd.Series([], dtype=float),
                "ay": pd.Series([], dtype=float),
                "bx": pd.Series([], dtype=float),
                "by": pd.Series([], dtype=float)}))

    e = geo.mapInPandas(
        edges, "dataset string, band int, value double, ax double, "
               "ay double, bx double, by double")

    fwd = (F.col("ax") < F.col("bx")) | (
        (F.col("ax") == F.col("bx")) & (F.col("ay") < F.col("by")))
    canon = e.select(
        "dataset", "band", "value",
        F.when(fwd, F.col("ax")).otherwise(F.col("bx")).alias("x1"),
        F.when(fwd, F.col("ay")).otherwise(F.col("by")).alias("y1"),
        F.when(fwd, F.col("bx")).otherwise(F.col("ax")).alias("x2"),
        F.when(fwd, F.col("by")).otherwise(F.col("ay")).alias("y2"),
        F.when(fwd, F.lit(1)).otherwise(F.lit(-1)).alias("sign"),
    )
    net = (canon.groupBy("dataset", "band", "value",
                         "x1", "y1", "x2", "y2")
           .agg(F.sum("sign").alias("net"))
           .filter(F.col("net") != 0))
    pos = F.col("net") > 0
    net = net.select(
        "dataset", "band", "value",
        F.when(pos, F.col("x1")).otherwise(F.col("x2")).alias("ax"),
        F.when(pos, F.col("y1")).otherwise(F.col("y2")).alias("ay"),
        F.when(pos, F.col("x2")).otherwise(F.col("x1")).alias("bx"),
        F.when(pos, F.col("y2")).otherwise(F.col("y1")).alias("by"),
        F.abs(F.col("net")).alias("mult"),
    )

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        ds = pdf["dataset"].iloc[0]
        band = int(pdf["band"].iloc[0])
        val = float(pdf["value"].iloc[0])
        e2 = pdf[["ax", "ay", "bx", "by"]].to_numpy(np.float64)
        rings, _ = _stitch_rings(e2)
        n_open = int(pdf["mult"].sum()
                     - sum(len(rg) - 1 for rg in rings))
        geom = _assemble_multipolygon(rings) if rings else b""
        return pd.DataFrame({
            "dataset": [ds], "band": [band], "value": [val],
            "geometry": [geom], "n_rings": [len(rings)],
            "n_open": [n_open]})

    return net.groupBy("dataset", "band", "value").applyInPandas(
        stitch, "dataset string, band int, value double, "
                "geometry binary, n_rings int, n_open int")


# ---------------------------------------------------------------------------
# clip to a convex window (Sutherland-Hodgman)
# ---------------------------------------------------------------------------

def _clip_ring_convex(pts: np.ndarray,
                      clip: list[tuple[float, float]]) -> np.ndarray:
    """Sutherland-Hodgman: closed ring [n,2] clipped to a CONVEX CCW
    window; returns a closed ring (possibly empty)."""
    poly = [tuple(p) for p in pts[:-1]]
    m = len(clip) - 1
    for i in range(m):
        if not poly:
            break
        ax, ay = clip[i]
        bx, by = clip[i + 1]
        ex, ey = bx - ax, by - ay

        def inside(p):
            return ex * (p[1] - ay) - ey * (p[0] - ax) >= 0.0

        def isect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            den = ex * dy - ey * dx
            t = (ex * (ay - p[1]) - ey * (ax - p[0])) / den
            return (p[0] + t * dx, p[1] + t * dy)

        out = []
        prev = poly[-1]
        prev_in = inside(prev)
        for cur in poly:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(isect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(isect(prev, cur))
            prev, prev_in = cur, cur_in
        poly = out
    if len(poly) < 3:
        return np.empty((0, 2))
    return np.asarray(poly + [poly[0]], np.float64)


def _clip_segment_convex(p, q, clip):
    """Liang-Barsky-style parametric clip of segment p-q to a convex
    CCW window; returns (p', q') or None."""
    t0, t1 = 0.0, 1.0
    dx, dy = q[0] - p[0], q[1] - p[1]
    for i in range(len(clip) - 1):
        ax, ay = clip[i]
        bx, by = clip[i + 1]
        ex, ey = bx - ax, by - ay
        # signed distance rate of p+t*d against the inside half-plane
        num = ex * (p[1] - ay) - ey * (p[0] - ax)
        den = ex * dy - ey * dx
        if den == 0.0:
            if num < 0.0:
                return None
            continue
        t = -num / den
        if den < 0.0:                      # leaving
            t1 = min(t1, t)
        else:                              # entering
            t0 = max(t0, t)
        if t0 > t1:
            return None
    return ((p[0] + t0 * dx, p[1] + t0 * dy),
            (p[0] + t1 * dx, p[1] + t1 * dy))


def clip_features(features: DataFrame,
                  clip_ring: list[tuple[float, float]]) -> DataFrame:
    """Clip engine feature rows to a CONVEX window (AOI rectangle /
    convex polygon, closed CCW ring): polygons via Sutherland-
    Hodgman per ring (holes clip too and stay holes), lines via
    parametric segment clipping (split parts re-group), points by
    half-plane test.  Features that clip away entirely are dropped.
    Map-side Arrow kernel — the classic pre-filter before tiling or a
    spatial join, no shuffle.

    Convexity is the S-H contract; for concave AOIs, dissolve the
    AOI into convex pieces and union the clips (or use the tile grid
    as the window set, as the tiler does).
    """
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(features.sparkSession)

    clip = [(float(x), float(y)) for x, y in clip_ring]
    a2 = sum(x1 * y2 - x2 * y1
             for (x1, y1), (x2, y2) in zip(clip, clip[1:]))
    if a2 < 0:
        clip = clip[::-1]

    def one(wkb: bytes) -> bytes | None:
        p = G.parse_wkb(wkb)
        if p is None:
            return None
        t = p["type"]
        if t in (G.POINT, G.MULTIPOINT):
            c = np.asarray(p["coords"], np.float64).reshape(-1, 2)
            keep = [tuple(pt) for pt in c
                    if _clip_segment_convex(pt, pt, clip)]
            if not keep:
                return None
            if len(keep) == 1:
                return G.wkb_point(*keep[0])
            from geohub_data_pipeline_spark.sources.shapefile import (
                _multipoint_wkb,
            )
            return _multipoint_wkb(keep)
        if t in (G.LINESTRING, G.MULTILINESTRING):
            parts_out = []
            for part in p["parts"]:
                c = np.asarray(part, np.float64).reshape(-1, 2)
                run: list[tuple[float, float]] = []
                for i in range(len(c) - 1):
                    seg = _clip_segment_convex(tuple(c[i]),
                                               tuple(c[i + 1]), clip)
                    if seg is None:
                        if len(run) >= 2:
                            parts_out.append(run)
                        run = []
                        continue
                    if run and run[-1] == seg[0]:
                        run.append(seg[1])
                    else:
                        if len(run) >= 2:
                            parts_out.append(run)
                        run = list(seg)
                if len(run) >= 2:
                    parts_out.append(run)
            if not parts_out:
                return None
            if len(parts_out) == 1:
                return G.wkb_linestring(parts_out[0])
            from geohub_data_pipeline_spark.sources.shapefile import (
                _multilinestring_wkb,
            )
            return _multilinestring_wkb(parts_out)
        if t in (G.POLYGON, G.MULTIPOLYGON):
            polys = []
            cur: list[list[tuple[float, float]]] = []
            parts = p.get("parts") or []
            roles = p.get("roles") or [True] * len(parts)
            for part, is_shell in zip(parts, roles):
                c = np.asarray(part, np.float64).reshape(-1, 2)
                clipped = _clip_ring_convex(c, clip)
                if is_shell:
                    cur = []
                    polys.append(cur)
                # a hole may only follow a SURVIVING shell — if the
                # shell clipped away, writing the hole first would
                # promote it to an exterior ring (hole subset shell,
                # so geometrically this only guards fp slivers)
                if len(clipped) and (is_shell or cur):
                    cur.append([tuple(pt) for pt in clipped])
            polys = [rings for rings in polys if rings]
            if not polys:
                return None
            return G.wkb_multipolygon(polys)
        return None

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = one(bytes(r.geometry))
                if buf is not None:
                    rows.append((r.dataset, r.layer, int(r.fid), buf))
            yield pd.DataFrame(rows, columns=[
                "dataset", "layer", "fid", "geometry"])

    return features.select(
        "dataset", "layer", "fid", "geometry").mapInPandas(
        kernel, "dataset string, layer string, fid long, "
                "geometry binary")


# ---------------------------------------------------------------------------
# two-layer overlay: intersection / union geometry per feature pair
# ---------------------------------------------------------------------------

def _polys_of_wkb(wkb: bytes) -> list[list[list[tuple[float, float]]]]:
    """WKB -> [[shell, hole...], ...] closed vertex-tuple rings with
    OGC winding normalized (shell CCW, holes CW)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    p = G.parse_wkb(wkb)
    if p is None or p["type"] not in (G.POLYGON, G.MULTIPOLYGON):
        return []
    polys: list[list[list[tuple[float, float]]]] = []
    roles = p.get("roles") or []
    for part, is_shell in zip(p.get("parts") or [], roles):
        c = np.asarray(part, np.float64).reshape(-1, 2)
        ring = [tuple(pt) for pt in c]
        if ring and ring[0] != ring[-1]:
            ring.append(ring[0])
        from geohub_data_pipeline_spark.operators.geometry import _orient
        ring = _orient(ring, ccw=is_shell)
        if is_shell or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    return polys


def _ring_intersect(sa, sb):
    """Intersection pieces of two simple CLOSED rings: list of CCW
    shells; [] when empty; None on a degeneracy (tangency etc.)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    ov = G._ring_overlay(sa, sb, intersect=True)
    if ov is None:
        return None
    if ov:
        return [r for r in ov if G._ring_area2(r) > 0]
    # no proper crossings: containment or disjoint
    pa = G._off_boundary_vertex(sa, sb)
    if pa is not None and G._point_in_ring(pa, sb):
        return [sa]
    pb = G._off_boundary_vertex(sb, sa)
    if pb is not None and G._point_in_ring(pb, sa):
        return [sb]
    return []


def _ring_strictly_inside(inner, outer) -> bool:
    """True when a vertex of ``inner`` off ``outer``'s boundary lies
    inside ``outer``.  A valid containment test ONLY when the rings
    are already known not to properly cross."""
    from geohub_data_pipeline_spark.operators import geometry as G

    p = G._off_boundary_vertex(inner, outer)
    return p is not None and G._point_in_ring(p, outer)


def _same_ring(a, b) -> bool:
    """True when two CLOSED rings trace the same vertex cycle in
    either direction (exact coordinate equality — the duplicate-row
    case, not a tolerance match)."""
    va = [tuple(p) for p in a[:-1]]
    vb = [tuple(p) for p in b[:-1]]
    if len(va) != len(vb) or not va:
        return False
    for cand in (vb, vb[::-1]):
        try:
            k = cand.index(va[0])
        except ValueError:
            return False
        if va == cand[k:] + cand[:k]:
            return True
    return False


def _merge_hole(hole, holes):
    """Reconcile a NEW hole ring against a piece's EXISTING holes
    before it is subtracted, so overlapping subtractions stay exact
    (sequential erase of overlapping B features previously nested
    the second hole inside the first and double-subtracted the
    overlap).

    Returns ``(hole, remaining, covered, degen)``: the (possibly
    union-grown) ring still to subtract, the existing holes that
    survive, ``covered`` when the new hole lies entirely inside an
    existing one (the region is already removed — no-op), and the
    quarantine flag.  Exact for disjoint / nested / simply-crossing
    hole pairs; a tangency, or a union whose walk traps an enclosed
    pocket (two crescents), flags ``degen`` and leaves that existing
    hole untouched — the quarantine contract, never a silent wrong
    answer.
    """
    from geohub_data_pipeline_spark.operators import geometry as G

    remaining: list = []
    degen = False
    for i, h in enumerate(holes):
        if _same_ring(hole, h):
            # duplicate subtraction (duplicate B rows): exact no-op
            return hole, remaining + holes[i:], True, degen
        ov = G._ring_overlay(hole, h, union=True)
        if ov is None:
            degen = True                  # tangency: keep h, flag
            remaining.append(h)
            continue
        if ov:
            # properly crossing: a clean union is ONE CCW outer loop
            if len(ov) == 1 and G._ring_area2(ov[0]) > 0:
                hole = ov[0]              # h absorbed into the hole
                continue
            degen = True                  # pocket between the rings
            remaining.append(h)
            continue
        # no proper crossings: containment or disjoint
        if _ring_strictly_inside(hole, h):
            # already removed by h (any holes merged so far are also
            # inside h, so dropping them is implied by keeping h)
            return hole, remaining + holes[i:], True, degen
        if _ring_strictly_inside(h, hole):
            continue                      # h swallowed: drop it
        remaining.append(h)               # disjoint
    return hole, remaining, False, degen


def _subtract_hole(pieces, hole):
    """Subtract one CLOSED hole ring from a list of [shell, hole...]
    piece polygons.  Returns (pieces, degenerate).

    Each piece's existing holes are reconciled first
    (``_merge_hole``) so a hole overlapping an earlier subtraction
    removes only the not-yet-removed region."""
    from geohub_data_pipeline_spark.operators import geometry as G

    out = []
    degen = False
    for rings in pieces:
        shell = rings[0]
        nh, rem, covered, d = _merge_hole(hole, list(rings[1:]))
        degen |= d
        if covered:
            out.append(rings)             # no-op: region already gone
            continue
        diff = G._ring_difference(shell, nh)
        if diff is None:
            degen = True
            out.append(rings)             # quarantine: untouched
            continue
        if diff:
            # shell properly crossed: replaced by simple shells; the
            # surviving holes re-home to whichever part contains them
            for ns in diff:
                sub = [ns]
                for h in rem:
                    if _ring_strictly_inside(h, ns):
                        sub.append(h)
                out.append(sub)
            continue
        # no crossings: containment cases
        if _ring_strictly_inside(shell, nh):
            continue                      # piece swallowed by the hole
        if _ring_strictly_inside(nh, shell):
            out.append([shell] + rem + [G._orient(nh, ccw=False)])
            continue                      # hole strictly inside: keep it
        out.append(rings)                 # disjoint
    return out, degen


def intersect_polygons(wkb_a: bytes, wkb_b: bytes):
    """Exact planar intersection of two (multi)polygons.

    Returns ``(pieces, degenerate)``: pieces is [[shell, hole...],
    ...] with OGC winding; degenerate True flags a tangency /
    collinear-overlap the node-split walk refuses (caller quarantines
    the pair the way ``make_valid_polygons`` keeps its flag).
    """
    degen = False
    pieces: list[list[list[tuple[float, float]]]] = []
    for pa in _polys_of_wkb(wkb_a):
        for pb in _polys_of_wkb(wkb_b):
            got = _ring_intersect(pa[0], pb[0])
            if got is None:
                degen = True
                continue
            cur = [[s] for s in got]
            for hole in pa[1:] + pb[1:]:
                cur, d = _subtract_hole(cur, hole)
                degen |= d
            pieces += cur
    return pieces, degen


def _fan_bbox_tiles(side: str, n: int, lines: bool = False,
                    with_geom: bool = True):
    """Shared map-side fan for the overlay family: every feature is
    emitted once per WebMercator zoom-``n`` tile its bbox covers,
    tagged with the bbox so the post-shuffle join can prune
    non-overlapping candidates cheaply.  ``lines=True`` reads raw
    coordinate parts (LineStrings); otherwise polygon rings.
    ``with_geom=False`` drops the WKB payload from the shuffle for
    consumers that re-join geometry by id afterwards.

    Returns ``(kernel, schema)`` for ``mapInPandas``.
    """
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.operators import spatial as SP

    cols = ["tile", f"{side}_id"]
    schema = f"tile long, {side}_id long"
    if with_geom:
        cols.append(f"{side}_geom")
        schema += f", {side}_geom binary"
    for c in ("x0", "y0", "x1", "y1"):
        cols.append(f"{side}_{c}")
        schema += f", {side}_{c} double"

    def coords_of(wkb: bytes):
        if lines:
            p = G.parse_wkb(wkb)
            if p is None:
                return None
            parts = [np.asarray(x, np.float64).reshape(-1, 2)
                     for x in p.get("parts") or []]
            return parts or None
        return SP._rings_of_wkb(wkb) or None

    def k(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for pid, wkb in zip(pdf["poly_id"], pdf["geometry"]):
                if wkb is None:      # NULL geometry: no candidates
                    continue
                parts = coords_of(bytes(wkb))
                if parts is None:
                    continue
                allc = np.concatenate(parts)
                lo_x, lo_y = allc.min(axis=0)
                hi_x, hi_y = allc.max(axis=0)
                tx0 = int((lo_x + 180.0) / 360.0 * n)
                tx1 = int((hi_x + 180.0) / 360.0 * n)
                ty0 = SP._ytile(hi_y, n)
                ty1 = SP._ytile(lo_y, n)
                geom = (bytes(wkb),) if with_geom else ()
                for tx in range(max(tx0, 0), min(tx1, n - 1) + 1):
                    for ty in range(max(ty0, 0), min(ty1, n - 1) + 1):
                        rows.append((tx * n + ty, int(pid), *geom,
                                     lo_x, lo_y, hi_x, hi_y))
            yield pd.DataFrame(rows, columns=cols)

    return k, schema


def _owner_keep(r, n: int) -> bool:
    """Exactly-once rule for a bbox-overlapping candidate pair seen
    in (possibly) several tiles: keep it only in the tile holding
    the bbox-intersection's top-left corner."""
    from geohub_data_pipeline_spark.operators import spatial as SP

    ix = max(r.a_x0, r.b_x0)
    iy = min(r.a_y1, r.b_y1)
    otx = min(max(int((ix + 180.0) / 360.0 * n), 0), n - 1)
    oty = min(max(SP._ytile(iy, n), 0), n - 1)
    return otx * n + oty == r.tile


def _candidate_pairs(left: DataFrame, right: DataFrame, n: int,
                     lines: bool = False, with_a_geom: bool = True):
    """Fan both layers to bbox tiles, one tile-hash shuffle, bbox
    prune — the overlay family's shared candidate join."""
    ka, sa = _fan_bbox_tiles("a", n, lines=lines, with_geom=with_a_geom)
    kb, sb = _fan_bbox_tiles("b", n)
    lt = left.mapInPandas(ka, sa)
    rt = right.mapInPandas(kb, sb)
    return lt.join(rt, "tile").filter(
        (F.col("a_x0") <= F.col("b_x1")) & (F.col("b_x0") <= F.col("a_x1"))
        & (F.col("a_y0") <= F.col("b_y1")) & (F.col("b_y0") <= F.col("a_y1")))


def overlay_intersection(left: DataFrame, right: DataFrame,
                         zoom: int = 7) -> DataFrame:
    """Distributed two-layer polygon overlay INTERSECTION — the GIS
    "Intersection" tool (parcels x flood zones with the overlap
    geometry, not just the pair list).

    Plan (same 100 TB shape as ``spatial.polygons_intersect_join``):
    both layers fan map-side to the WebMercator tiles their bbox
    covers, ONE tile-hash shuffle co-locates candidates, each
    bbox-overlapping pair is clipped in exactly one owner tile (the
    tile holding its bbox-intersection's top-left corner), so output
    is exactly-once with no distinct() pass.  The per-pair clip is
    the Greiner-Hormann node-split walk (``geometry._ring_overlay``
    intersect mode) with containment fallbacks and hole subtraction
    — never a rasterized approximation.

    Input: ``left(a_id, geometry)``, ``right(b_id, geometry)``.
    Output: one row per pair with a non-empty intersection —
    ``a_id, b_id, geometry`` (multipolygon WKB), ``area`` (planar
    shoelace; holes subtract), ``n_rings``, ``degenerate`` (tangency
    flagged, geometry may be partial — the quarantine contract).
    """
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(left.sparkSession)

    n = 1 << zoom

    cand = _candidate_pairs(
        left.select(F.col("a_id").alias("poly_id"), "geometry"),
        right.select(F.col("b_id").alias("poly_id"), "geometry"), n)

    def clip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if not _owner_keep(r, n):
                    continue
                pieces, degen = intersect_polygons(
                    bytes(r.a_geom), bytes(r.b_geom))
                if not pieces and not degen:
                    continue
                area = 0.0
                nr = 0
                for rings in pieces:
                    for ring in rings:
                        area += G._ring_area2(ring) / 2.0
                        nr += 1
                buf = G.wkb_multipolygon(pieces) if pieces else None
                rows.append((int(r.a_id), int(r.b_id), buf,
                             float(area), nr, bool(degen)))
            yield pd.DataFrame(rows, columns=[
                "a_id", "b_id", "geometry", "area", "n_rings",
                "degenerate"])

    return cand.mapInPandas(
        clip, "a_id long, b_id long, geometry binary, area double, "
              "n_rings long, degenerate boolean")


def clip_lines_to_polygons(lines: DataFrame, polys: DataFrame,
                           zoom: int = 7) -> DataFrame:
    """Line x polygon CLIP join — "how much road runs through each
    admin area": for every (line, polygon) pair whose geometries
    meet, the clipped line length and part count.  Handles concave
    polygons and holes uniformly: each segment is split at its
    proper crossings with the polygon linework and every sub-segment
    keeps or drops by an even-odd midpoint test (holes toggle the
    parity like everywhere else in the engine).

    Distributed shape: identical to ``overlay_intersection`` — both
    sides fan to bbox tiles, one tile-hash shuffle, owner-tile
    exactly-once.  Tangencies (segment endpoint on the boundary,
    collinear runs) flag ``degenerate`` — the quarantine contract.

    Input: ``lines(line_id, geometry)`` (Line/MultiLineString WKB),
    ``polys(poly_id, geometry)``.  Output: ``line_id, poly_id,
    length`` (planar), ``n_parts``, ``degenerate``.
    """
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.operators import spatial as SP
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(lines.sparkSession)

    n = 1 << zoom

    cand = _candidate_pairs(
        lines.select(F.col("line_id").alias("poly_id"), "geometry"),
        polys.select(F.col("poly_id"), "geometry"), n, lines=True)

    def clip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if not _owner_keep(r, n):
                    continue
                lp = G.parse_wkb(bytes(r.a_geom))
                rings = SP._rings_of_wkb(bytes(r.b_geom))
                if lp is None or not rings or lp["type"] not in (
                        G.LINESTRING, G.MULTILINESTRING):
                    continue
                edges = [(tuple(rg[k]), tuple(rg[k + 1]))
                         for rg in rings for k in range(len(rg) - 1)]
                total = 0.0
                n_parts = 0
                degen = False
                for part in lp["parts"]:
                    c = np.asarray(part, np.float64).reshape(-1, 2)
                    for s in range(len(c) - 1):
                        p, q = tuple(c[s]), tuple(c[s + 1])
                        ts = [0.0, 1.0]
                        bad = False
                        for e1, e2 in edges:
                            got = G._crossing_params(p, q, e1, e2)
                            if isinstance(got, str):   # touch/overlap
                                bad = True
                                break
                            if got is not None:
                                ts.append(float(got[0]))
                        if bad:
                            degen = True
                            continue
                        ts = sorted(set(ts))
                        d = (q[0] - p[0], q[1] - p[1])
                        for t1, t2 in zip(ts, ts[1:]):
                            tm = (t1 + t2) / 2.0
                            mx = p[0] + tm * d[0]
                            my = p[1] + tm * d[1]
                            if SP.pnpoly_mask(
                                    np.array([mx]), np.array([my]),
                                    rings)[0]:
                                dx = (t2 - t1) * d[0]
                                dy = (t2 - t1) * d[1]
                                total += float(np.sqrt(dx * dx
                                                       + dy * dy))
                                n_parts += 1
                if total > 0.0 or degen:
                    rows.append((int(r.a_id), int(r.b_id),
                                 float(total), int(n_parts),
                                 bool(degen)))
            yield pd.DataFrame(rows, columns=[
                "line_id", "poly_id", "length", "n_parts",
                "degenerate"])

    return cand.mapInPandas(
        clip, "line_id long, poly_id long, length double, "
              "n_parts long, degenerate boolean")


def overlay_erase(left: DataFrame, right: DataFrame,
                  zoom: int = 7) -> DataFrame:
    """Two-layer overlay ERASE — the GIS "Erase"/"Difference" tool:
    each left feature minus the union of every right feature it
    meets (clip-out: parcels minus water bodies).

    Plan: the same bbox-tile candidate join as
    ``overlay_intersection``, then ONE groupBy(a_id) that collects
    the (deduplicated, owner-tile) B geometries hitting each A and
    subtracts them sequentially with the Greiner-Hormann difference
    walk (every B shell is subtracted exactly like a hole —
    ``_subtract_hole``; a fully-enclosed B survives as a real hole
    ring, a crossing B renodes the shell).  The per-A group is
    bounded by how many B actually overlap it — the same
    output-complexity bound as dissolve's per-key stitch.

    B features carrying interior rings are REFUSED via the
    ``degenerate`` flag (A minus (shell minus hole) would need an
    add-back union; the quarantine contract, not a silent wrong
    answer).  Output: ``a_id, geometry, area, n_rings, degenerate``
    — one row per left feature that still has area (or was flagged);
    a fully-erased A emits a zero-area row so the caller can tell
    "erased away" from "never matched".
    """
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(left.sparkSession)

    n = 1 << zoom

    # the a-side ships bbox only (geometry re-joins by id below), so
    # a left feature spanning many tiles never fans its WKB payload
    cand = _candidate_pairs(
        left.select(F.col("a_id").alias("poly_id"), "geometry"),
        right.select(F.col("b_id").alias("poly_id"), "geometry"),
        n, with_a_geom=False)

    # owner-tile dedup BEFORE the per-A group: a pair spanning four
    # tiles must subtract once, not four times
    def owner(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if not _owner_keep(r, n):
                    continue
                rows.append((int(r.a_id), int(r.b_id), bytes(r.b_geom)))
            yield pd.DataFrame(rows, columns=["a_id", "b_id", "b_geom"])

    pairs = cand.mapInPandas(owner, "a_id long, b_id long, b_geom binary")

    # ONE pass over the candidate pipeline: left-joining the base
    # layer brings geometry to every group and keeps candidate-less
    # left features flowing through untouched (null b side)
    joined = left.select("a_id", F.col("geometry").alias("a_geom")).join(
        pairs, "a_id", "left")

    def erase(pdf: pd.DataFrame) -> pd.DataFrame:
        a_id = int(pdf["a_id"].iloc[0])
        a_wkb = pdf["a_geom"].iloc[0]
        if a_wkb is None:
            # NULL left geometry: quarantine as a degenerate
            # zero-area row (the merge_lines / centroid_features
            # rejected-row convention) — never crash the stage
            return pd.DataFrame([{
                "a_id": a_id, "geometry": None, "area": 0.0,
                "n_rings": 0, "degenerate": True}])
        pieces = _polys_of_wkb(bytes(a_wkb))
        degen = False
        for bw in pdf["b_geom"]:
            if bw is None:
                continue
            for bp in _polys_of_wkb(bytes(bw)):
                if len(bp) > 1:
                    degen = True          # B with holes: refused
                    continue
                pieces, d = _subtract_hole(pieces, bp[0])
                degen |= d
        area = 0.0
        nr = 0
        for rings in pieces:
            for ring in rings:
                area += G._ring_area2(ring) / 2.0
                nr += 1
        buf = G.wkb_multipolygon(pieces) if pieces else None
        return pd.DataFrame([{
            "a_id": a_id, "geometry": buf, "area": float(area),
            "n_rings": nr, "degenerate": bool(degen)}])

    return joined.groupBy("a_id").applyInPandas(
        erase, "a_id long, geometry binary, area double, "
               "n_rings long, degenerate boolean")


def merge_lines(lines: DataFrame) -> DataFrame:
    """Line merge (the GDAL/ESRI "merge touching lines" tool, the
    LINE analog of dissolve): segments sharing an endpoint weld into
    chains — road-network building from segment soup.

    Distributed shape:

    1. map-side endpoint extraction (exact coordinate keys — welding
       is defined by vertex-identical endpoints, the same coverage
       contract as dissolve);
    2. segments sharing an endpoint become edges of a segment graph
       via ONE endpoint-keyed groupBy (per endpoint, (min, other)
       star edges — bounded by junction degree, never all-pairs);
    3. connected components (``dedup.connected_components``
       hash-to-min) label each chain;
    4. per-chain aggregation: part count, total planar length, and
       junction audit — a chain containing a >2-degree endpoint is
       flagged ``branched`` (it welds into a network, not a simple
       path; the caller decides, nothing is silently dropped).

    Output: one row per chain — ``chain_id`` (min line_id),
    ``n_parts``, ``length``, ``branched``, ``n_rejected``
    (unparseable / non-line / degenerate inputs surface as their own
    zero-length chains with ``n_rejected`` = 1, never a silent
    drop).  MultiLineStrings weld as ONE node — every part's
    endpoints attach to the same feature.  Isolated segments are
    their own chain.
    """
    from geohub_data_pipeline_spark.operators import dedup as DD
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(lines.sparkSession)

    def ends(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for lid, wkb in zip(pdf["line_id"], pdf["geometry"]):
                p = G.parse_wkb(bytes(wkb)) if wkb is not None else None
                parts = []
                if p is not None and p["type"] in (
                        G.LINESTRING, G.MULTILINESTRING):
                    parts = [np.asarray(x, np.float64).reshape(-1, 2)
                             for x in p.get("parts") or []]
                    parts = [c for c in parts if len(c) >= 2]
                if not parts:
                    # unusable input surfaces as a rejected row —
                    # never a silent drop
                    rows.append((int(lid), 0.0, None, False))
                    continue
                # a multi-part line is ONE graph node: every part's
                # endpoints attach to the same line_id, so touching
                # parts (its own or neighbors') weld through it
                seg_len = float(sum(
                    np.sum(np.sqrt(np.sum(np.diff(c, axis=0) ** 2,
                                          axis=1)))
                    for c in parts))
                for c in parts:
                    for pt in (c[0], c[-1]):
                        # float() first: repr of numpy scalars is
                        # numpy-version-dependent
                        rows.append((int(lid), seg_len,
                                     f"{float(pt[0])!r},"
                                     f"{float(pt[1])!r}", True))
            yield pd.DataFrame(rows, columns=[
                "line_id", "seg_len", "endpoint", "usable"])

    ep = lines.select("line_id", "geometry").mapInPandas(
        ends, "line_id long, seg_len double, endpoint string, "
              "usable boolean")

    # materialize the endpoint table once: it feeds the edge list,
    # the CC (which re-plans its input every round), and the branch
    # audit — and its exploded lineage trips a Catalyst internal
    # attribute-resolution error inside the CC's self-joins when
    # re-planned (NoSuchElementException on an internal id)
    by_ep = ep.filter("usable").groupBy("endpoint").agg(
        F.collect_set("line_id").alias("ids"),
        F.count("*").alias("degree")).localCheckpoint()
    edges = (by_ep.filter(F.size("ids") > 1)
             .select(F.explode(F.expr(
                 "transform(slice(array_sort(ids), 2, "
                 "size(ids) - 1), x -> "
                 "struct(array_sort(ids)[0] AS id_a, x AS id_b))"))
                 .alias("e"))
             .select("e.id_a", "e.id_b"))
    # chains are the diameter-heavy case (a 10k-segment road is a
    # 10k-hop path): the large/small-star CC converges in O(log n)
    # rounds independent of diameter, where hash-to-min needs
    # diameter rounds
    # checkpoint the edge list: its exploded-struct lineage trips a
    # Catalyst attribute-resolution bug inside the CC's self-joins
    # (NoSuchElementException on an internal attribute id), and the
    # CC re-joins it every round anyway
    labels = DD.alternating_cc(edges.localCheckpoint())

    segs = ep.groupBy("line_id").agg(
        F.first("seg_len").alias("len"),
        F.max(F.col("usable").cast("int")).alias("ok"))
    labeled = (segs.join(labels.withColumnRenamed("node", "line_id"),
                         "line_id", "left")
               .select("line_id", "len", "ok",
                       F.coalesce("label", "line_id")
                       .alias("chain_id")))
    branch_eps = by_ep.filter(F.col("degree") > 2).select(
        F.explode("ids").alias("line_id"),
        F.lit(True).alias("at_branch"))
    labeled = labeled.join(branch_eps.distinct(), "line_id", "left")
    return (labeled.groupBy("chain_id").agg(
        F.sum("ok").cast("long").alias("n_parts"),
        # DECIMAL sum: order-independent across partial aggregation
        F.sum(F.col("len").cast("decimal(30,12)")).cast("double")
        .alias("length"),
        F.max(F.coalesce("at_branch", F.lit(False))).alias("branched"),
        F.sum(1 - F.col("ok")).cast("long").alias("n_rejected"))
        .orderBy("chain_id"))
