"""Zoom-conditional geometry simplification (tippecanoe
``--simplify-only-low-zooms`` analog; ref /root/reference/ingest/
processing.py:237-255 tippecanoe flags).

Douglas-Peucker with a per-zoom tolerance: the tolerance is the
ground size of ~half a pixel at the target zoom (360 / (2^z * 256)
degrees * factor), so low zooms simplify aggressively and at
``full_detail_zoom`` and above geometry passes through untouched —
exactly tippecanoe's policy.

Runs inside the tiling pipeline as a mapInPandas stage (Arrow-batched
WKB in/out, map-side, no shuffle); pure-python DP on the coordinate
lists the WKB codec exposes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from geohub_data_pipeline_spark.operators import geometry as G


def zoom_tolerance(z: int, px: float = 0.5) -> float:
    """Ground tolerance in degrees: ``px`` pixels at zoom ``z``."""
    return 360.0 / (2 ** z * 256) * px


# below this many vertices the numpy array setup costs more than the
# scalar loop it replaces
_NUMPY_MIN_VERTICES = 32


def _dp_scalar(coords: list[float], tol: float) -> list[float]:
    """Pure-python DP (small geometries)."""
    n = len(coords) // 2
    keep = [False] * n
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay = coords[2 * lo], coords[2 * lo + 1]
        bx, by = coords[2 * hi], coords[2 * hi + 1]
        dx, dy = bx - ax, by - ay
        den = dx * dx + dy * dy
        best, best_d2 = -1, -1.0
        for i in range(lo + 1, hi):
            px_, py_ = coords[2 * i], coords[2 * i + 1]
            if den == 0.0:
                d2 = (px_ - ax) ** 2 + (py_ - ay) ** 2
            else:
                t = ((px_ - ax) * dx + (py_ - ay) * dy) / den
                t = 0.0 if t < 0 else (1.0 if t > 1 else t)
                qx, qy = ax + t * dx, ay + t * dy
                d2 = (px_ - qx) ** 2 + (py_ - qy) ** 2
            if d2 > best_d2:
                best, best_d2 = i, d2
        if best_d2 > tol2:
            keep[best] = True
            stack.append((lo, best))
            stack.append((best, hi))
    out: list[float] = []
    for i in range(n):
        if keep[i]:
            out += [coords[2 * i], coords[2 * i + 1]]
    return out


def _dp_numpy(coords: list[float], tol: float) -> list[float]:
    """Vectorized DP: the farthest-point search runs as numpy array
    ops for long segments, falling back to the scalar loop (over the
    original list) once recursion has subdivided below the numpy
    break-even.  Element-wise IEEE arithmetic and first-max semantics
    (``np.argmax``) are identical to the scalar loop, so both paths
    keep exactly the same vertex set."""
    import numpy as np

    xs = np.asarray(coords[0::2], dtype=np.float64)
    ys = np.asarray(coords[1::2], dtype=np.float64)
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay = coords[2 * lo], coords[2 * lo + 1]
        bx, by = coords[2 * hi], coords[2 * hi + 1]
        dx, dy = bx - ax, by - ay
        den = dx * dx + dy * dy
        if hi - lo >= _NUMPY_MIN_VERTICES:
            px, py = xs[lo + 1:hi], ys[lo + 1:hi]
            if den == 0.0:
                d2 = (px - ax) ** 2 + (py - ay) ** 2
            else:
                t = ((px - ax) * dx + (py - ay) * dy) / den
                np.clip(t, 0.0, 1.0, out=t)
                d2 = (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2
            best = lo + 1 + int(np.argmax(d2))
            best_d2 = float(d2[best - lo - 1])
        else:
            best, best_d2 = -1, -1.0
            for i in range(lo + 1, hi):
                px_, py_ = coords[2 * i], coords[2 * i + 1]
                if den == 0.0:
                    d2 = (px_ - ax) ** 2 + (py_ - ay) ** 2
                else:
                    t = ((px_ - ax) * dx + (py_ - ay) * dy) / den
                    t = 0.0 if t < 0 else (1.0 if t > 1 else t)
                    d2 = (px_ - (ax + t * dx)) ** 2 \
                        + (py_ - (ay + t * dy)) ** 2
                if d2 > best_d2:
                    best, best_d2 = i, d2
        if best_d2 > tol2:
            keep[best] = True
            stack.append((lo, best))
            stack.append((best, hi))
    out = np.empty(2 * int(keep.sum()))
    out[0::2] = xs[keep]
    out[1::2] = ys[keep]
    return out.tolist()


def douglas_peucker(coords: list[float], tol: float) -> list[float]:
    """DP simplification of a flat [x0,y0,x1,y1,...] coordinate list.

    Iterative (stack-based) — recursion depth on long linestrings
    would overflow at real data sizes.  Long inputs take the numpy
    path; both paths are bit-identical.
    """
    n = len(coords) // 2
    if n <= 2:
        return coords
    if n >= _NUMPY_MIN_VERTICES:
        return _dp_numpy(coords, tol)
    return _dp_scalar(coords, tol)


def _simplify_parsed(buf: bytes, tol: float) -> bytes | None:
    """Simplify every linear part of a WKB blob; polygons keep >=4
    points per ring (closed triangle), linestrings >=2."""
    parsed = G.parse_wkb(buf)
    if parsed is None:
        return None
    base = parsed["type"]
    if base in (G.POINT, G.MULTIPOINT):
        return buf

    if base in (G.LINESTRING, G.MULTILINESTRING):
        parts = [douglas_peucker(p, tol) for p in parsed["parts"]]
        parts = [p for p in parts if len(p) >= 4]
        if not parts:
            return None
        if len(parts) == 1 and base == G.LINESTRING:
            return G.wkb_linestring(
                list(zip(parts[0][0::2], parts[0][1::2])))
        out = b"".join(
            G.wkb_linestring(list(zip(p[0::2], p[1::2]))) for p in parts)
        import struct
        return struct.pack("<BII", 1, G.MULTILINESTRING, len(parts)) + out

    # polygons: simplify each ring, keep ring closure
    rings = []
    for p in parsed["parts"]:
        s = douglas_peucker(p, tol)
        # re-close if DP dropped the duplicate closing point's twin
        if len(s) >= 2 and (s[0], s[1]) != (s[-2], s[-1]):
            s += [s[0], s[1]]
        if len(s) >= 8:           # 4 points incl. closure
            rings.append(list(zip(s[0::2], s[1::2])))
    if not rings:
        return None
    if base == G.POLYGON:
        return G.wkb_polygon(rings)
    import struct
    return (struct.pack("<BII", 1, G.MULTIPOLYGON, len(rings))
            + b"".join(G.wkb_polygon([r]) for r in rings))


def simplify_for_zoom(features: DataFrame, z: int,
                      full_detail_zoom: int = 10,
                      geometry_col: str = "geometry") -> DataFrame:
    """Simplify geometries for rendering at zoom ``z``; zooms >=
    ``full_detail_zoom`` pass through untouched
    (--simplify-only-low-zooms)."""
    if z >= full_detail_zoom:
        return features
    tol = zoom_tolerance(z)
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(features.sparkSession)

    cols = features.columns
    schema = features.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keep_rows = []
            for row in pdf.itertuples(index=False):
                d = dict(zip(cols, row))
                buf = d[geometry_col]
                if buf is not None:
                    s = _simplify_parsed(bytes(buf), tol)
                    if s is None:
                        continue          # degenerated away at this zoom
                    d[geometry_col] = s
                keep_rows.append(d)
            yield pd.DataFrame(keep_rows, columns=cols)

    return features.mapInPandas(batches, schema)
