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


# ---------------------------------------------------------------------------
# Joint shared-border simplification (tippecanoe --detect-shared-borders,
# ref the flag wired through ingest/processing.py's tile build).
#
# The census (operators/tiling.py shared_border_stats) finds which
# segments are shared; HERE the borders are simplified *consistently*:
# every ring is split into chains at ownership transitions, and each
# chain is simplified as a CANONICAL pure function of its vertex
# sequence (canonical direction + deterministic Douglas-Peucker with
# pinned endpoints).  Two polygons sharing a border see the same
# vertex sequence (up to reversal), so they independently compute the
# IDENTICAL simplified chain — crack-free borders with zero cross-
# feature coordination, which is what makes this formulation scale:
# the only shuffles are the segment census and the key join-back.
# ---------------------------------------------------------------------------

def _chain_canonical_dp(chain: list[tuple[float, float]],
                        tol: float) -> list[tuple[float, float]]:
    """Simplify one open chain in canonical direction: reversal-
    invariant, so both owners of a shared border get the same output."""
    rev = list(reversed(chain))
    flip = rev < chain                 # full-sequence lexicographic tie-break
    work = rev if flip else chain
    flat: list[float] = [c for p in work for c in p]
    s = douglas_peucker(flat, tol)
    out = list(zip(s[0::2], s[1::2]))
    return list(reversed(out)) if flip else out


def _signed_area2(pts: list[tuple[float, float]]) -> float:
    """Twice the signed area of a closed ring (shoelace; >0 = CCW)."""
    return sum(x1 * y2 - x2 * y1
               for (x1, y1), (x2, y2) in zip(pts, pts[1:]))


def joint_simplify_ring(pts: list[tuple[float, float]],
                        seg_keys: list[int],
                        tol: float) -> list[tuple[float, float]] | None:
    """Simplify a closed ring chain-by-chain.

    ``seg_keys[i]`` keys segment (pts[i], pts[i+1]): equal keys =
    same owner set (0 = unshared).  Chain boundaries (ownership
    transitions) are PINNED — junction vertices survive at every
    tolerance, which is what keeps three-way corners watertight.
    Returns the closed simplified ring, or None if it degenerates
    (< 3 distinct vertices).
    """
    m = len(pts) - 1                   # segment count (ring closed)
    if m < 3 or len(seg_keys) != m:
        return pts
    cyc = pts[:-1]

    if len(set(seg_keys)) == 1:
        # uniform ring (fully shared or fully private): canonical
        # rotation + direction so both owners simplify the same cycle,
        # then restore the INPUT winding (canonicalization is internal
        # determinism only — callers keep their OGC winding).
        r = min(range(m), key=lambda i: cyc[i])
        fwd = [cyc[(r + i) % m] for i in range(m)]
        bwd = [cyc[(r - i) % m] for i in range(m)]
        loop = min(fwd, bwd) + [cyc[r]]
        flat = [c for p in loop for c in p]
        s = douglas_peucker(flat, tol)
        out = list(zip(s[0::2], s[1::2]))
        if len(out) < 4:
            return None
        if (_signed_area2(out) > 0) != (_signed_area2(pts) > 0):
            out = out[::-1]
        return out

    out: list[tuple[float, float]] = []
    for _key, ch in _ring_chains(pts, seg_keys):
        s = _chain_canonical_dp(ch, tol)
        out += s if not out else s[1:]  # junction vertex shared
    if len(set(out[:-1])) < 3:
        return None
    return out


def _ring_chains(pts: list[tuple[float, float]],
                 seg_keys: list[int]
                 ) -> list[tuple[int, list[tuple[float, float]]]]:
    """Split a closed non-uniform ring into (key, chain) maximal runs
    after rotating a chain boundary to position 0."""
    m = len(pts) - 1
    cyc = pts[:-1]
    b = next(i for i in range(m) if seg_keys[i] != seg_keys[i - 1])
    rpts = [cyc[(b + i) % m] for i in range(m)] + [cyc[b]]
    rkeys = [seg_keys[(b + i) % m] for i in range(m)]
    chains: list[tuple[int, list[tuple[float, float]]]] = []
    start = 0
    for i in range(1, m):
        if rkeys[i] != rkeys[i - 1]:
            chains.append((rkeys[start], rpts[start:i + 1]))
            start = i
    chains.append((rkeys[start], rpts[start:m + 1]))
    return chains


def simplify_rings_joint(rings: DataFrame, tol: float,
                         id_col: str = "rid",
                         ring_col: str = "ring") -> DataFrame:
    """Joint shared-border simplification over a ring table
    (``id_col``, ``ring_col``: array<struct<x,y>> closed rings).

    Plan shape: segment-census shuffle (fine-grained uniform key),
    key-array join back on the ring id, then one map-side pass.
    Returns (id_col, ring) with simplified rings; degenerate rings
    are dropped.
    """
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators.tiling import ring_segments
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(rings.sparkSession)

    segs = rings.select(
        F.col(id_col),
        F.posexplode(ring_segments(F.col(ring_col))).alias("pos", "seg"))
    census = segs.groupBy("seg").agg(
        F.count(F.lit(1)).alias("__owners"),
        F.xxhash64(F.array_sort(F.collect_list(id_col))).alias("__k"))
    keys = (
        segs.join(census, "seg")
        .groupBy(id_col)
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("pos"),
                F.when(F.col("__owners") >= 2, F.col("__k"))
                .otherwise(F.lit(0)).alias("k")))),
            lambda s: s["k"]).alias("__seg_keys"))
    )
    joined = rings.join(keys, id_col)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, ring, seg_keys in pdf[
                    [id_col, ring_col, "__seg_keys"]].itertuples(
                    index=False, name=None):
                pts = [(float(p["x"]), float(p["y"])) for p in ring]
                out = joint_simplify_ring(
                    pts, [int(k) for k in seg_keys], tol)
                if out is None:
                    continue
                rows.append((rid, [{"x": x, "y": y} for x, y in out]))
            yield pd.DataFrame(rows, columns=[id_col, ring_col])

    return joined.mapInPandas(
        kernel,
        f"{id_col} long, {ring_col} array<struct<x: double, y: double>>")


def _chain_fingerprint(chain: list[tuple[float, float]],
                       tol: float) -> str:
    """Direction-invariant hash of the SIMPLIFIED chain — two owners
    of a shared border produce the same fingerprint iff their
    simplified borders are identical (the crack-free invariant)."""
    import hashlib

    rev = list(reversed(chain))
    work = rev if rev < chain else chain
    flat = [c for p in work for c in p]
    s = douglas_peucker(flat, tol)
    payload = ",".join(f"{v:.12f}" for v in s)
    return hashlib.md5(payload.encode()).hexdigest()


def joint_chain_hashes(rings: DataFrame, tol: float,
                       id_col: str = "rid",
                       ring_col: str = "ring") -> DataFrame:
    """Per (ring, shared chain): the owner-set key and the fingerprint
    of the chain AFTER canonical simplification.

    Grouping the output by ``chain_key`` verifies joint simplification
    end-to-end: every shared chain must show its full owner count and
    exactly ONE distinct fingerprint.  Same plan shape as
    ``simplify_rings_joint`` (census shuffle + key join + map pass).
    """
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators.tiling import ring_segments
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(rings.sparkSession)

    segs = rings.select(
        F.col(id_col),
        F.posexplode(ring_segments(F.col(ring_col))).alias("pos", "seg"))
    census = segs.groupBy("seg").agg(
        F.count(F.lit(1)).alias("__owners"),
        F.xxhash64(F.array_sort(F.collect_list(id_col))).alias("__k"))
    keys = (
        segs.join(census, "seg")
        .groupBy(id_col)
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("pos"),
                F.when(F.col("__owners") >= 2, F.col("__k"))
                .otherwise(F.lit(0)).alias("k")))),
            lambda s: s["k"]).alias("__seg_keys"))
    )
    joined = rings.join(keys, id_col)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, ring, seg_keys in pdf[
                    [id_col, ring_col, "__seg_keys"]].itertuples(
                    index=False, name=None):
                pts = [(float(p["x"]), float(p["y"])) for p in ring]
                sk = [int(k) for k in seg_keys]
                if len(pts) - 1 != len(sk):
                    continue
                if len(set(sk)) == 1:
                    if sk[0] != 0:     # fully-shared uniform ring
                        rows.append((rid, sk[0],
                                     _chain_fingerprint(pts, tol)))
                    continue
                for key, ch in _ring_chains(pts, sk):
                    if key != 0:
                        rows.append((rid, key,
                                     _chain_fingerprint(ch, tol)))
            yield pd.DataFrame(rows, columns=[
                id_col, "chain_key", "chain_hash"])

    return joined.mapInPandas(
        kernel, f"{id_col} long, chain_key long, chain_hash string")
