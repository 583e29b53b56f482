"""Well-Known Text geometry codec — WKT <-> the engine's 2D WKB.

ISO 19125 / OGC Simple Features WKT, the text twin of the WKB the
whole engine speaks: POINT, LINESTRING, POLYGON, MULTIPOINT,
MULTILINESTRING, MULTIPOLYGON (+ EMPTY), with Z/M/ZM suffixes
accepted and the extra ordinates dropped (2D engine, same policy as
the shapefile reader).  Enables the common PostGIS/BigQuery export
shape: a CSV with a WKT geometry column (sources/csvpoints.py routes
it), and gives audits a human-readable geometry form.

The reference reads WKT-bearing CSVs through GDAL's CSV driver
GEOM_POSSIBLE_NAMES path (ref ingest/processing.py:100-213).

Scale: the parser is a single-pass tokenizer used inside Arrow
kernels; nothing here touches the driver.
"""

from __future__ import annotations

import re

_TYPES = ("MULTIPOLYGON", "MULTILINESTRING", "MULTIPOINT",
          "POLYGON", "LINESTRING", "POINT")

_HEAD_RE = re.compile(
    r"^\s*(MULTIPOLYGON|MULTILINESTRING|MULTIPOINT|POLYGON|"
    r"LINESTRING|POINT)\s*(ZM|Z|M)?\s*(EMPTY)?", re.IGNORECASE)


def _coords_of(body: str, dims: int) -> list[tuple[float, float]]:
    import math

    pts = []
    for tok in body.split(","):
        parts = tok.split()
        if len(parts) < 2:
            raise ValueError(f"bad WKT coordinate {tok!r}")
        x, y = float(parts[0]), float(parts[1])
        if not (math.isfinite(x) and math.isfinite(y)):
            raise ValueError(f"non-finite WKT coordinate {tok!r}")
        pts.append((x, y))
    return pts


def _rings_of(body: str, dims: int) -> list[list[tuple[float, float]]]:
    """Split '(...),(...)' one nesting level down."""
    out, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append(body[start:i])
    if not out:
        raise ValueError("bad WKT nesting")
    return out


def wkt_to_wkb(text: str) -> bytes | None:
    """WKT string -> little-endian 2D WKB; None for EMPTY or
    malformed input (the -skipfailures contract)."""
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.sources.shapefile import (
        _multilinestring_wkb,
        _multipoint_wkb,
    )

    if not text:
        return None
    m = _HEAD_RE.match(text)
    if not m:
        return None
    gtype = m.group(1).upper()
    if m.group(3):                         # EMPTY
        return None
    dims = 2 + len(m.group(2) or "")
    body = text[m.end():].strip()
    if not (body.startswith("(") and body.endswith(")")):
        return None
    body = body[1:-1]
    try:
        if gtype == "POINT":
            (x, y), = _coords_of(body, dims)
            return G.wkb_point(x, y)
        if gtype == "LINESTRING":
            pts = _coords_of(body, dims)
            return G.wkb_linestring(pts) if len(pts) >= 2 else None
        if gtype == "POLYGON":
            rings = [_coords_of(r, dims) for r in _rings_of(body, dims)]
            return G.wkb_polygon(rings)
        if gtype == "MULTIPOINT":
            # both '(1 2, 3 4)' and '((1 2), (3 4))' forms are legal
            if "(" in body:
                pts = [_coords_of(p, dims)[0]
                       for p in _rings_of(body, dims)]
            else:
                pts = _coords_of(body, dims)
            return _multipoint_wkb(pts)
        if gtype == "MULTILINESTRING":
            lines = [_coords_of(l, dims) for l in _rings_of(body, dims)]
            return _multilinestring_wkb(lines)
        if gtype == "MULTIPOLYGON":
            polys = []
            for poly in _rings_of(body, dims):
                polys.append([_coords_of(r, dims)
                              for r in _rings_of(poly, dims)])
            return G.wkb_multipolygon(polys)
    except (ValueError, IndexError):
        return None
    return None


def _fmt(v: float) -> str:
    """Shortest exact float text (no trailing .0 for integers;
    negative zero keeps its sign so text->binary is bit-exact)."""
    import math

    if v == int(v):
        if v == 0 and math.copysign(1.0, v) < 0:
            return "-0"
        return repr(int(v))
    return repr(v)


def _pts_txt(flat: list[float]) -> str:
    return ", ".join(f"{_fmt(flat[i])} {_fmt(flat[i + 1])}"
                     for i in range(0, len(flat), 2))


def wkb_to_wkt(wkb: bytes) -> str | None:
    """Engine 2D WKB -> canonical WKT (None for unparseable,
    including non-finite coordinates — WKT has no portable NaN)."""
    import math

    from geohub_data_pipeline_spark.operators import geometry as G

    p = G.parse_wkb(wkb)
    if p is None:
        return None
    if not all(math.isfinite(v) for v in p.get("coords") or []):
        return None
    t = p["type"]
    if t == G.POINT:
        return f"POINT ({_pts_txt(p['coords'])})"
    if t == G.LINESTRING:
        return f"LINESTRING ({_pts_txt(p['coords'])})"
    if t == G.MULTIPOINT:
        return f"MULTIPOINT ({_pts_txt(p['coords'])})"
    parts = p.get("parts") or []
    if t == G.POLYGON:
        inner = ", ".join(f"({_pts_txt(r)})" for r in parts)
        return f"POLYGON ({inner})"
    if t == G.MULTILINESTRING:
        inner = ", ".join(f"({_pts_txt(l)})" for l in parts)
        return f"MULTILINESTRING ({inner})"
    if t == G.MULTIPOLYGON:
        roles = p.get("roles") or []       # True = shell, False = hole
        polys: list[list[list[float]]] = []
        for ring, is_shell in zip(parts, roles):
            if is_shell or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        inner = ", ".join(
            "(" + ", ".join(f"({_pts_txt(r)})" for r in rings) + ")"
            for rings in polys)
        return f"MULTIPOLYGON ({inner})"
    return None
