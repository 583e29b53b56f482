"""WebMercator tile math (slippy z/x/y) as Catalyst expressions.

The reference tiles vectors through tippecanoe (ref /root/reference/
ingest/processing.py:228-402) and rasters onto the WebMercatorQuad TMS
(ref ingest/config.py:102, processing.py:506).  In the Spark engine a
tile id is just a derived (z, x, y) key: tiling becomes
``groupBy(z, x, y)`` — a plain hash shuffle that AQE can coalesce and
skew-split (low zooms are inherently skewed: z0 is one tile; see
operators/tiling.py for the two-phase mitigation).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_ZOOM = 22


def n_tiles(z: Column) -> Column:
    """2**z as long (pow of 2 is exact in double for z <= 52)."""
    return F.pow(F.lit(2.0), z.cast("int")).cast("long")


def lon_to_xtile(lon: Column, z: Column) -> Column:
    n = n_tiles(z)
    x = F.floor(n * (lon + 180.0) / 360.0)
    return F.least(F.greatest(x, F.lit(0)), n - 1).cast("bigint")


def lat_to_ytile(lat: Column, z: Column) -> Column:
    """Slippy-map y tile: floor(n * (1 - asinh(tan φ)/π) / 2)."""
    n = n_tiles(z)
    rad = F.radians(lat)
    y = F.floor(
        n * (1.0 - F.log(F.tan(rad) + 1.0 / F.cos(rad)) / math.pi) / 2.0)
    return F.least(F.greatest(y, F.lit(0)), n - 1).cast("bigint")


def tile_cols(lon: Column, lat: Column, z: Column) -> list[Column]:
    return [
        z.cast("int").alias("z"),
        lon_to_xtile(lon, z).alias("x"),
        lat_to_ytile(lat, z).alias("y"),
    ]


def hex_cols(lon: Column, lat: Column, size: float) -> list[Column]:
    """Flat-top hexagon binning: (lon, lat) -> axial (hex_q, hex_r)
    cell coordinates for hexagons of circumradius ``size`` degrees —
    the H3-style aggregation key, closed-form and PURE Catalyst
    (fractional axial coords + cube rounding; Red Blob Games'
    standard formulation, public domain).

    Every arithmetic step mirrors the SQL the gate oracle runs
    (same literal order, ``floor(v + 0.5)`` instead of round so both
    engines share tie semantics), making cell assignment
    cross-engine deterministic even for boundary points.
    """
    s = float(size)
    qf = (2.0 / 3.0) * lon / s
    rf = (-1.0 / 3.0) * lon / s + (math.sqrt(3.0) / 3.0) * lat / s
    sf = -qf - rf
    rq = F.floor(qf + 0.5).cast("double")
    rr = F.floor(rf + 0.5).cast("double")
    rs = F.floor(sf + 0.5).cast("double")
    dq = F.abs(rq - qf)
    dr = F.abs(rr - rf)
    ds = F.abs(rs - sf)
    q_fix = (dq > dr) & (dq > ds)
    r_fix = (~q_fix) & (dr > ds)
    hq = F.when(q_fix, -rr - rs).otherwise(rq)
    hr = F.when(r_fix, -rq - rs).otherwise(rr)
    return [hq.cast("long").alias("hex_q"),
            hr.cast("long").alias("hex_r")]
