"""Geodesic (ellipsoidal) direct/inverse problems and buffering.

The planar buffers elsewhere in the engine treat degrees as a flat
grid; real buffering of geographic features needs the geodesic: a
100 km buffer ring at 60N is visibly egg-shaped in lon/lat.  The
reference gets this from GDAL/OGR's buffer (via PROJ's geodesic code,
ingest/processing.py vector path); here it is closed-form stdlib
math.

Algorithms: Vincenty 1975 (direct and inverse) on WGS84 — the
standard iterative series, sub-mm accurate for non-near-antipodal
lines.  The inverse iteration RAISES on non-convergence (the known
near-antipodal failure mode, |lambda| iterations cap) instead of
returning a silently wrong distance; buffering only ever solves
short lines (the buffer radius), far inside the convergent regime.

Scale: both problems are stateless per-row math — Arrow-batched
map-side kernels, no shuffle; a 100 TB feature table buffers at scan
speed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_A = 6378137.0                      # WGS84
_F = 1.0 / 298.257223563
_B = _A * (1.0 - _F)


def geodesic_direct(lon1: float, lat1: float, azimuth_deg: float,
                    s_m: float) -> tuple[float, float]:
    """Destination (lon2, lat2) going ``s_m`` meters from
    (lon1, lat1) along the initial ``azimuth_deg`` — Vincenty direct
    (closed iteration on sigma; converges for any s)."""
    alpha1 = math.radians(azimuth_deg)
    u1 = math.atan((1 - _F) * math.tan(math.radians(lat1)))
    sigma1 = math.atan2(math.tan(u1), math.cos(alpha1))
    sin_alpha = math.cos(u1) * math.sin(alpha1)
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    u2 = cos2_alpha * (_A * _A - _B * _B) / (_B * _B)
    big_a = 1 + u2 / 16384.0 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    big_b = u2 / 1024.0 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    sigma = s_m / (_B * big_a)
    for _ in range(200):
        two_sig_m = 2 * sigma1 + sigma
        cos2sm = math.cos(two_sig_m)
        delta = (big_b * math.sin(sigma)
                 * (cos2sm + big_b / 4.0
                    * (math.cos(sigma) * (-1 + 2 * cos2sm * cos2sm)
                       - big_b / 6.0 * cos2sm
                       * (-3 + 4 * math.sin(sigma) ** 2)
                       * (-3 + 4 * cos2sm * cos2sm))))
        sigma_next = s_m / (_B * big_a) + delta
        if abs(sigma_next - sigma) < 1e-13:
            sigma = sigma_next
            break
        sigma = sigma_next
    sin_sigma, cos_sigma = math.sin(sigma), math.cos(sigma)
    two_sig_m = 2 * sigma1 + sigma
    cos2sm = math.cos(two_sig_m)
    su1, cu1 = math.sin(u1), math.cos(u1)
    lat2 = math.atan2(
        su1 * cos_sigma + cu1 * sin_sigma * math.cos(alpha1),
        (1 - _F) * math.hypot(
            sin_alpha,
            su1 * sin_sigma - cu1 * cos_sigma * math.cos(alpha1)))
    lam = math.atan2(sin_sigma * math.sin(alpha1),
                     cu1 * cos_sigma - su1 * sin_sigma * math.cos(alpha1))
    c = _F / 16.0 * cos2_alpha * (4 + _F * (4 - 3 * cos2_alpha))
    big_l = lam - (1 - c) * _F * sin_alpha * (
        sigma + c * sin_sigma
        * (cos2sm + c * cos_sigma * (-1 + 2 * cos2sm * cos2sm)))
    lon2 = math.radians(lon1) + big_l
    lon2 = (lon2 + 3 * math.pi) % (2 * math.pi) - math.pi
    return math.degrees(lon2), math.degrees(lat2)


def geodesic_inverse(lon1: float, lat1: float, lon2: float,
                     lat2: float, max_iter: int = 200) -> float:
    """Geodesic distance in meters — Vincenty inverse.  Raises
    RuntimeError on non-convergence (near-antipodal) rather than
    returning a plausible wrong number."""
    if lon1 == lon2 and lat1 == lat2:
        return 0.0
    u1 = math.atan((1 - _F) * math.tan(math.radians(lat1)))
    u2r = math.atan((1 - _F) * math.tan(math.radians(lat2)))
    big_l = math.radians(lon2 - lon1)
    su1, cu1 = math.sin(u1), math.cos(u1)
    su2, cu2 = math.sin(u2r), math.cos(u2r)
    lam = big_l
    for _ in range(max_iter):
        sl, cl = math.sin(lam), math.cos(lam)
        sin_sigma = math.hypot(cu2 * sl, cu1 * su2 - su1 * cu2 * cl)
        if sin_sigma == 0.0:
            return 0.0
        cos_sigma = su1 * su2 + cu1 * cu2 * cl
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cu1 * cu2 * sl / sin_sigma
        cos2_alpha = 1 - sin_alpha * sin_alpha
        cos2sm = (cos_sigma - 2 * su1 * su2 / cos2_alpha
                  if cos2_alpha else 0.0)
        c = _F / 16.0 * cos2_alpha * (4 + _F * (4 - 3 * cos2_alpha))
        lam_prev = lam
        lam = big_l + (1 - c) * _F * sin_alpha * (
            sigma + c * sin_sigma
            * (cos2sm + c * cos_sigma * (-1 + 2 * cos2sm * cos2sm)))
        if abs(lam - lam_prev) < 1e-13:
            break
    else:
        raise RuntimeError(
            "vincenty inverse did not converge (near-antipodal line)")
    u2 = cos2_alpha * (_A * _A - _B * _B) / (_B * _B)
    big_a = 1 + u2 / 16384.0 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    big_b = u2 / 1024.0 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    delta = (big_b * sin_sigma
             * (cos2sm + big_b / 4.0
                * (cos_sigma * (-1 + 2 * cos2sm * cos2sm)
                   - big_b / 6.0 * cos2sm
                   * (-3 + 4 * sin_sigma * sin_sigma)
                   * (-3 + 4 * cos2sm * cos2sm))))
    return _B * big_a * (sigma - delta)


def ring_vertices(lon: float, lat: float, radius_m: float,
                  n_azimuths: int) -> list[tuple[int, float, float]]:
    """The buffer ring of one point: [(k, vlon, vlat)] for k equal
    azimuth steps.  THE shared kernel — buffer_points and the
    direct-vs-inverse invariants gate both call this, so the
    cross-check always validates the exact computation the buffer
    operator ships."""
    step = 360.0 / n_azimuths
    return [(k, *geodesic_direct(lon, lat, k * step, radius_m))
            for k in range(n_azimuths)]


def buffer_points(points: DataFrame, radius_m: float, n_azimuths: int,
                  id_col: str = "id", lon_col: str = "lon",
                  lat_col: str = "lat") -> DataFrame:
    """Geodesic buffer ring per point: one row per (point, azimuth
    step) with the ring vertex — the distributed primitive a
    buffer-then-spatial-join pipeline consumes.

    Scale: stateless Arrow-batched kernel over the point table — a
    scan, no shuffle; output fan-out is the fixed n_azimuths."""
    from collections.abc import Iterator

    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package

    ship_package(points.sparkSession)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for pid, lon, lat in zip(pdf[id_col], pdf[lon_col],
                                     pdf[lat_col]):
                rows.extend(
                    (int(pid), k, vlon, vlat)
                    for k, vlon, vlat in ring_vertices(
                        float(lon), float(lat), radius_m, n_azimuths))
            yield pd.DataFrame(rows, columns=["id", "k", "vlon", "vlat"])

    return points.select(
        F.col(id_col).alias(id_col), F.col(lon_col).alias(lon_col),
        F.col(lat_col).alias(lat_col)
    ).mapInPandas(kernel, "id long, k int, vlon double, vlat double")
