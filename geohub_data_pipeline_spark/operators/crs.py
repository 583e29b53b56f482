"""Pure-python CRS transforms for the high-traffic EPSG codes.

The reference shells out to GDAL/PROJ for reprojection
(ref ingest/processing.py:36-61, 100-213); this container has neither,
so the codes that dominate real geospatial uploads are implemented
closed-form from the published formulas:

* UTM zones (EPSG 326xx/327xx WGS84, 258xx ETRS89) — transverse
  Mercator via the Krueger n-series (Karney 2011, "Transverse Mercator
  with an accuracy of a few nanometers"; series to n^4 ~ sub-mm),
* EPSG:3035 — ETRS89 / LAEA Europe (Snyder 1987 §24, ellipsoidal
  form with authalic latitude),
* EPSG:2154 — RGF93 / Lambert-93, Lambert Conformal Conic 2SP
  (IOGP Guidance Note 7-2 formulas).

Everything is plain ``math`` on (lon, lat) pairs — usable inside
Arrow-batched kernels with zero dependencies.  Datum shifts between
WGS84 and ETRS89/RGF93 (cm-level) are out of scope, as they are for
the reference's default PROJ pipelines too.
"""

from __future__ import annotations

import math

# --- ellipsoids -----------------------------------------------------------

_WGS84 = (6378137.0, 1.0 / 298.257223563)
_GRS80 = (6378137.0, 1.0 / 298.257222101)


# ---------------------------------------------------------------------------
# Transverse Mercator (Krueger series) — UTM
# ---------------------------------------------------------------------------

def _tm_consts(a: float, f: float):
    n = f / (2.0 - f)
    n2, n3, n4 = n * n, n ** 3, n ** 4
    A = a / (1 + n) * (1 + n2 / 4 + n4 / 64)
    alpha = (
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440,
        61 * n3 / 240 - 103 * n4 / 140,
        49561 * n4 / 161280,
    )
    beta = (
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440,
        17 * n3 / 480 - 37 * n4 / 840,
        4397 * n4 / 161280,
    )
    delta = (
        2 * n - 2 * n2 / 3 - 2 * n3,
        7 * n2 / 3 - 8 * n3 / 5,
        56 * n3 / 15,
    )
    e = math.sqrt(f * (2 - f))
    return A, alpha, beta, delta, e


_TM_WGS84 = _tm_consts(*_WGS84)
_TM_GRS80 = _tm_consts(*_GRS80)

_UTM_K0 = 0.9996
_UTM_FE = 500000.0
_UTM_FN_SOUTH = 10000000.0


def _tm_forward(lon: float, lat: float, lon0: float,
                consts) -> tuple[float, float]:
    """(lon, lat) degrees -> unscaled TM (easting, northing) meters."""
    A, alpha, _, _, e = consts
    phi = math.radians(lat)
    lam = math.radians(lon - lon0)
    s = math.sin(phi)
    t = math.sinh(math.atanh(s) - e * math.atanh(e * s))
    xi_p = math.atan2(t, math.cos(lam))
    eta_p = math.asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
    xi = xi_p
    eta = eta_p
    for j, aj in enumerate(alpha, start=1):
        xi += aj * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
        eta += aj * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
    return A * eta, A * xi


def _tm_inverse(x: float, y: float, lon0: float,
                consts) -> tuple[float, float]:
    """Unscaled TM meters -> (lon, lat) degrees."""
    A, _, beta, delta, _ = consts
    xi = y / A
    eta = x / A
    xi_p = xi
    eta_p = eta
    for j, bj in enumerate(beta, start=1):
        xi_p -= bj * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p -= bj * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    tau = math.sin(xi_p) / math.hypot(math.sinh(eta_p), math.cos(xi_p))
    chi = math.atan(tau)
    phi = chi
    for j, dj in enumerate(delta, start=1):
        phi += dj * math.sin(2 * j * chi)
    lam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
    return lon0 + math.degrees(lam), math.degrees(phi)


def lonlat_to_utm(lon: float, lat: float, zone: int,
                  north: bool = True,
                  ellipsoid=_TM_WGS84) -> tuple[float, float]:
    lon0 = zone * 6.0 - 183.0
    x, y = _tm_forward(lon, lat, lon0, ellipsoid)
    e = _UTM_FE + _UTM_K0 * x
    n = _UTM_K0 * y + (0.0 if north else _UTM_FN_SOUTH)
    return e, n


def utm_to_lonlat(e: float, n: float, zone: int,
                  north: bool = True,
                  ellipsoid=_TM_WGS84) -> tuple[float, float]:
    lon0 = zone * 6.0 - 183.0
    x = (e - _UTM_FE) / _UTM_K0
    y = (n - (0.0 if north else _UTM_FN_SOUTH)) / _UTM_K0
    return _tm_inverse(x, y, lon0, ellipsoid)


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area — EPSG:3035 (ETRS89 / LAEA Europe)
# ---------------------------------------------------------------------------

_LAEA_LAT0, _LAEA_LON0 = 52.0, 10.0
_LAEA_FE, _LAEA_FN = 4321000.0, 3210000.0


def _laea_consts(a: float, f: float, lat0: float):
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def q(phi):
        s = math.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * math.log(
                               (1 - e * s) / (1 + e * s)))

    phi0 = math.radians(lat0)
    qp = q(math.pi / 2)
    q0 = q(phi0)
    beta0 = math.asin(q0 / qp)
    rq = a * math.sqrt(qp / 2)
    m0 = math.cos(phi0) / math.sqrt(1 - e2 * math.sin(phi0) ** 2)
    d = a * m0 / (rq * math.cos(beta0))
    return e, e2, q, qp, beta0, rq, d


(_LAEA_E, _LAEA_E2, _LAEA_Q, _LAEA_QP, _LAEA_B0, _LAEA_RQ,
 _LAEA_D) = _laea_consts(*_GRS80, _LAEA_LAT0)


def lonlat_to_laea(lon: float, lat: float) -> tuple[float, float]:
    phi = math.radians(lat)
    lam = math.radians(lon - _LAEA_LON0)
    beta = math.asin(_LAEA_Q(phi) / _LAEA_QP)
    b = _LAEA_RQ * math.sqrt(
        2 / (1 + math.sin(_LAEA_B0) * math.sin(beta)
             + math.cos(_LAEA_B0) * math.cos(beta) * math.cos(lam)))
    x = b * _LAEA_D * math.cos(beta) * math.sin(lam)
    y = (b / _LAEA_D) * (math.cos(_LAEA_B0) * math.sin(beta)
                         - math.sin(_LAEA_B0) * math.cos(beta)
                         * math.cos(lam))
    return _LAEA_FE + x, _LAEA_FN + y


def laea_to_lonlat(e_crd: float, n_crd: float) -> tuple[float, float]:
    x = e_crd - _LAEA_FE
    y = n_crd - _LAEA_FN
    rho = math.hypot(x / _LAEA_D, _LAEA_D * y)
    if rho == 0:
        return _LAEA_LON0, _LAEA_LAT0
    ce = 2 * math.asin(rho / (2 * _LAEA_RQ))
    beta = math.asin(math.cos(ce) * math.sin(_LAEA_B0)
                     + (_LAEA_D * y * math.sin(ce)
                        * math.cos(_LAEA_B0)) / rho)
    lam = math.atan2(
        (x / _LAEA_D) * math.sin(ce),
        rho * math.cos(_LAEA_B0) * math.cos(ce)
        - _LAEA_D * y * math.sin(_LAEA_B0) * math.sin(ce))
    e2 = _LAEA_E2
    phi = (beta
           + (e2 / 3 + 31 * e2 ** 2 / 180 + 517 * e2 ** 3 / 5040)
           * math.sin(2 * beta)
           + (23 * e2 ** 2 / 360 + 251 * e2 ** 3 / 3780)
           * math.sin(4 * beta)
           + (761 * e2 ** 3 / 45360) * math.sin(6 * beta))
    return _LAEA_LON0 + math.degrees(lam), math.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert Conformal Conic 2SP — EPSG:2154 (RGF93 / Lambert-93)
# ---------------------------------------------------------------------------

_LCC_LAT0, _LCC_LON0 = 46.5, 3.0
_LCC_SP1, _LCC_SP2 = 44.0, 49.0
_LCC_FE, _LCC_FN = 700000.0, 6600000.0


def _lcc_consts(a: float, f: float, lat0, sp1, sp2):
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    def t(phi):
        s = math.sin(phi)
        return (math.tan(math.pi / 4 - phi / 2)
                / ((1 - e * s) / (1 + e * s)) ** (e / 2))

    p0, p1, p2 = (math.radians(v) for v in (lat0, sp1, sp2))
    n = ((math.log(m(p1)) - math.log(m(p2)))
         / (math.log(t(p1)) - math.log(t(p2))))
    big_f = m(p1) / (n * t(p1) ** n)
    rho0 = a * big_f * t(p0) ** n
    return e, n, big_f, rho0, t


(_LCC_E, _LCC_N, _LCC_F, _LCC_RHO0, _LCC_T) = _lcc_consts(
    *_GRS80, _LCC_LAT0, _LCC_SP1, _LCC_SP2)
_LCC_A = _GRS80[0]


def lonlat_to_lcc(lon: float, lat: float) -> tuple[float, float]:
    phi = math.radians(lat)
    theta = _LCC_N * math.radians(lon - _LCC_LON0)
    rho = _LCC_A * _LCC_F * _LCC_T(phi) ** _LCC_N
    return (_LCC_FE + rho * math.sin(theta),
            _LCC_FN + _LCC_RHO0 - rho * math.cos(theta))


def lcc_to_lonlat(e_crd: float, n_crd: float) -> tuple[float, float]:
    x = e_crd - _LCC_FE
    y = _LCC_RHO0 - (n_crd - _LCC_FN)
    rho = math.copysign(math.hypot(x, y), _LCC_N)
    theta = math.atan2(x, y)
    lon = math.degrees(theta / _LCC_N) + _LCC_LON0
    tp = (rho / (_LCC_A * _LCC_F)) ** (1 / _LCC_N)
    phi = math.pi / 2 - 2 * math.atan(tp)
    for _ in range(8):                  # converges in ~4 iterations
        s = math.sin(phi)
        phi_next = math.pi / 2 - 2 * math.atan(
            tp * ((1 - _LCC_E * s) / (1 + _LCC_E * s)) ** (_LCC_E / 2))
        if abs(phi_next - phi) < 1e-13:
            phi = phi_next
            break
        phi = phi_next
    return lon, math.degrees(phi)


# ---------------------------------------------------------------------------
# EPSG dispatch
# ---------------------------------------------------------------------------

def to_lonlat(srid: int):
    """Return ``f(x, y) -> (lon, lat)`` for a supported projected CRS,
    else None.  Supported: UTM WGS84 N/S (32601-32660 / 32701-32760),
    UTM ETRS89 N (25828-25838), LAEA Europe (3035), Lambert-93 (2154).
    """
    if 32601 <= srid <= 32660:
        zone = srid - 32600
        return lambda x, y: utm_to_lonlat(x, y, zone, north=True)
    if 32701 <= srid <= 32760:
        zone = srid - 32700
        return lambda x, y: utm_to_lonlat(x, y, zone, north=False)
    if 25828 <= srid <= 25838:
        zone = srid - 25800
        return lambda x, y: utm_to_lonlat(x, y, zone, north=True,
                                          ellipsoid=_TM_GRS80)
    if srid == 3035:
        return laea_to_lonlat
    if srid == 2154:
        return lcc_to_lonlat
    return None


def from_lonlat(srid: int):
    """Forward transform (lon, lat) -> projected, same coverage."""
    if 32601 <= srid <= 32660:
        zone = srid - 32600
        return lambda lon, lat: lonlat_to_utm(lon, lat, zone, north=True)
    if 32701 <= srid <= 32760:
        zone = srid - 32700
        return lambda lon, lat: lonlat_to_utm(lon, lat, zone, north=False)
    if 25828 <= srid <= 25838:
        zone = srid - 25800
        return lambda lon, lat: lonlat_to_utm(lon, lat, zone, north=True,
                                              ellipsoid=_TM_GRS80)
    if srid == 3035:
        return lonlat_to_laea
    if srid == 2154:
        return lonlat_to_lcc
    return None
