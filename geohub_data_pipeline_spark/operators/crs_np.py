"""Numpy-vectorized twins of the closed-form CRS families.

``operators/crs.py`` holds the scalar reference implementations
(IOGP GN7-2 / Snyder 1987 formulas, control-point-tested); this
module re-expresses the high-traffic families as array kernels so
the vector normalize stage and the raster warp never loop per vertex
or per pixel in Python for ANY table CRS:

* TM lives in crs.py already (``_tm_forward_np``/``_tm_inverse_np``);
  this module adds LCC-1SP/2SP, LAEA (oblique + polar + sphere),
  oblique stereographic (RD), polar stereographic A/B, cylindrical
  equal area, Albers, Mercator — and a vectorized 7-parameter
  Helmert + ECEF ladder so datum-shifted grids (OSGB, RD New,
  Belgian L72, DHDN GK, ED50/NAD27 UTM, Irish, NTF) vectorize too.
* iterative inverses run their full fixed iteration count (the
  scalar early-exit converges to a fixpoint, so extra applications
  change nothing beyond ~1e-13 rad); series and operation ORDER
  mirror the scalar code so results agree to < 1e-9 degrees
  (tests/test_crs_np.py sweeps every covered srid against the
  scalar path).

Every ``_CRS_TABLE`` family has a twin (incl. Krovak, Hotine
oblique Mercator, sinusoidal, Mollweide, equidistant cylindrical).
Embedded-WKT-resolved CRS (AUTHORITY-less .prj) still compose scalar
closures in crs_wkt.py — those resolve to EPSG codes in the common
case, so the scalar path only carries the exotic tail.
"""

from __future__ import annotations

import math

import numpy as np

from geohub_data_pipeline_spark.operators import crs as C


# ---------------------------------------------------------------------------
# datum ladder
# ---------------------------------------------------------------------------

def _ecef_from_geodetic(lon, lat, ellps):
    a, f = ellps
    e2 = f * (2 - f)
    phi = np.radians(lat)
    lam = np.radians(lon)
    sp = np.sin(phi)
    nu = a / np.sqrt(1 - e2 * sp * sp)
    cp = np.cos(phi)
    return nu * cp * np.cos(lam), nu * cp * np.sin(lam), \
        nu * (1 - e2) * sp


def _geodetic_from_ecef(x, y, z, ellps):
    a, f = ellps
    e2 = f * (2 - f)
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1 - e2))
    for _ in range(10):
        sp = np.sin(phi)
        nu = a / np.sqrt(1 - e2 * sp * sp)
        phi = np.arctan2(z + e2 * nu * sp, p)
    return np.degrees(lam), np.degrees(phi)


def _helmert_np(x, y, z, params, inverse=False):
    tx, ty, tz, s_ppm, rx_s, ry_s, rz_s = params
    sgn = -1.0 if inverse else 1.0
    s = sgn * s_ppm * 1e-6
    rx = sgn * math.radians(rx_s / 3600.0)
    ry = sgn * math.radians(ry_s / 3600.0)
    rz = sgn * math.radians(rz_s / 3600.0)
    return (sgn * tx + (1 + s) * x - rz * y + ry * z,
            sgn * ty + rz * x + (1 + s) * y - rx * z,
            sgn * tz - ry * x + rx * y + (1 + s) * z)


def _with_datum_np(fwd, inv, ellps, params):
    """Wrap grid-side (fwd, inv) so the lon/lat side is WGS84."""

    def fwd2(lon, lat):
        x, y, z = _ecef_from_geodetic(lon, lat, C._WGS84)
        x, y, z = _helmert_np(x, y, z, params)
        return fwd(*_geodetic_from_ecef(x, y, z, ellps))

    def inv2(e_crd, n_crd):
        lon, lat = inv(e_crd, n_crd)
        x, y, z = _ecef_from_geodetic(lon, lat, ellps)
        x, y, z = _helmert_np(x, y, z, params, inverse=True)
        return _geodetic_from_ecef(x, y, z, C._WGS84)

    return fwd2, inv2


# ---------------------------------------------------------------------------
# family kernels (same constants + operation order as crs.py)
# ---------------------------------------------------------------------------

def _q_np(e, e2):
    if e == 0:
        return lambda phi: 2.0 * np.sin(phi)

    def q(phi):
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * np.log(
                               (1 - e * s) / (1 + e * s)))
    return q


def _beta_to_phi_np(beta, e2):
    return (beta
            + (e2 / 3 + 31 * e2 ** 2 / 180 + 517 * e2 ** 3 / 5040)
            * np.sin(2 * beta)
            + (23 * e2 ** 2 / 360 + 251 * e2 ** 3 / 3780)
            * np.sin(4 * beta)
            + (761 * e2 ** 3 / 45360) * np.sin(6 * beta))


def _wrap_lon_np(lon):
    w = (lon + 180.0) % 360.0 - 180.0
    return np.where((w == -180.0) & (lon > 0), 180.0, w)


def _make_lcc2_np(ellps, lat0, lon0, sp1, sp2, fe, fn, k0=1.0):
    a = ellps[0]
    e, n, big_f, rho0, _t = C._lcc_consts(*ellps, lat0, sp1, sp2)
    big_f *= k0
    rho0 *= k0

    def t_np(phi):
        s = np.sin(phi)
        return (np.tan(np.pi / 4 - phi / 2)
                / ((1 - e * s) / (1 + e * s)) ** (e / 2))

    def fwd(lon, lat):
        phi = np.radians(lat)
        theta = n * np.radians(np.asarray(lon, np.float64) - lon0)
        rho = a * big_f * t_np(phi) ** n
        return fe + rho * np.sin(theta), \
            fn + rho0 - rho * np.cos(theta)

    def inv(e_crd, n_crd):
        x = np.asarray(e_crd, np.float64) - fe
        y = rho0 - (np.asarray(n_crd, np.float64) - fn)
        rho = np.copysign(np.hypot(x, y), n)
        theta = np.arctan2(x, y) if n > 0 else np.arctan2(-x, -y)
        lon = np.degrees(theta / n) + lon0
        tp = (rho / (a * big_f)) ** (1 / n)
        phi = np.pi / 2 - 2 * np.arctan(tp)
        for _ in range(8):
            s = np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                tp * ((1 - e * s) / (1 + e * s)) ** (e / 2))
        return lon, np.degrees(phi)

    return fwd, inv


def _make_laea_np(ellps, lat0, lon0, fe, fn):
    if abs(lat0) >= 89.999999:
        return _make_laea_polar_np(ellps, lat0 > 0, lon0, fe, fn)
    e, e2, _q, qp, beta0, rq, d = C._laea_consts(*ellps, lat0)
    q = _q_np(e, e2)

    def fwd(lon, lat):
        phi = np.radians(lat)
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        beta = np.arcsin(q(phi) / qp)
        b = rq * np.sqrt(
            2 / (1 + math.sin(beta0) * np.sin(beta)
                 + math.cos(beta0) * np.cos(beta) * np.cos(lam)))
        return (fe + b * d * np.cos(beta) * np.sin(lam),
                fn + (b / d) * (math.cos(beta0) * np.sin(beta)
                                - math.sin(beta0) * np.cos(beta)
                                * np.cos(lam)))

    def inv(e_crd, n_crd):
        x = np.asarray(e_crd, np.float64) - fe
        y = np.asarray(n_crd, np.float64) - fn
        rho = np.hypot(x / d, d * y)
        rho_safe = np.where(rho == 0, 1.0, rho)
        ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1.0, 1.0))
        beta = np.arcsin(np.clip(
            np.cos(ce) * math.sin(beta0)
            + (d * y * np.sin(ce) * math.cos(beta0)) / rho_safe,
            -1.0, 1.0))
        lam = np.arctan2(
            (x / d) * np.sin(ce),
            rho * math.cos(beta0) * np.cos(ce)
            - d * y * math.sin(beta0) * np.sin(ce))
        lon = _wrap_lon_np(lon0 + np.degrees(lam))
        lat = np.degrees(_beta_to_phi_np(beta, e2))
        return (np.where(rho == 0, lon0, lon),
                np.where(rho == 0, lat0, lat))

    return fwd, inv


def _make_laea_polar_np(ellps, north, lon0, fe, fn):
    a, f = ellps
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    q = _q_np(e, e2)
    qp = float(q(np.pi / 2))

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        qv = q(np.radians(lat))
        if north:
            rho = a * np.sqrt(np.maximum(qp - qv, 0.0))
            return fe + rho * np.sin(lam), fn - rho * np.cos(lam)
        rho = a * np.sqrt(np.maximum(qp + qv, 0.0))
        return fe + rho * np.sin(lam), fn + rho * np.cos(lam)

    def inv(e_crd, n_crd):
        x = np.asarray(e_crd, np.float64) - fe
        y = np.asarray(n_crd, np.float64) - fn
        rho = np.hypot(x, y)
        if north:
            qv = qp - (rho / a) ** 2
            lam = np.arctan2(x, -y)
        else:
            qv = (rho / a) ** 2 - qp
            lam = np.arctan2(x, y)
        beta = np.arcsin(np.clip(qv / qp, -1.0, 1.0))
        lon = _wrap_lon_np(lon0 + np.degrees(lam))
        lat = np.degrees(_beta_to_phi_np(beta, e2))
        pole = 90.0 if north else -90.0
        return (np.where(rho == 0, lon0, lon),
                np.where(rho == 0, pole, lat))

    return fwd, inv


def _make_sterea_np(ellps, lat0, lon0, k0, fe, fn):
    a, f = ellps
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi0 = math.radians(lat0)
    lam0 = math.radians(lon0)
    s0 = math.sin(phi0)
    R = (a * math.sqrt(1 - e2)) / (1 - e2 * s0 * s0)
    n = math.sqrt(1 + (e2 * math.cos(phi0) ** 4) / (1 - e2))
    w1 = (((1 + s0) / (1 - s0))
          * ((1 - e * s0) / (1 + e * s0)) ** e) ** n
    chi0_prov = math.asin((w1 - 1) / (w1 + 1))
    c = ((n + s0) * (1 - math.sin(chi0_prov))
         / ((n - s0) * (1 + math.sin(chi0_prov))))
    w2 = c * w1
    chi0 = math.asin((w2 - 1) / (w2 + 1))

    def fwd(lon, lat):
        phi = np.radians(lat)
        lam = np.radians(np.asarray(lon, np.float64))
        s = np.sin(phi)
        big_l = n * (lam - lam0)
        w = c * (((1 + s) / (1 - s))
                 * ((1 - e * s) / (1 + e * s)) ** e) ** n
        chi = np.arcsin((w - 1) / (w + 1))
        big_b = (1 + np.sin(chi) * math.sin(chi0)
                 + np.cos(chi) * math.cos(chi0) * np.cos(big_l))
        return (fe + 2 * R * k0 * np.cos(chi) * np.sin(big_l) / big_b,
                fn + 2 * R * k0 * (np.sin(chi) * math.cos(chi0)
                                   - np.cos(chi) * math.sin(chi0)
                                   * np.cos(big_l)) / big_b)

    def inv(e_crd, n_crd):
        g = 2 * R * k0 * math.tan(math.pi / 4 - chi0 / 2)
        h = 4 * R * k0 * math.tan(chi0) + g
        x = np.asarray(e_crd, np.float64) - fe
        y = np.asarray(n_crd, np.float64) - fn
        i = np.arctan2(x, h + y)
        j = np.arctan2(x, g - y) - i
        chi = chi0 + 2 * np.arctan2(y - x * np.tan(j / 2), 2 * R * k0)
        big_l = j + 2 * i
        lam = big_l / n + lam0
        psi = 0.5 * np.log((1 + np.sin(chi))
                           / (c * (1 - np.sin(chi)))) / n
        phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
        for _ in range(10):
            s = e * np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + np.pi / 4)
                           * ((1 - s) / (1 + s)) ** (e / 2))
            phi = phi - (psi_i - psi) * np.cos(phi) * (
                1 - s * s) / (1 - e2)
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _make_ps_np(ellps, lat_ts, lon0, fe, fn, k0=None):
    a, f = ellps
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    south = lat_ts < 0

    def t_of(phi):
        s = np.sin(phi)
        return (np.tan(np.pi / 4 - phi / 2)
                / ((1 - e * s) / (1 + e * s)) ** (e / 2))

    if k0 is not None and abs(lat_ts) == 90.0:
        m_f = 2.0 * k0 / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        t_f = 1.0
    else:
        phi_f = math.radians(abs(lat_ts))
        m_f = math.cos(phi_f) / math.sqrt(1 - e2 * math.sin(phi_f) ** 2)
        t_f = float(t_of(np.float64(phi_f)))

    def _phi_of_tp(tp):
        phi = np.pi / 2 - 2 * np.arctan(tp)
        for _ in range(8):
            s = np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                tp * ((1 - e * s) / (1 + e * s)) ** (e / 2))
        return phi

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        phi = np.radians(lat)
        if south:
            rho = a * m_f * t_of(-phi) / t_f
            return fe + rho * np.sin(lam), fn + rho * np.cos(lam)
        rho = a * m_f * t_of(phi) / t_f
        return fe + rho * np.sin(lam), fn - rho * np.cos(lam)

    def inv(e_crd, n_crd):
        x = np.asarray(e_crd, np.float64) - fe
        y = np.asarray(n_crd, np.float64) - fn
        rho = np.hypot(x, y)
        tp = rho * t_f / (a * m_f)
        if south:
            lam = np.arctan2(x, y)
            lat = -np.degrees(_phi_of_tp(tp))
        else:
            lam = np.arctan2(x, -y)
            lat = np.degrees(_phi_of_tp(tp))
        lon = _wrap_lon_np(lon0 + np.degrees(lam))
        pole = -90.0 if south else 90.0
        return (np.where(rho == 0, lon0, lon),
                np.where(rho == 0, pole, lat))

    return fwd, inv


def _make_cea_np(ellps, lat_ts, lon0, fe, fn):
    a, f = ellps
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi1 = math.radians(lat_ts)
    q = _q_np(e, e2)
    qp = float(q(np.pi / 2))
    k0 = math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) ** 2)

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        return (fe + a * k0 * lam,
                fn + a * q(np.radians(lat)) / (2 * k0))

    def inv(e_crd, n_crd):
        qv = 2 * (np.asarray(n_crd, np.float64) - fn) * k0 / a
        beta = np.arcsin(np.clip(qv / qp, -1.0, 1.0))
        phi = _beta_to_phi_np(beta, e2)
        lam = (np.asarray(e_crd, np.float64) - fe) / (a * k0)
        return lon0 + np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _make_aea_np(ellps, lat0, lon0, sp1, sp2, fe, fn):
    a = ellps[0]
    e, e2, _q, n, big_c, rho0, qp = C._aea_consts(a, ellps[1],
                                                  lat0, lon0, sp1, sp2)
    q = _q_np(e, e2)

    def fwd(lon, lat):
        phi = np.radians(lat)
        theta = n * np.radians(np.asarray(lon, np.float64) - lon0)
        rho = a * np.sqrt(big_c - n * q(phi)) / n
        return fe + rho * np.sin(theta), \
            fn + rho0 - rho * np.cos(theta)

    def inv(x, y):
        dx = np.asarray(x, np.float64) - fe
        dy = rho0 - (np.asarray(y, np.float64) - fn)
        rho = np.hypot(dx, dy)
        theta = np.arctan2(dx, dy) if n > 0 else np.arctan2(-dx, -dy)
        qq = (big_c - (rho * n / a) ** 2) / n
        beta = np.arcsin(np.clip(qq / qp, -1.0, 1.0))
        return (lon0 + np.degrees(theta / n),
                np.degrees(_beta_to_phi_np(beta, e2)))

    return fwd, inv


def _make_merc_np(ellps, lon0, k0, fe, fn, spherical=False):
    a, f = ellps
    if spherical or f == 0.0:
        def fwd(lon, lat):
            return (fe + a * k0 * np.radians(
                np.asarray(lon, np.float64) - lon0),
                fn + a * k0 * np.log(
                    np.tan(np.pi / 4 + np.radians(lat) / 2)))

        def inv(e_crd, n_crd):
            lon = lon0 + np.degrees(
                (np.asarray(e_crd, np.float64) - fe) / (a * k0))
            lat = np.degrees(
                2 * np.arctan(np.exp(
                    (np.asarray(n_crd, np.float64) - fn) / (a * k0)))
                - np.pi / 2)
            return lon, lat

        return fwd, inv

    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def fwd(lon, lat):
        phi = np.radians(lat)
        s = e * np.sin(phi)
        return (fe + a * k0 * np.radians(
            np.asarray(lon, np.float64) - lon0),
            fn + a * k0 * np.log(
                np.tan(np.pi / 4 + phi / 2)
                * ((1 - s) / (1 + s)) ** (e / 2)))

    def inv(e_crd, n_crd):
        lon = lon0 + np.degrees(
            (np.asarray(e_crd, np.float64) - fe) / (a * k0))
        tp = np.exp(-(np.asarray(n_crd, np.float64) - fn) / (a * k0))
        phi = np.pi / 2 - 2 * np.arctan(tp)
        for _ in range(8):
            s = np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                tp * ((1 - e * s) / (1 + e * s)) ** (e / 2))
        return lon, np.degrees(phi)

    return fwd, inv


_FAMILIES_NP = {"lcc2": _make_lcc2_np, "laea": _make_laea_np,
                "sterea": _make_sterea_np, "ps": _make_ps_np,
                "cea": _make_cea_np, "aea": _make_aea_np,
                "merc": _make_merc_np}


def _make_tm_np(ellps, lat0, lon0, k0, fe, fn):
    consts = C._tm_consts(*ellps)
    y0 = C._tm_forward(lon0, lat0, lon0, consts)[1] if lat0 else 0.0

    def fwd(lon, lat):
        x, y = C._tm_forward_np(lon, lat, lon0, consts)
        return fe + k0 * x, fn + k0 * (y - y0)

    def inv(e_crd, n_crd):
        return C._tm_inverse_np(
            (np.asarray(e_crd, np.float64) - fe) / k0,
            (np.asarray(n_crd, np.float64) - fn) / k0 + y0,
            lon0, consts)

    return fwd, inv


_PAIR_NP_CACHE: dict[int, tuple] = {}


def pair_np(srid: int):
    """(fwd_np, inv_np) array kernels for a table srid, else None.
    Covers EVERY ``_CRS_TABLE`` family (the module bottom registers
    Krovak/HOM/sinu/moll/eqc too), including datum-shifted grids
    (vectorized Helmert)."""
    if srid in _PAIR_NP_CACHE:
        return _PAIR_NP_CACHE[srid]
    entry = C._CRS_TABLE.get(srid)
    if entry is None:
        return None
    family, ellps, params, helmert = entry
    params = dict(params)
    to_m = params.pop("to_m", None)    # axis unit (e.g. ftUS), see
    if family == "tm":                 # crs._pair
        fwd, inv = _make_tm_np(ellps, **params)
    elif family in _FAMILIES_NP:
        fwd, inv = _FAMILIES_NP[family](ellps, **params)
    else:
        return None
    if helmert is not None:
        fwd, inv = _with_datum_np(fwd, inv, ellps, helmert)
    if to_m is not None:
        fwd_m, inv_m = fwd, inv

        def fwd(lon, lat, _f=fwd_m, _u=to_m):
            x, y = _f(lon, lat)
            return x / _u, y / _u

        def inv(x, y, _i=inv_m, _u=to_m):
            import numpy as _np
            return _i(_np.asarray(x) * _u, _np.asarray(y) * _u)

    _PAIR_NP_CACHE[srid] = (fwd, inv)
    return fwd, inv


def _make_homvb_np(ellps, lat_c, lon_c, alpha_c, gamma_c, k_c, fe, fn,
                   natural_origin=False):
    a, f = ellps
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi_c = math.radians(lat_c)
    lam_c = math.radians(lon_c)
    alpha = math.radians(alpha_c)
    gamma = math.radians(gamma_c)
    sgn = 1.0 if lat_c >= 0 else -1.0
    B = math.sqrt(1 + e2 * math.cos(phi_c) ** 4 / (1 - e2))
    A = (a * B * k_c * math.sqrt(1 - e2)
         / (1 - e2 * math.sin(phi_c) ** 2))
    s0 = math.sin(phi_c)
    t0 = (math.tan(math.pi / 4 - phi_c / 2)
          / ((1 - e * s0) / (1 + e * s0)) ** (e / 2))
    D = (B * math.sqrt(1 - e2)
         / (math.cos(phi_c) * math.sqrt(1 - e2 * s0 * s0)))
    big_f = D + math.sqrt(max(D * D - 1.0, 0.0)) * sgn
    H = big_f * t0 ** B
    G = (big_f - 1.0 / big_f) / 2.0
    gamma0 = math.asin(math.sin(alpha) / D)
    lam0 = lam_c - math.asin(G * math.tan(gamma0)) / B
    if abs(alpha_c - 90.0) < 1e-12:
        uc = A * (lam_c - lam0)
    else:
        uc = ((A / B) * math.atan2(math.sqrt(max(D * D - 1.0, 0.0)),
                                   math.cos(alpha)) * sgn)
    if natural_origin:
        uc = 0.0

    def fwd(lon, lat):
        phi = np.radians(lat)
        lam = np.radians(np.asarray(lon, np.float64))
        s = np.sin(phi)
        t = (np.tan(np.pi / 4 - phi / 2)
             / ((1 - e * s) / (1 + e * s)) ** (e / 2))
        Q = H / t ** B
        S = (Q - 1.0 / Q) / 2.0
        V = np.sin(B * (lam - lam0))
        U = (-V * math.cos(gamma0) + S * math.sin(gamma0)) \
            / ((Q + 1.0 / Q) / 2.0)
        v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
        u = (A * np.arctan2(
            S * math.cos(gamma0) + V * math.sin(gamma0),
            np.cos(B * (lam - lam0))) / B) - abs(uc) * sgn
        return (fe + v * math.cos(gamma) + u * math.sin(gamma),
                fn + u * math.cos(gamma) - v * math.sin(gamma))

    def inv(e_crd, n_crd):
        x = np.asarray(e_crd, np.float64) - fe
        y = np.asarray(n_crd, np.float64) - fn
        dv = x * math.cos(gamma) - y * math.sin(gamma)
        du = (y * math.cos(gamma) + x * math.sin(gamma)) \
            + abs(uc) * sgn
        Q = np.exp(-B * dv / A)
        S = (Q - 1.0 / Q) / 2.0
        V = np.sin(B * du / A)
        U = (V * math.cos(gamma0) + S * math.sin(gamma0)) \
            / ((Q + 1.0 / Q) / 2.0)
        tp = (H / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
        phi = np.pi / 2 - 2 * np.arctan(tp)
        for _ in range(10):
            s = np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                tp * ((1 - e * s) / (1 + e * s)) ** (e / 2))
        lam = lam0 - np.arctan2(
            S * math.cos(gamma0) - V * math.sin(gamma0),
            np.cos(B * du / A)) / B
        return np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _make_krovak_np(ellps, lat_c, lon0, alpha_c, lat_p, k_p, fe, fn):
    a, f = ellps
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi_c = math.radians(lat_c)
    alpha = math.radians(alpha_c)
    phi_p = math.radians(lat_p)
    A = a * math.sqrt(1 - e2) / (1 - e2 * math.sin(phi_c) ** 2)
    B = math.sqrt(1 + e2 * math.cos(phi_c) ** 4 / (1 - e2))
    gamma0 = math.asin(math.sin(phi_c) / B)
    t0 = (math.tan(math.pi / 4 + gamma0 / 2)
          * ((1 + e * math.sin(phi_c)) / (1 - e * math.sin(phi_c)))
          ** (e * B / 2)
          / math.tan(math.pi / 4 + phi_c / 2) ** B)
    n = math.sin(phi_p)
    r0 = k_p * A / math.tan(phi_p)

    def fwd(lon, lat):
        phi = np.radians(lat)
        s = np.sin(phi)
        U = 2 * (np.arctan(
            t0 * np.tan(phi / 2 + np.pi / 4) ** B
            / ((1 + e * s) / (1 - e * s)) ** (e * B / 2)) - np.pi / 4)
        V = B * np.radians(lon0 - np.asarray(lon, np.float64))
        T = np.arcsin(math.cos(alpha) * np.sin(U)
                      + math.sin(alpha) * np.cos(U) * np.cos(V))
        D = np.arcsin(np.cos(U) * np.sin(V) / np.cos(T))
        theta = n * D
        r = (r0 * math.tan(math.pi / 4 + phi_p / 2) ** n
             / np.tan(T / 2 + np.pi / 4) ** n)
        x_south = r * np.cos(theta)
        y_west = r * np.sin(theta)
        return fe - y_west, fn - x_south

    def inv(e_crd, n_crd):
        y_west = fe - np.asarray(e_crd, np.float64)
        x_south = fn - np.asarray(n_crd, np.float64)
        r = np.hypot(x_south, y_west)
        theta = np.arctan2(y_west, x_south)
        D = theta / n
        T = 2 * (np.arctan(
            (r0 / r) ** (1 / n) * math.tan(math.pi / 4 + phi_p / 2))
            - np.pi / 4)
        U = np.arcsin(math.cos(alpha) * np.sin(T)
                      - math.sin(alpha) * np.cos(T) * np.cos(D))
        V = np.arcsin(np.cos(T) * np.sin(D) / np.cos(U))
        phi = U.copy() if hasattr(U, "copy") else U
        for _ in range(10):
            s = np.sin(phi)
            phi = 2 * (np.arctan(
                (np.tan(U / 2 + np.pi / 4) / t0) ** (1 / B)
                * ((1 + e * s) / (1 - e * s)) ** (e / 2)) - np.pi / 4)
        lon = lon0 - np.degrees(V / B)
        return lon, np.degrees(phi)

    return fwd, inv


def _make_sinu_np(ellps, lon0, fe, fn):
    a, f = ellps
    e2 = f * (2 - f)
    e4, e6 = e2 * e2, e2 * e2 * e2
    c0 = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    c2 = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
    c4 = 15 * e4 / 256 + 45 * e6 / 1024
    c6 = 35 * e6 / 3072
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    d2 = 3 * e1 / 2 - 27 * e1 ** 3 / 32
    d4 = 21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32
    d6 = 151 * e1 ** 3 / 96
    d8 = 1097 * e1 ** 4 / 512

    def m_of(phi):
        return a * (c0 * phi - c2 * np.sin(2 * phi)
                    + c4 * np.sin(4 * phi) - c6 * np.sin(6 * phi))

    def fwd(lon, lat):
        phi = np.radians(lat)
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        s = np.sin(phi)
        x = a * lam * np.cos(phi) / np.sqrt(1 - e2 * s * s)
        return fe + x, fn + m_of(phi)

    def inv(e_crd, n_crd):
        m = np.asarray(n_crd, np.float64) - fn
        mu = m / (a * c0)
        phi = (mu + d2 * np.sin(2 * mu) + d4 * np.sin(4 * mu)
               + d6 * np.sin(6 * mu) + d8 * np.sin(8 * mu))
        for _ in range(2):
            s2 = np.sin(phi) ** 2
            dm = a * (1 - e2) / (1 - e2 * s2) ** 1.5
            phi = phi - (m_of(phi) - m) / dm
        s = np.sin(phi)
        denom = a * np.cos(phi) / np.sqrt(1 - e2 * s * s)
        denom_safe = np.where(denom == 0, 1.0, denom)
        lam = np.where(denom == 0, 0.0,
                       (np.asarray(e_crd, np.float64) - fe)
                       / denom_safe)
        return lon0 + np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _make_moll_np(ellps, lon0, fe, fn):
    R = ellps[0]
    SQ2 = math.sqrt(2.0)

    def fwd(lon, lat):
        phi = np.radians(lat)
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        th = phi.copy() if hasattr(phi, "copy") else np.asarray(
            phi, np.float64)
        th = np.asarray(th, np.float64)
        target = np.pi * np.sin(phi)
        for _ in range(50):
            den = 2.0 + 2.0 * np.cos(2.0 * th)
            den_safe = np.where(den < 1e-14, 1.0, den)
            d = np.where(den < 1e-14, 0.0,
                         (2.0 * th + np.sin(2.0 * th) - target)
                         / den_safe)
            th = th - d
        pole = np.abs(phi) >= np.pi / 2 - 1e-12
        th = np.where(pole, np.copysign(np.pi / 2, phi), th)
        return (fe + R * (2.0 * SQ2 / np.pi) * lam * np.cos(th),
                fn + R * SQ2 * np.sin(th))

    def inv(e_crd, n_crd):
        th = np.arcsin(np.clip(
            (np.asarray(n_crd, np.float64) - fn) / (R * SQ2),
            -1.0, 1.0))
        phi = np.arcsin(np.clip(
            (2.0 * th + np.sin(2.0 * th)) / np.pi, -1.0, 1.0))
        c = np.cos(th)
        c_safe = np.where(np.abs(c) < 1e-12, 1.0, c)
        lam = np.where(np.abs(c) < 1e-12, 0.0,
                       (np.asarray(e_crd, np.float64) - fe) * np.pi
                       / (2.0 * R * SQ2 * c_safe))
        return lon0 + np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _make_eqc_np(ellps, lat_ts, lat0, lon0, fe, fn):
    a, f = ellps
    e2 = f * (2 - f)
    phi_ts = math.radians(lat_ts)
    nu_ts = (a * math.cos(phi_ts)
             / math.sqrt(1 - e2 * math.sin(phi_ts) ** 2))
    if e2 == 0.0:
        def fwd(lon, lat):
            return (fe + nu_ts * np.radians(
                np.asarray(lon, np.float64) - lon0),
                fn + a * np.radians(np.asarray(lat, np.float64)
                                    - lat0))

        def inv(x, y):
            return (lon0 + np.degrees(
                (np.asarray(x, np.float64) - fe) / nu_ts),
                lat0 + np.degrees(
                    (np.asarray(y, np.float64) - fn) / a))

        return fwd, inv
    sin_fwd, sin_inv = _make_sinu_np(ellps, lon0, 0.0, 0.0)
    m0 = float(np.asarray(sin_fwd(lon0, lat0)[1]))

    def fwd(lon, lat):
        _, m = sin_fwd(np.full_like(np.asarray(lat, np.float64),
                                    lon0), lat)
        return (fe + nu_ts * np.radians(
            np.asarray(lon, np.float64) - lon0), fn + m - m0)

    def inv(x, y):
        lat = sin_inv(0.0, (np.asarray(y, np.float64) - fn) + m0)[1]
        return lon0 + np.degrees(
            (np.asarray(x, np.float64) - fe) / nu_ts), lat

    return fwd, inv


_FAMILIES_NP.update({"homvb": _make_homvb_np,
                     "krovak": _make_krovak_np,
                     "sinu": _make_sinu_np,
                     "moll": _make_moll_np,
                     "eqc": _make_eqc_np})
