"""WKT1 CRS parser → closed-form transform pairs.

The reference reprojects any OGR-known SRS by shelling out to
GDAL/PROJ (ref ingest/processing.py:142-150, ``-t_srs``); PROJ
resolves the source CRS from the dataset's embedded WKT (.prj
sidecars, ``gpkg_spatial_ref_sys.definition``, FileGDB spatial-ref
blocks).  This module does the same resolution without PROJ: it
parses the OGC 01-009 / ESRI WKT1 text and instantiates the matching
closed-form projection family from ``operators/crs.py`` — so ANY
Transverse Mercator / Lambert Conformal Conic (1SP+2SP) / Albers /
Lambert Azimuthal / Polar Stereographic (A+B) / Mercator (1SP, 2SP,
auxiliary-sphere) / Hotine Oblique Mercator (variant A natural-origin
AND variant B azimuth-center) / Oblique Stereographic / Krovak CRS
reprojects from its WKT, not just the EPSG codes in the built-in
table.

Handled per the WKT1 spec:

* ``SPHEROID[name, a, 1/f]`` — any ellipsoid (1/f = 0 → sphere);
* ``TOWGS84[dx,dy,dz,rx,ry,rz,ds]`` — 3/7-parameter position-vector
  datum shift (EPSG 9606), routed through the ECEF Helmert path;
* ``PRIMEM[name, lon]`` — non-Greenwich prime meridians (Ferro,
  Paris) shift the central meridian;
* ``UNIT`` — projected CRSs in feet / US survey feet / links work:
  false eastings and output coordinates honour the linear unit
  factor; PARAMETER angles honour the geographic angular unit
  (degree / grad);
* ``GEOGCS``-rooted WKT — identity on (lon, lat) plus the datum
  shift if a TOWGS84 is present.

Family coverage matches GDAL's WKT1 PROJECTION names plus the common
ESRI aliases.  All projection math lives in ``operators/crs.py`` and
is pinned by published IOGP GN7-2 worked examples in
``tests/test_crs.py``; this module only parses and dispatches, so it
is plain stdlib and safe inside Arrow-batched executor kernels.
"""

from __future__ import annotations

import math

from geohub_data_pipeline_spark.operators.crs import (
    _make_aea,
    _make_homvb,
    _make_krovak,
    _make_laea,
    _make_lcc2,
    _make_merc,
    _make_ps,
    _make_sterea,
    _make_tm,
    _with_datum,
    merc_2sp_k0,
)

_DEG_PER_RAD = 180.0 / math.pi


# ---------------------------------------------------------------------------
# WKT1 tokenizer + recursive-descent parser
# ---------------------------------------------------------------------------

class Node:
    """One WKT node: ``NAME[v, v, ...]`` — values are str, float, or
    child Nodes."""

    __slots__ = ("name", "values")

    def __init__(self, name: str, values: list):
        self.name = name
        self.values = values

    def children(self, name: str) -> list["Node"]:
        up = name.upper()
        return [v for v in self.values
                if isinstance(v, Node) and v.name.upper() == up]

    def child(self, name: str) -> "Node | None":
        found = self.children(name)
        return found[0] if found else None


def parse_wkt(text: str) -> Node:
    """Parse a WKT1 string into a Node tree.  Accepts ``[]`` or
    ``()`` brackets and arbitrary whitespace (both appear in the
    wild)."""
    s = text
    n = len(s)
    pos = 0

    def skip_ws():
        nonlocal pos
        while pos < n and s[pos] in " \t\r\n":
            pos += 1

    def parse_value():
        nonlocal pos
        skip_ws()
        if pos >= n:
            raise ValueError("wkt: unexpected end of input")
        ch = s[pos]
        if ch == '"':
            end = s.index('"', pos + 1)
            out = s[pos + 1:end]
            pos = end + 1
            return out
        # bare token: identifier (possibly a node) or number
        start = pos
        while pos < n and s[pos] not in '[](),"':
            pos += 1
        tok = s[start:pos].strip()
        skip_ws()
        if pos < n and s[pos] in "[(":
            open_ch = s[pos]
            close_ch = "]" if open_ch == "[" else ")"
            pos += 1
            values = []
            skip_ws()
            if pos < n and s[pos] == close_ch:
                pos += 1
                return Node(tok, values)
            while True:
                values.append(parse_value())
                skip_ws()
                if pos < n and s[pos] == ",":
                    pos += 1
                    continue
                if pos < n and s[pos] == close_ch:
                    pos += 1
                    return Node(tok, values)
                raise ValueError(f"wkt: expected ',' or '{close_ch}' "
                                 f"at offset {pos}")
        try:
            return float(tok)
        except ValueError:
            return tok       # bare keyword (e.g. axis direction NORTH)

    root = parse_value()
    if not isinstance(root, Node):
        raise ValueError("wkt: input is not a WKT node")
    return root


# ---------------------------------------------------------------------------
# Parameter extraction
# ---------------------------------------------------------------------------

def _params_of(projcs: Node) -> dict[str, float]:
    out = {}
    for p in projcs.children("PARAMETER"):
        if len(p.values) >= 2 and isinstance(p.values[0], str):
            try:
                out[p.values[0].strip().lower()] = float(p.values[1])
            except (TypeError, ValueError):
                continue
    return out


def _unit_factor(node: Node, default: float) -> float:
    """The UNIT conversion factor directly under ``node`` (linear for
    PROJCS — meters per unit; angular for GEOGCS — radians per
    unit)."""
    u = node.child("UNIT")
    if u is None or len(u.values) < 2:
        return default
    try:
        return float(u.values[1])
    except (TypeError, ValueError):
        return default


def _spheroid(geogcs: Node) -> tuple[float, float]:
    datum = geogcs.child("DATUM")
    sph = (datum.child("SPHEROID") or datum.child("ELLIPSOID")) \
        if datum else None
    if sph is None or len(sph.values) < 3:
        raise ValueError("wkt: no SPHEROID")
    a = float(sph.values[1])
    rf = float(sph.values[2])
    f = 0.0 if rf == 0.0 else 1.0 / rf
    return a, f


# datum name -> datum->WGS84 position-vector params [dx dy dz rx ry
# rz ds] for the common datums whose ESRI .prj files carry NO TOWGS84
# clause (ESRI resolves them from its own datum database; the values
# are the published EPSG single-transform defaults, the same ones
# PROJ's datum tables apply).  Names normalized via _norm().
_DATUM_SHIFTS: dict[str, tuple] = {
    # OSGB 1936 (OS "A guide to coordinate systems in GB")
    "osgb1936": (446.448, -125.157, 542.06, 0.15, 0.247, 0.842,
                 -20.489),
    "dosgb1936": (446.448, -125.157, 542.06, 0.15, 0.247, 0.842,
                  -20.489),
    "ordnancesurveyofgreatbritain1936": (
        446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489),
    # TM65 / TM75 (EPSG:1953)
    "tm65": (482.5, -130.596, 564.557, -1.042, -0.214, -0.631, 8.15),
    "tm75": (482.5, -130.596, 564.557, -1.042, -0.214, -0.631, 8.15),
    # S-JTSK (EPSG:1623)
    "sjtsk": (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0),
    "systemjednotnetrigonometrickesitekatastralni": (
        589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0),
    # Amersfoort (EPSG:15934-era default, RDNAPTRANS-compatible)
    "amersfoort": (565.417, 50.3319, 465.552, -0.398957, 0.343988,
                   -1.8774, 4.0725),
    "damersfoort": (565.417, 50.3319, 465.552, -0.398957, 0.343988,
                    -1.8774, 4.0725),
    # CH1903+ (EPSG:1676, geocentric translations)
    "ch1903": (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0),
    "dch1903": (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0),
    # NTF / NTF (Paris) (EPSG:1193)
    "ntf": (-168.0, -60.0, 320.0, 0.0, 0.0, 0.0, 0.0),
    "nouvelletriangulationfrancaise": (-168.0, -60.0, 320.0,
                                       0.0, 0.0, 0.0, 0.0),
    # DHDN / Potsdam (EPSG:1777)
    "dhdn": (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7),
    "deutscheshauptdreiecksnetz": (598.1, 73.7, 418.2, 0.202, 0.045,
                                   -2.455, 6.7),
    "potsdam": (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7),
}


def _towgs84(geogcs: Node) -> tuple | None:
    """WGS84->datum Helmert params in crs.py order
    (tx, ty, tz, s_ppm, rx, ry, rz), or None if absent/zero.

    WKT1 TOWGS84 is the datum->WGS84 position-vector transform
    ``[dx, dy, dz, rx, ry, rz, ds]`` (EPSG 9606); negating every
    parameter gives the WGS84->datum direction to first order (the
    convention ``_CRS_TABLE`` stores).  When the clause is absent —
    every ESRI .prj — the DATUM name is looked up in the published
    defaults (``_DATUM_SHIFTS``), the same resolution GDAL/PROJ give
    the reference."""
    datum = geogcs.child("DATUM")
    t = datum.child("TOWGS84") if datum else None
    if t is None:
        t = geogcs.child("TOWGS84")
    if t is None:
        if datum is not None and datum.values \
                and isinstance(datum.values[0], str):
            name = _norm(datum.values[0])
            shift = _DATUM_SHIFTS.get(name) \
                or _DATUM_SHIFTS.get(name.removeprefix("d"))
            if shift is not None:
                dx, dy, dz, rx, ry, rz, ds = shift
                return (-dx, -dy, -dz, -ds, -rx, -ry, -rz)
        return None
    vals = [float(v) for v in t.values if isinstance(v, (int, float))]
    vals += [0.0] * (7 - len(vals))
    dx, dy, dz, rx, ry, rz, ds = vals[:7]
    if not any(vals[:7]):
        return None
    return (-dx, -dy, -dz, -ds, -rx, -ry, -rz)


def _primem_deg(geogcs: Node, ang: float) -> float:
    pm = geogcs.child("PRIMEM")
    if pm is None or len(pm.values) < 2:
        return 0.0
    try:
        return float(pm.values[1]) * ang * _DEG_PER_RAD
    except (TypeError, ValueError):
        return 0.0


def _norm(name: str) -> str:
    return "".join(c for c in name.lower() if c.isalnum())


# ---------------------------------------------------------------------------
# Projection dispatch
# ---------------------------------------------------------------------------

def _get(params, names, default=None):
    for nm in names:
        if nm in params:
            return params[nm]
    return default


_LAT0 = ("latitude_of_origin", "latitude_of_center",
         "latitude_of_natural_origin")
_LON0 = ("central_meridian", "longitude_of_center",
         "longitude_of_natural_origin")
_SP1 = ("standard_parallel_1", "standard_parallel")
_SP2 = ("standard_parallel_2",)
_K0 = ("scale_factor", "scale_factor_at_natural_origin")


def _build_projected(proj_name: str, params: dict, ellps, ang: float,
                     u: float, makers=None):
    """(fwd, inv) in METERS from the projection method name + raw
    PARAMETER dict.  ``ang`` converts angle params to degrees.
    ``makers`` picks the construction backend: None = the scalar
    family table (crs.py); pass ``crs_np`` makers for array
    kernels — the parsing/parameter logic is shared either way."""
    if makers is None:
        from geohub_data_pipeline_spark.operators.crs import _FAMILIES
        makers = _FAMILIES

    def mk(family, **kw):
        return makers[family](ellps, **kw)

    def angle(names, default=0.0):
        v = _get(params, names)
        return default if v is None else v * ang * _DEG_PER_RAD

    def linear(names, default=0.0):
        v = _get(params, names)
        return default if v is None else v * u

    nm = _norm(proj_name)
    lat0 = angle(_LAT0)
    lon0 = angle(_LON0)
    sp1 = _get(params, _SP1)
    sp2 = _get(params, _SP2)
    k0 = _get(params, _K0, 1.0)
    fe = linear(("false_easting",))
    fn = linear(("false_northing",))

    if nm in ("transversemercator", "gausskruger", "gaussboaga",
              "transversemercatorsouthorientated"):
        return mk("tm", lat0=lat0, lon0=lon0, k0=k0, fe=fe, fn=fn)

    if nm.startswith("lambertconformalconic"):
        if sp2 is not None and sp1 is not None and sp1 != sp2:
            return mk("lcc2", lat0=lat0, lon0=lon0,
                      sp1=sp1 * ang * _DEG_PER_RAD,
                      sp2=sp2 * ang * _DEG_PER_RAD, fe=fe, fn=fn)
        # 1SP: standard parallel = latitude of origin, k0 applies
        sp = (sp1 * ang * _DEG_PER_RAD) if sp1 is not None else lat0
        return mk("lcc2", lat0=sp, lon0=lon0, sp1=sp, sp2=sp,
                  fe=fe, fn=fn, k0=k0)

    if nm in ("albersconicequalarea", "albers", "albersequalarea"):
        return mk("aea", lat0=lat0, lon0=lon0, sp1=angle(_SP1),
                  sp2=angle(_SP2), fe=fe, fn=fn)

    if nm == "lambertazimuthalequalarea":
        return mk("laea", lat0=lat0, lon0=lon0, fe=fe, fn=fn)

    if nm in ("polarstereographic", "stereographicnorthpole",
              "stereographicsouthpole",
              "polarstereographicvariantb",
              "polarstereographicvarianta"):
        lat_ts = angle(_SP1 + _LAT0, default=90.0)
        if abs(lat_ts) >= 90.0 - 1e-12:
            # variant A (scale factor at the pole): UPS-style
            return mk("ps", lat_ts=math.copysign(90.0, lat_ts),
                      lon0=lon0, fe=fe, fn=fn, k0=k0)
        return mk("ps", lat_ts=lat_ts, lon0=lon0, fe=fe, fn=fn)

    if nm in ("mercator1sp", "mercator", "mercator2sp",
              "mercatorvarianta", "mercatorvariantb"):
        if sp1 is not None and nm != "mercator1sp":
            k0 = merc_2sp_k0(ellps, sp1 * ang * _DEG_PER_RAD)
        return mk("merc", lon0=lon0, k0=k0, fe=fe, fn=fn)

    if nm == "mercatorauxiliarysphere":
        # ESRI web-Mercator: spherical formulas on the semi-major axis
        return mk("merc", lon0=lon0, k0=k0, fe=fe, fn=fn,
                  spherical=True)

    if nm in ("hotineobliquemercatorazimuthcenter",
              "hotineobliquemercatortwopointcenter",
              "obliquemercator",
              "swissobliquecylindrical", "swissobliquemercator",
              "rectifiedskeworthomorphiccenter"):
        azi = angle(("azimuth", "azimuth_of_initial_line"), 90.0)
        gam = angle(("rectified_grid_angle", "angle_from_rectified_"
                     "to_skew_grid", "xy_plane_rotation"), azi)
        return mk("homvb", lat_c=lat0, lon_c=lon0, alpha_c=azi,
                  gamma_c=gam, k_c=k0, fe=fe, fn=fn)

    if nm in ("hotineobliquemercator",          # GDAL name, EPSG 9812
              "hotineobliquemercatorvarianta",
              "hotineobliquemercatorazimuthnaturalorigin",  # ESRI
              "rectifiedskeworthomorphicnaturalorigin"):
        # variant A: same construction, FE/FN at the NATURAL ORIGIN
        # (u=v=0) instead of the projection center — the common ESRI
        # .prj export (e.g. NAD83 Michigan Oblique Mercator)
        azi = angle(("azimuth", "azimuth_of_initial_line"), 90.0)
        gam = angle(("rectified_grid_angle", "angle_from_rectified_"
                     "to_skew_grid", "xy_plane_rotation"), azi)
        return mk("homvb", lat_c=lat0, lon_c=lon0, alpha_c=azi,
                  gamma_c=gam, k_c=k0, fe=fe, fn=fn,
                  natural_origin=True)

    if nm in ("obliquestereographic", "doublestereographic",
              "stereographic"):
        return mk("sterea", lat0=lat0, lon0=lon0, k0=k0,
                  fe=fe, fn=fn)

    if nm == "sinusoidal":
        return mk("sinu", lon0=lon0, fe=fe, fn=fn)

    if nm in ("cylindricalequalarea", "lambertcylindricalequalarea",
              "lambertcylindricalequalareaspherical", "behrmann"):
        return mk("cea", lat_ts=angle(_SP1, 0.0), lon0=lon0,
                  fe=fe, fn=fn)

    if nm == "mollweide":
        return mk("moll", lon0=lon0, fe=fe, fn=fn)

    if nm in ("equirectangular", "equidistantcylindrical",
              "platecarree", "plate_carree"):
        lat_ts = _get(params, _SP1)
        lat_ts = (lat_ts * ang * _DEG_PER_RAD) if lat_ts is not None \
            else 0.0
        return mk("eqc", lat_ts=lat_ts, lat0=lat0, lon0=lon0,
                  fe=fe, fn=fn)

    if nm == "krovak":
        psp = angle(("pseudo_standard_parallel_1",), 78.5)
        return mk("krovak", lat_c=lat0, lon0=lon0,
                  alpha_c=angle(("azimuth",), 30.28813972222222),
                  lat_p=psp, k_p=k0, fe=fe, fn=fn)

    return None


def pair_from_wkt(wkt: str, use_np: bool = False):
    """(fwd, inv) closures for a WKT1 CRS string, WGS84 (lon, lat)
    degrees on the geographic side and CRS-native units on the
    projected side — or None if the projection method is outside the
    closed-form families.  ``use_np=True`` builds ARRAY kernels
    (operators/crs_np.py makers + vectorized datum ladder) from the
    same parsed parameters; the prime-meridian/unit wrappers below
    are plain arithmetic and work on both.

    Raises ``ValueError`` on malformed WKT (callers treat that the
    same as None under ``-skipfailures``)."""
    if use_np:
        from geohub_data_pipeline_spark.operators import crs_np
        makers = dict(crs_np._FAMILIES_NP)
        makers["tm"] = crs_np._make_tm_np
        with_datum = crs_np._with_datum_np
    else:
        from geohub_data_pipeline_spark.operators.crs import _FAMILIES
        makers = _FAMILIES
        with_datum = _with_datum
    root = parse_wkt(wkt)
    rname = root.name.upper()

    if rname in ("GEOGCS", "GEOGCRS", "GEOGRAPHICCRS"):
        ellps = _spheroid(root)
        ang = _unit_factor(root, math.pi / 180.0)
        helmert = _towgs84(root)
        scale = ang * _DEG_PER_RAD        # units -> degrees
        primem = _primem_deg(root, ang)   # e.g. Paris-referenced lons

        def fwd_g(lon: float, lat: float) -> tuple[float, float]:
            return (lon - primem) / scale, lat / scale

        def inv_g(x: float, y: float) -> tuple[float, float]:
            return x * scale + primem, y * scale

        if helmert is not None:
            # datum-shift the lon/lat through ECEF; identity "grid"
            fwd_d, inv_d = with_datum(
                lambda lon, lat: (lon, lat),
                lambda x, y: (x, y), ellps, helmert)
            return (lambda lon, lat: fwd_g(*fwd_d(lon, lat)),
                    lambda x, y: inv_d(*inv_g(x, y)))
        return fwd_g, inv_g

    if rname != "PROJCS":
        return None

    geogcs = root.child("GEOGCS")
    if geogcs is None:
        raise ValueError("wkt: PROJCS without GEOGCS")
    ellps = _spheroid(geogcs)
    ang = _unit_factor(geogcs, math.pi / 180.0)
    u = _unit_factor(root, 1.0)
    primem = _primem_deg(geogcs, ang)
    proj = root.child("PROJECTION")
    if proj is None or not proj.values:
        raise ValueError("wkt: PROJCS without PROJECTION")
    params = _params_of(root)

    made = _build_projected(str(proj.values[0]), params, ellps, ang,
                            u, makers=makers)
    if made is None:
        return None
    fwd_m, inv_m = made

    if primem != 0.0:
        # PARAMETER longitudes are relative to the prime meridian;
        # shift incoming Greenwich longitudes into that frame
        base_fwd, base_inv = fwd_m, inv_m

        def fwd_m(lon, lat, _f=base_fwd):
            return _f(lon - primem, lat)

        def inv_m(x, y, _i=base_inv):
            lon, lat = _i(x, y)
            return lon + primem, lat

    helmert = _towgs84(geogcs)
    if helmert is not None:
        fwd_m, inv_m = with_datum(fwd_m, inv_m, ellps, helmert)

    if u != 1.0:
        base_fwd2, base_inv2 = fwd_m, inv_m

        def fwd_m(lon, lat, _f=base_fwd2):
            x, y = _f(lon, lat)
            return x / u, y / u

        def inv_m(x, y, _i=base_inv2):
            return _i(x * u, y * u)

    return fwd_m, inv_m


def to_lonlat_wkt(wkt: str, use_np: bool = False):
    """``f(x, y) -> (lon, lat)`` for a WKT1 CRS, else None."""
    try:
        made = pair_from_wkt(wkt, use_np=use_np)
    except (ValueError, IndexError, ZeroDivisionError, AttributeError):
        return None
    return made[1] if made else None


def from_lonlat_wkt(wkt: str):
    """``f(lon, lat) -> (x, y)`` for a WKT1 CRS, else None."""
    try:
        made = pair_from_wkt(wkt)
    except (ValueError, IndexError, ZeroDivisionError, AttributeError):
        return None
    return made[0] if made else None
