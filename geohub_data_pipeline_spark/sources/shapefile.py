"""ESRI Shapefile source — stdlib struct, no GDAL.

Zipped shapefiles are the canonical upload the reference feeds
through ogr2ogr (ref ingest/processing.py:100-213; archive registry
ingest/utils.py:23-32).  The format is fixed-layout binary
(ESRI Shapefile Technical Description, 1998):

* ``.shp``: 100-byte header (big-endian file code 9994, little-endian
  shape type + bbox) then records: (record number, content length)
  big-endian + little-endian shape payload,
* shape payloads: Null(0), Point(1), PolyLine(3), Polygon(5),
  MultiPoint(8) and their Z/M variants (coordinates read, Z/M
  dropped — 2D engine),
* ``.prj``: WKT1 CRS; the EPSG code is recovered from the trailing
  AUTHORITY clause or well-known names.

Polygon records are ring soup (outer rings clockwise by convention,
holes counter-clockwise, order unspecified).  The source emits them
verbatim as a POLYGON with rings in file order and lets
``normalize_features``' makevalid stage do what it already does for
every other source: re-wind, split, and home holes into their
shells — one structure-repair path for all formats.

Scale: one shapefile = one task; members pair up (.shp + .prj) via a
groupBy on the archive key, then rows stream out as Arrow batches.
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "dataset string, layer string, fid long, geometry binary, srid int, "
    "crs_wkt string, properties string"
)

# shape type -> base kind (Z/M variants collapse to the same kind)
_KIND = {1: "point", 11: "point", 21: "point",
         3: "line", 13: "line", 23: "line",
         5: "polygon", 15: "polygon", 25: "polygon",
         8: "multipoint", 18: "multipoint", 28: "multipoint"}


def epsg_from_prj(wkt: str) -> int | None:
    """Best-effort EPSG from a .prj WKT1 string: the LAST AUTHORITY
    clause (the whole-CRS one) or well-known names."""
    codes = re.findall(r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]',
                       wkt, re.IGNORECASE)
    if codes:
        return int(codes[-1])
    low = wkt.lower()
    if "pseudo-mercator" in low or "web_mercator" in low \
            or "web mercator" in low:
        return 3857
    # name heuristics only for geographic-rooted WKT: an ESRI PROJCS
    # named "WGS_1984_UTM_Zone_33N" is NOT 4326 — projected WKT
    # without AUTHORITY resolves via operators/crs_wkt.py instead
    if low.lstrip().startswith("geogcs") and (
            "wgs_1984" in low or "wgs 84" in low or "wgs84" in low):
        return 4326
    return None


def _points(buf: bytes, off: int, n: int) -> list[tuple[float, float]]:
    return [struct.unpack_from("<2d", buf, off + 16 * i) for i in range(n)]


def _parse_record(shape_type: int, buf: bytes):
    """One .shp record payload -> WKB bytes (or None for Null shape)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    kind = _KIND.get(shape_type)
    if shape_type == 0:
        return None
    if kind is None:
        raise ValueError(f"unsupported shape type {shape_type}")
    if kind == "point":
        x, y = struct.unpack_from("<2d", buf, 4)
        return G.wkb_point(x, y)
    if kind == "multipoint":
        (n,) = struct.unpack_from("<i", buf, 36)
        return _multipoint_wkb(_points(buf, 40, n))
    n_parts, n_points = struct.unpack_from("<2i", buf, 36)
    part_idx = [struct.unpack_from("<i", buf, 44 + 4 * i)[0]
                for i in range(n_parts)]
    pts_off = 44 + 4 * n_parts
    pts = _points(buf, pts_off, n_points)
    bounds = part_idx + [n_points]
    parts = [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
    parts = [p for p in parts if len(p) >= 2]
    if not parts:
        raise ValueError("empty geometry parts")
    if kind == "line":
        if len(parts) == 1:
            return G.wkb_linestring(parts[0])
        return _multilinestring_wkb(parts)
    # polygon: rings in file order; normalize_features re-winds and
    # homes holes (shapefile outer=CW / hole=CCW convention)
    rings = [p if p[0] == p[-1] else p + [p[0]] for p in parts]
    return G.wkb_polygon(rings)


def _multipoint_wkb(pts) -> bytes:
    from geohub_data_pipeline_spark.operators import geometry as G
    body = struct.pack("<BII", 1, G.MULTIPOINT, len(pts))
    for x, y in pts:
        body += struct.pack("<BI2d", 1, G.POINT, x, y)
    return body


def _multilinestring_wkb(parts) -> bytes:
    from geohub_data_pipeline_spark.operators import geometry as G
    body = struct.pack("<BII", 1, G.MULTILINESTRING, len(parts))
    for p in parts:
        body += struct.pack("<BII", 1, G.LINESTRING, len(p))
        for x, y in p:
            body += struct.pack("<2d", x, y)
    return body


def read_shp_bytes(shp: bytes, dataset: str, layer: str,
                   srid: int | None):
    """Yield (dataset, layer, fid, wkb, srid) from .shp bytes.

    Unparseable records become NULL-geometry rows (the engine's
    -skipfailures path drops + audits them downstream).
    """
    if len(shp) < 100:
        raise ValueError("truncated shapefile header")
    (file_code,) = struct.unpack_from(">i", shp, 0)
    if file_code != 9994:
        raise ValueError("bad shapefile file code")
    (file_len_words,) = struct.unpack_from(">i", shp, 24)
    end = min(len(shp), file_len_words * 2)
    pos = 100
    while pos + 8 <= end:
        rec_no, content_words = struct.unpack_from(">2i", shp, pos)
        payload = shp[pos + 8:pos + 8 + content_words * 2]
        pos += 8 + content_words * 2
        if len(payload) < 4:
            raise ValueError("truncated record")
        (shape_type,) = struct.unpack_from("<i", payload, 0)
        try:
            wkb = _parse_record(shape_type, payload)
        except (ValueError, struct.error):
            wkb = None                     # -skipfailures row
        yield dataset, layer, int(rec_no), wkb, srid


def shapefile_feature_rows(members: DataFrame) -> DataFrame:
    """Expand ``.shp`` archive members (sources/archive.py member
    schema) into feature rows, pairing each with its sibling ``.prj``
    for the srid.

    Plan: ONE shuffle grouping members by archive (so .shp and .prj
    land together), then pure map-side parsing.
    """
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(members.sparkSession)

    def per_archive(pdf: pd.DataFrame) -> pd.DataFrame:
        import json
        import os
        rows = []
        prjs = {}                  # stem -> (epsg | 0 | None, wkt | None)
        dbfs = {}                  # stem -> [attr dict per record]
        for member, content in zip(pdf["member"], pdf["content"]):
            low = str(member).lower()
            stem = os.path.splitext(str(member))[0]
            if low.endswith(".prj"):
                try:
                    wkt = bytes(content).decode("utf-8", "replace").strip()
                    epsg = epsg_from_prj(wkt)
                    # srid 0 = "EPSG unknown, reproject via the WKT"
                    # (ESRI .prj files usually omit AUTHORITY tags)
                    prjs[stem] = (epsg if epsg is not None else 0,
                                  None if epsg is not None else wkt)
                except Exception:
                    prjs[stem] = (None, None)
            elif low.endswith(".dbf"):
                try:
                    dbfs[stem] = parse_dbf(bytes(content))
                except (ValueError, struct.error):
                    pass           # corrupt sidecar: geometry-only
        for arch, member, content in zip(
                pdf["archive_path"], pdf["member"], pdf["content"]):
            m = str(member)
            if not m.lower().endswith(".shp"):
                continue
            stem = os.path.splitext(m)[0]
            dataset = os.path.basename(str(arch))
            layer = os.path.basename(stem)
            srid, wkt = prjs.get(stem, (4326, None))
            attrs = dbfs.get(stem, [])
            try:
                for r in read_shp_bytes(bytes(content), dataset,
                                        layer, srid):
                    # .shp record numbers are 1-based sequential; the
                    # .dbf record at index rec_no-1 is its attributes
                    rec = (attrs[r[2] - 1]
                           if 0 < r[2] <= len(attrs) else None)
                    pjson = (json.dumps(rec, sort_keys=True,
                                        separators=(",", ":"))
                             if rec else None)
                    rows.append(r + (wkt, pjson))
            except (ValueError, struct.error):
                continue                   # corrupt member: quarantine
        return pd.DataFrame(rows, columns=[
            "dataset", "layer", "fid", "geometry", "srid", "crs_wkt",
            "properties"])

    return members.groupBy("archive_path").applyInPandas(
        per_archive, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# dBase III (.dbf) attribute sidecar — the shapefile's fields
# (the reference's ogr2ogr carries them; spec: the published Xbase
# DBF layout — 32-byte header, 32-byte field descriptors terminated
# by 0x0D, fixed-width records with a deletion flag)
# ---------------------------------------------------------------------------

def parse_dbf(content: bytes) -> list[dict]:
    """One dict per (non-deleted) record, typed: N/F -> int/float,
    L -> bool, else trimmed string.  Record order matches the .shp
    record order (the pairing the shapefile spec mandates).
    Raises ValueError on malformed input."""
    import json  # noqa: F401  (kept for callers serializing rows)

    if len(content) < 32:
        raise ValueError("dbf: truncated header")
    n_records, header_len, record_len = struct.unpack_from(
        "<IHH", content, 4)
    fields = []
    pos = 32
    while pos + 1 <= len(content) and content[pos] != 0x0D:
        if pos + 32 > len(content):
            raise ValueError("dbf: truncated field descriptor")
        raw_name = content[pos:pos + 11].split(b"\x00", 1)[0]
        ftype = chr(content[pos + 11])
        flen = content[pos + 16]
        fields.append((raw_name.decode("ascii", "replace"), ftype,
                       flen))
        pos += 32
    if sum(f[2] for f in fields) + 1 != record_len:
        raise ValueError("dbf: record length mismatch")
    out = []
    pos = header_len
    for _ in range(n_records):
        if pos + record_len > len(content):
            break                          # truncated tail: stop clean
        rec = content[pos:pos + record_len]
        pos += record_len
        if rec[0:1] == b"*":               # deleted record
            continue
        row = {}
        off = 1
        for name, ftype, flen in fields:
            raw = rec[off:off + flen]
            off += flen
            text = raw.decode("latin-1", "replace").strip()
            if not text:
                continue
            if ftype in ("N", "F"):
                try:
                    row[name] = (float(text) if "." in text
                                 or "e" in text.lower() else int(text))
                except ValueError:
                    row[name] = text
            elif ftype == "L":
                if text in "YyTt":
                    row[name] = True
                elif text in "NnFf":
                    row[name] = False
            else:
                row[name] = text
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# writer — the sink twin of read_shp_bytes / parse_dbf
# ---------------------------------------------------------------------------

def _shp_payload(wkb: bytes) -> tuple[int, bytes]:
    """WKB -> (shape_type, .shp record payload).  Inverse of
    ``_parse_record`` for the 2D types; polygon rings re-wound to
    the shapefile convention (outer CW, holes CCW)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    p = G.parse_wkb(wkb)
    if p is None:
        raise ValueError("unparseable WKB")
    t = p["type"]
    if t == G.POINT:
        x, y = p["coords"][0], p["coords"][1]
        return 1, struct.pack("<i2d", 1, x, y)
    if t == G.MULTIPOINT:
        c = p["coords"]
        pts = list(zip(c[0::2], c[1::2]))
        xs, ys = [q[0] for q in pts], [q[1] for q in pts]
        body = struct.pack("<i4di", 8, min(xs), min(ys),
                           max(xs), max(ys), len(pts))
        for x, y in pts:
            body += struct.pack("<2d", x, y)
        return 8, body
    parts = [list(zip(f[0::2], f[1::2])) for f in p["parts"]]
    if t in (G.LINESTRING, G.MULTILINESTRING):
        stype = 3
    elif t in (G.POLYGON, G.MULTIPOLYGON):
        stype = 5
        roles = p.get("roles") or [True] * len(parts)
        fixed = []
        for part, is_shell in zip(parts, roles):
            ring = part if part[0] == part[-1] else part + [part[0]]
            # shapefile winding: outer CW, hole CCW
            fixed.append(G._orient(ring, ccw=not is_shell))
        parts = fixed
    else:
        raise ValueError(f"unsupported WKB type {t} for shapefile")
    allp = [q for part in parts for q in part]
    xs, ys = [q[0] for q in allp], [q[1] for q in allp]
    body = struct.pack("<i4d2i", stype, min(xs), min(ys),
                       max(xs), max(ys), len(parts), len(allp))
    idx = 0
    for part in parts:
        body += struct.pack("<i", idx)
        idx += len(part)
    for part in parts:
        for x, y in part:
            body += struct.pack("<2d", x, y)
    return stype, body


def _dbf_render(v, t: str, d: int) -> str:
    """One value as its dBASE text form (N right-justified later)."""
    if t == "L":
        return "T" if v else "F"
    if t == "N":
        return f"{v:.{d}f}" if d else str(int(v))
    return str(v)


def _dbf_bytes(props: list[dict]) -> bytes:
    """Attribute dicts -> dBASE III bytes (the ``parse_dbf``
    inverse): int/float -> N, bool -> L, else C.  Column WIDTHS are
    sized to the widest rendered value (never truncated — a chopped
    numeral is a silently wrong number); stored names laundered to
    the 10-char dBASE limit with collision suffixes, values still
    looked up by the ORIGINAL key."""
    # original key -> (type, dec); conflicts widen (int+float -> N.6,
    # anything else -> C)
    kinds: dict[str, tuple[str, int]] = {}
    for pr in props:
        for k, v in pr.items():
            if v is None:
                continue
            if isinstance(v, bool):
                t, d = "L", 0
            elif isinstance(v, int):
                t, d = "N", 0
            elif isinstance(v, float):
                t, d = "N", 6
            else:
                t, d = "C", 0
            prev = kinds.get(k)
            if prev is None or prev == (t, d):
                kinds[k] = (t, d)
            elif prev[0] == t == "N":
                kinds[k] = ("N", 6)
            else:
                kinds[k] = ("C", 0)
    keys = sorted(kinds)
    widths: dict[str, int] = {}
    for k in keys:
        t, d = kinds[k]
        w = 1
        for pr in props:
            v = pr.get(k)
            if v is None or (t == "L" and not isinstance(v, bool)):
                continue
            w = max(w, len(_dbf_render(v, t, d)))
        widths[k] = min(w, 254) if t == "C" else w
    # laundered unique 10-char names
    names: dict[str, str] = {}
    used: set[str] = set()
    for k in keys:
        base = str(k)[:10] or "F"
        name, i = base, 1
        while name in used:
            i += 1
            suf = f"_{i}"
            name = base[:10 - len(suf)] + suf
        used.add(name)
        names[k] = name

    record_len = 1 + sum(widths[k] for k in keys)
    header_len = 32 + 32 * len(keys) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 26, 8, 15, len(props),
                       header_len, record_len)
    for k in keys:
        t, d = kinds[k]
        out += struct.pack("<11sc4xBB14x",
                           names[k].encode("ascii", "replace"),
                           t.encode(), widths[k], d)
    out += b"\x0d"
    for pr in props:
        out += b" "
        for k in keys:
            t, d = kinds[k]
            w = widths[k]
            v = pr.get(k)
            if v is None or (t == "L" and not isinstance(v, bool)):
                out += (b"?" if t == "L" else b" " * w)[:w].ljust(w)
                continue
            txt = _dbf_render(v, t, d)
            if t == "N":
                out += txt[:w].rjust(w).encode("ascii", "replace")
            else:
                out += txt[:w].ljust(w).encode("latin-1", "replace")
    out += b"\x1a"
    return bytes(out)


def write_shapefile(base_path: str, feats: list[tuple],
                    srs_wkt: str | None = None) -> dict:
    """Write ``<base>.shp`` + ``.shx`` + ``.dbf`` (+ ``.prj`` when a
    WKT is given) from ``[(fid, wkb, props-dict-or-None), ...]``.
    One shape type per file (the spec): mixed inputs raise.  Returns
    {n_features, shape_type, paths}.
    """
    recs = []
    stype = None
    props = []
    for f in feats:
        fid, wkb = f[0], f[1]
        pr = f[2] if len(f) > 2 and isinstance(f[2], dict) else {}
        if wkb is None:
            continue
        st, body = _shp_payload(bytes(wkb))
        if stype is None:
            stype = st
        elif st != stype:
            raise ValueError(
                f"mixed shape types {stype}/{st}: shapefile holds one")
        recs.append(body)
        props.append(pr)
    stype = stype or 0

    def bbox():
        if not recs:
            return (0.0, 0.0, 0.0, 0.0)
        xs, ys = [], []
        for body in recs:
            if stype == 1:
                x, y = struct.unpack_from("<2d", body, 4)
                xs += [x]; ys += [y]
            else:
                x0, y0, x1, y1 = struct.unpack_from("<4d", body, 4)
                xs += [x0, x1]; ys += [y0, y1]
        return (min(xs), min(ys), max(xs), max(ys))

    x0, y0, x1, y1 = bbox()

    def header(total_words):
        return struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) \
            + struct.pack(">i", total_words) \
            + struct.pack("<2i", 1000, stype) \
            + struct.pack("<8d", x0, y0, x1, y1, 0, 0, 0, 0)

    shp = bytearray()
    shx = bytearray()
    off_words = 50                         # header = 100 bytes
    for i, body in enumerate(recs):
        shx += struct.pack(">2i", off_words, len(body) // 2)
        shp += struct.pack(">2i", i + 1, len(body) // 2)
        shp += body
        off_words += 4 + len(body) // 2
    paths = {}
    with open(base_path + ".shp", "wb") as f:
        f.write(header(off_words) + bytes(shp))
        paths["shp"] = base_path + ".shp"
    with open(base_path + ".shx", "wb") as f:
        f.write(header(50 + 4 * len(recs)) + bytes(shx))
        paths["shx"] = base_path + ".shx"
    with open(base_path + ".dbf", "wb") as f:
        f.write(_dbf_bytes(props))
        paths["dbf"] = base_path + ".dbf"
    if srs_wkt:
        with open(base_path + ".prj", "w", encoding="ascii",
                  errors="replace") as f:
            f.write(srs_wkt)
            paths["prj"] = base_path + ".prj"
    return {"n_features": len(recs), "shape_type": stype,
            "paths": paths}


def write_shapefile_tables(features: DataFrame,
                           dst_dir: str) -> DataFrame:
    """Distributed shapefile sink — one ``<dataset>_<layer>.shp`` +
    sidecars per (dataset, layer), the write twin of
    ``shapefile_feature_rows``.  Plan: ONE shuffle keyed on
    (dataset, layer), each group writes its trio independently, no
    driver collect.  Input: FEATURE_SCHEMA rows (properties JSON
    becomes typed .dbf columns); srid 4326 features get a minimal
    WGS84 .prj with the AUTHORITY clause ``epsg_from_prj`` reads
    back; other srids carry crs_wkt when present.
    """
    import json
    import os

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(features.sparkSession)
    has_props = "properties" in features.columns
    has_wkt = "crs_wkt" in features.columns

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        dataset = str(pdf["dataset"].iloc[0])
        layer = str(pdf["layer"].iloc[0])
        from geohub_data_pipeline_spark.functions.paths import (
            artifact_stem)
        os.makedirs(dst_dir, exist_ok=True)
        base = os.path.join(dst_dir, artifact_stem(dataset, layer))
        pdf = pdf.sort_values("fid")
        feats = []
        for row in pdf.itertuples(index=False):
            if row.geometry is None:
                continue
            pr = {}
            if has_props and isinstance(row.properties, str):
                try:
                    pr = json.loads(row.properties)
                except ValueError:
                    pr = {}
            fid = None if pd.isna(row.fid) else int(row.fid)
            pr.setdefault("fid", fid)
            feats.append((fid, bytes(row.geometry), pr))
        wkts = ([w for w in pdf["crs_wkt"].dropna().unique() if w]
                if has_wkt else [])
        srids = {int(s) for s in pdf["srid"].dropna()}
        wkt = wkts[0] if wkts else (
            'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
            '6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433],'
            'AUTHORITY["EPSG","4326"]]'
            if srids == {4326} else None)
        got = write_shapefile(base, feats, srs_wkt=wkt)
        return pd.DataFrame([{
            "dataset": dataset, "layer": layer,
            "path": got["paths"]["shp"],
            "shape_type": got["shape_type"],
            "n_features": got["n_features"],
            "file_bytes": os.path.getsize(got["paths"]["shp"])}])

    return features.groupBy("dataset", "layer").applyInPandas(
        write_group, "dataset string, layer string, path string, "
                     "shape_type int, n_features long, "
                     "file_bytes long")
