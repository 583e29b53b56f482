"""ESRI File Geodatabase (.gdb) vector source — stdlib struct, no GDAL.

FileGDB is in the reference's accepted vector format list (ref
ingest/config.py:59-62, read through GDAL's OpenFileGDB driver); it
arrives as a zipped directory of ``a%08x.gdbtable`` files.  The layout
is the publicly documented reverse-engineered FGDB spec (E. Rouault,
"FGDB Spec", github.com/rouault/dump_gdbtable/wiki — the same document
GDAL's OpenFileGDB driver is built from):

* ``a00000001.gdbtable`` — GDB_SystemCatalog: one row per table
  (Name, FileFormat); row id N maps to files ``a%08x.gdbtable`` /
  ``.gdbtablx`` (N in hex),
* ``.gdbtablx`` — fixed-size row index: int32 magic(3), int32 number
  of 1024-row blocks, int32 row count, int32 entry size (4/5/6),
  then little-endian byte offsets into the .gdbtable (0 = deleted),
* ``.gdbtable`` — int32 magic(3), int32 valid rows, 16 reserved
  bytes, int64 file size, int64 offset of the field-description
  section; fields are (utf16 name, utf16 alias, type byte,
  type-specific info); rows are (int32 size, null bitmap over the
  nullable fields, values in declaration order),
* geometry values are compressed Esri shape buffers: varuint shape
  type, then coordinates as scaled integers — points store
  ``round((x - xorigin) * xyscale) + 1``; lines/polygons store a
  varuint point/part census, a 4-varuint envelope, and per-point
  signed-varint deltas of the scaled coordinates.

Coverage: XY points, multipoints, polylines and polygons (plus their
Z/M variants — trailing z/m arrays are simply not read; the engine is
2-D).  Curve-bearing general shapes and raster fields quarantine as
NULL-geometry rows (the ``-skipfailures`` path, audited downstream).
Sparse .gdbtablx trailer bitmaps are not decoded — tables written by
ArcGIS after heavy row deletion may quarantine.

The source emits the engine's standard feature rows
(dataset, layer, fid, geometry WKB, srid) — the same schema as the
GeoPackage/shapefile/GeoJSON sources, so normalize/makevalid/tiling/
GeoParquet are all shared downstream.

Scale: one .gdb directory = one task (it is a single-dataset
container, like .gpkg); feature rows stream out as Arrow batches and
repartition like any other feature scan.
"""

from __future__ import annotations

import json
import math
import os
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

FEATURE_SCHEMA = (
    "dataset string, layer string, fid long, geometry binary, srid int, "
    "crs_wkt string, properties string"
)

# field type byte -> symbolic name (FGDB spec "Field description")
FT_INT16, FT_INT32, FT_FLOAT32, FT_FLOAT64 = 0, 1, 2, 3
FT_STRING, FT_DATETIME, FT_OBJECTID, FT_GEOMETRY = 4, 5, 6, 7
FT_BINARY, FT_RASTER, FT_UUID, FT_GLOBALID, FT_XML = 8, 9, 10, 11, 12

# Esri shape-buffer types (shared with shapefiles) -> base kind
_SHAPE_KIND = {
    1: "point", 9: "point", 11: "point", 21: "point",
    3: "line", 10: "line", 13: "line", 23: "line",
    5: "polygon", 15: "polygon", 19: "polygon", 25: "polygon",
    8: "multipoint", 18: "multipoint", 20: "multipoint",
    28: "multipoint",
    52: "point", 50: "line", 51: "polygon", 54: "multipoint",
}
_CURVE_FLAG = 0x20000000


# ---------------------------------------------------------------------------
# varint codecs (FGDB spec "Varint encoding")
# ---------------------------------------------------------------------------

def vu_read(buf: bytes, pos: int) -> tuple[int, int]:
    """Unsigned varint: 7-bit groups, low first, bit 7 continues."""
    v = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def vu_bytes(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def vs_read(buf: bytes, pos: int) -> tuple[int, int]:
    """Signed varint: first byte has bit 6 = sign, bits 0-5 = low
    magnitude bits; continuation bytes are plain 7-bit groups."""
    b = buf[pos]
    pos += 1
    neg = bool(b & 0x40)
    v = b & 0x3F
    shift = 6
    while b & 0x80:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
    return (-v if neg else v), pos


def vs_bytes(v: int) -> bytes:
    neg = v < 0
    v = -v if neg else v
    first = (v & 0x3F) | (0x40 if neg else 0)
    v >>= 6
    out = bytearray([first])
    while v:
        out[-1] |= 0x80
        out.append(v & 0x7F)
        v >>= 7
    return bytes(out)


# ---------------------------------------------------------------------------
# .gdbtablx (row index)
# ---------------------------------------------------------------------------

def parse_gdbtablx(buf: bytes) -> list[int]:
    """Row-data offsets in .gdbtable order; 0 entries (deleted rows)
    are preserved so index i is always objectid i+1."""
    if len(buf) < 16:
        raise ValueError("filegdb: truncated .gdbtablx")
    magic, n_blocks, n_rows, esize = struct.unpack_from("<4i", buf, 0)
    if magic != 3:
        raise ValueError("filegdb: bad .gdbtablx magic")
    if esize not in (4, 5, 6):
        raise ValueError(f"filegdb: bad .gdbtablx entry size {esize}")
    out = []
    pos = 16
    for _ in range(n_rows):
        if pos + esize > len(buf):
            raise ValueError("filegdb: truncated .gdbtablx entries")
        out.append(int.from_bytes(buf[pos:pos + esize], "little"))
        pos += esize
    return out


def gdbtablx_bytes(offsets: list[int]) -> bytes:
    """Fixture writer: dense 5-byte-entry index for ``offsets``."""
    n = len(offsets)
    n_blocks = math.ceil(n / 1024) if n else 0
    out = bytearray(struct.pack("<4i", 3, n_blocks, n, 5))
    for off in offsets:
        out += off.to_bytes(5, "little")
    out += b"\x00" * (5 * (n_blocks * 1024 - n))
    return bytes(out)


# ---------------------------------------------------------------------------
# .gdbtable (field descriptions + rows)
# ---------------------------------------------------------------------------

class Field:
    __slots__ = ("name", "ftype", "nullable")

    def __init__(self, name: str, ftype: int, nullable: bool):
        self.name = name
        self.ftype = ftype
        self.nullable = nullable


def _utf16_name(buf: bytes, pos: int) -> tuple[str, int]:
    n = buf[pos]
    pos += 1
    s = buf[pos:pos + 2 * n].decode("utf-16-le")
    return s, pos + 2 * n


def parse_gdbtable_fields(buf: bytes) -> tuple[list[Field], dict]:
    """Field list + geometry metadata from a .gdbtable blob.

    Returns (fields, geom_info) where geom_info has keys
    wkt/xorigin/yorigin/xyscale (empty dict when the table has no
    geometry field).  Raises ValueError on malformed input.
    """
    if len(buf) < 40:
        raise ValueError("filegdb: truncated .gdbtable")
    magic, _n_valid = struct.unpack_from("<2i", buf, 0)
    if magic != 3:
        raise ValueError("filegdb: bad .gdbtable magic")
    (fields_off,) = struct.unpack_from("<q", buf, 32)
    if not 40 <= fields_off <= len(buf) - 10:
        raise ValueError("filegdb: bad field-section offset")
    pos = fields_off
    _size, _version = struct.unpack_from("<2i", buf, pos)
    pos += 8
    pos += 4                               # geometry-type byte + 3 flags
    (n_fields,) = struct.unpack_from("<H", buf, pos)
    pos += 2

    fields: list[Field] = []
    geom_info: dict = {}
    for _ in range(n_fields):
        name, pos = _utf16_name(buf, pos)
        _alias, pos = _utf16_name(buf, pos)
        ftype = buf[pos]
        pos += 1
        nullable = True
        if ftype == FT_OBJECTID:
            pos += 2                       # width(4?), magic(2?)
            nullable = False
        elif ftype in (FT_INT16, FT_INT32, FT_FLOAT32, FT_FLOAT64,
                       FT_DATETIME):
            _width = buf[pos]
            flag = buf[pos + 1]
            pos += 2
            nullable = bool(flag & 1)
            if flag & 4:                   # inline default value
                dlen = buf[pos]
                pos += 1 + dlen
        elif ftype in (FT_STRING, FT_XML):
            (_maxlen,) = struct.unpack_from("<i", buf, pos)
            flag = buf[pos + 4]
            pos += 5
            nullable = bool(flag & 1)
            if flag & 4:
                dlen, pos = vu_read(buf, pos)
                pos += dlen
        elif ftype in (FT_UUID, FT_GLOBALID):
            flag = buf[pos + 1]
            pos += 2
            nullable = bool(flag & 1)
        elif ftype in (FT_BINARY, FT_RASTER):
            flag = buf[pos + 1]
            pos += 2
            nullable = bool(flag & 1)
            if ftype == FT_RASTER:
                raise ValueError("filegdb: raster field unsupported")
        elif ftype == FT_GEOMETRY:
            flag = buf[pos + 1]
            pos += 2
            nullable = bool(flag & 1)
            (wkt_bytes,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            wkt = buf[pos:pos + wkt_bytes].decode("utf-16-le")
            pos += wkt_bytes
            gflags = buf[pos]
            pos += 1
            has_m = bool(gflags & 2)
            has_z = bool(gflags & 4)
            xorigin, yorigin, xyscale = struct.unpack_from(
                "<3d", buf, pos)
            pos += 24
            if has_m:
                pos += 16                  # morigin, mscale
            if has_z:
                pos += 16                  # zorigin, zscale
            pos += 8                       # xytolerance
            if has_m:
                pos += 8
            if has_z:
                pos += 8
            pos += 32                      # xmin, ymin, xmax, ymax
            pos += 1                       # reserved 0x00
            (n_grids,) = struct.unpack_from("<I", buf, pos)
            pos += 4 + 8 * n_grids
            geom_info = {"wkt": wkt, "xorigin": xorigin,
                         "yorigin": yorigin, "xyscale": xyscale,
                         "has_z": has_z, "has_m": has_m}
        else:
            raise ValueError(f"filegdb: unknown field type {ftype}")
        fields.append(Field(name, ftype, nullable))
    return fields, geom_info


def read_rows(tbl: bytes, tblx: bytes):
    """Yield (objectid, {field name: value}) for every live row.

    Geometry values stay raw shape-buffer bytes (decode with
    ``shape_to_wkb``); datetimes stay FGDB float days.
    """
    fields, geom_info = parse_gdbtable_fields(tbl)
    nullable = [f for f in fields if f.nullable]
    n_null_bytes = math.ceil(len(nullable) / 8)
    for i, off in enumerate(parse_gdbtablx(tblx)):
        if off == 0:
            continue                       # deleted row
        if off + 4 > len(tbl):
            raise ValueError("filegdb: row offset out of bounds")
        (row_len,) = struct.unpack_from("<i", tbl, off)
        body = tbl[off + 4:off + 4 + row_len]
        if len(body) != row_len:
            raise ValueError("filegdb: truncated row")
        nulls = body[:n_null_bytes]
        pos = n_null_bytes
        ni = 0
        values: dict = {}
        for f in fields:
            if f.ftype == FT_OBJECTID:
                values[f.name] = i + 1
                continue
            if f.nullable:
                is_null = bool(nulls[ni // 8] >> (ni % 8) & 1)
                ni += 1
                if is_null:
                    values[f.name] = None
                    continue
            if f.ftype == FT_INT16:
                (values[f.name],) = struct.unpack_from("<h", body, pos)
                pos += 2
            elif f.ftype == FT_INT32:
                (values[f.name],) = struct.unpack_from("<i", body, pos)
                pos += 4
            elif f.ftype == FT_FLOAT32:
                (values[f.name],) = struct.unpack_from("<f", body, pos)
                pos += 4
            elif f.ftype in (FT_FLOAT64, FT_DATETIME):
                (values[f.name],) = struct.unpack_from("<d", body, pos)
                pos += 8
            elif f.ftype in (FT_STRING, FT_XML):
                n, pos = vu_read(body, pos)
                values[f.name] = body[pos:pos + n].decode(
                    "utf-8", "replace")
                pos += n
            elif f.ftype in (FT_BINARY, FT_GEOMETRY):
                n, pos = vu_read(body, pos)
                values[f.name] = bytes(body[pos:pos + n])
                pos += n
            elif f.ftype in (FT_UUID, FT_GLOBALID):
                values[f.name] = bytes(body[pos:pos + 16])
                pos += 16
        yield i + 1, values, fields, geom_info


# ---------------------------------------------------------------------------
# compressed Esri shape buffer <-> WKB
# ---------------------------------------------------------------------------

def shape_to_wkb(shape: bytes, gi: dict) -> bytes | None:
    """Decode one compressed shape buffer to 2-D WKB; None for empty
    or unsupported (curves) shapes.  Raises ValueError when corrupt.
    """
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.sources.shapefile import (
        _multilinestring_wkb,
        _multipoint_wkb,
    )

    if not shape:
        return None
    stype, pos = vu_read(shape, 0)
    base = stype & 0xFF
    if base == 0:
        return None
    kind = _SHAPE_KIND.get(base)
    if kind is None or stype & _CURVE_FLAG:
        raise ValueError(f"filegdb: unsupported shape type {stype}")
    ox, oy, s = gi["xorigin"], gi["yorigin"], gi["xyscale"]

    if kind == "point":
        vx, pos = vu_read(shape, pos)
        vy, pos = vu_read(shape, pos)
        if vx == 0 or vy == 0:             # empty coordinate sentinel
            return None
        return G.wkb_point((vx - 1) / s + ox, (vy - 1) / s + oy)

    n_points, pos = vu_read(shape, pos)
    if n_points == 0:
        return None
    if kind == "multipoint":
        for _ in range(4):                 # envelope varuints
            _, pos = vu_read(shape, pos)
        pts, pos = _delta_points(shape, pos, n_points, ox, oy, s)
        return _multipoint_wkb(pts)

    n_parts, pos = vu_read(shape, pos)
    if n_parts == 0:
        return None
    for _ in range(4):                     # envelope varuints
        _, pos = vu_read(shape, pos)
    counts = []
    for _ in range(n_parts - 1):
        c, pos = vu_read(shape, pos)
        counts.append(c)
    counts.append(n_points - sum(counts))
    if counts[-1] < 0:
        raise ValueError("filegdb: inconsistent part census")
    pts, pos = _delta_points(shape, pos, n_points, ox, oy, s)
    parts, at = [], 0
    for c in counts:
        parts.append(pts[at:at + c])
        at += c
    parts = [p for p in parts if len(p) >= 2]
    if not parts:
        return None
    if kind == "line":
        if len(parts) == 1:
            return G.wkb_linestring(parts[0])
        return _multilinestring_wkb(parts)
    rings = [p if p[0] == p[-1] else p + [p[0]] for p in parts]
    return G.wkb_polygon(rings)


def _delta_points(shape: bytes, pos: int, n: int, ox: float, oy: float,
                  s: float):
    pts = []
    xi = yi = 0
    for _ in range(n):
        dx, pos = vs_read(shape, pos)
        dy, pos = vs_read(shape, pos)
        xi += dx
        yi += dy
        pts.append((xi / s + ox, yi / s + oy))
    return pts, pos


def wkb_to_shape(wkb: bytes | None, gi: dict) -> bytes:
    """Encode 2-D WKB as a compressed shape buffer (fixture writer /
    GeoParquet-to-FGDB export path)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    if wkb is None:
        return vu_bytes(0)
    g = G.parse_wkb(wkb)
    if g is None:
        raise ValueError("filegdb: malformed WKB")
    ox, oy, s = gi["xorigin"], gi["yorigin"], gi["xyscale"]

    def sx(x):
        return round((x - ox) * s)

    def sy(y):
        return round((y - oy) * s)

    def pairs(flat):
        return list(zip(flat[0::2], flat[1::2]))

    t = g["type"]
    parts = [pairs(p) for p in g["parts"]]
    if t == G.POINT:
        x, y = g["coords"]
        return (vu_bytes(1) + vu_bytes(sx(x) + 1) + vu_bytes(sy(y) + 1))
    if t == G.MULTIPOINT:
        allpts = [p for part in parts for p in part]
        return _encode_parts(8, [allpts], sx, sy, multi=True)
    if t in (G.LINESTRING, G.MULTILINESTRING):
        return _encode_parts(3, parts, sx, sy)
    if t in (G.POLYGON, G.MULTIPOLYGON):
        return _encode_parts(5, parts, sx, sy)
    raise ValueError(f"filegdb: cannot encode WKB type {t}")


def _encode_parts(stype: int, parts, sx, sy, multi: bool = False) -> bytes:
    pts = [p for part in parts for p in part]
    xs = [sx(x) for x, _ in pts]
    ys = [sy(y) for _, y in pts]
    out = bytearray(vu_bytes(stype))
    out += vu_bytes(len(pts))
    if not multi:
        out += vu_bytes(len(parts))
    out += vu_bytes(min(xs))
    out += vu_bytes(min(ys))
    out += vu_bytes(max(xs) - min(xs))
    out += vu_bytes(max(ys) - min(ys))
    if not multi:
        for part in parts[:-1]:
            out += vu_bytes(len(part))
    px = py = 0
    for x, y in zip(xs, ys):
        out += vs_bytes(x - px)
        out += vs_bytes(y - py)
        px, py = x, y
    return bytes(out)


# ---------------------------------------------------------------------------
# catalog + dataset assembly
# ---------------------------------------------------------------------------

def read_filegdb(files: dict[str, bytes], dataset: str):
    """Yield (dataset, layer, fid, wkb, srid, crs_wkt) from a .gdb
    directory's
    files ({basename: bytes}).  Raises ValueError when the system
    catalog itself is unreadable; per-layer problems quarantine that
    layer only."""
    from geohub_data_pipeline_spark.sources.shapefile import epsg_from_prj

    files = {os.path.basename(k).lower(): v for k, v in files.items()}
    cat_t = files.get("a00000001.gdbtable")
    cat_x = files.get("a00000001.gdbtablx")
    if cat_t is None or cat_x is None:
        raise ValueError("filegdb: missing system catalog")
    tables: list[tuple[int, str]] = []
    for oid, values, fields, _gi in read_rows(cat_t, cat_x):
        name = None
        for f in fields:
            if f.ftype == FT_STRING and f.name.lower() == "name":
                name = values.get(f.name)
                break
        if name:
            tables.append((oid, str(name)))

    for oid, name in tables:
        if name.upper().startswith("GDB_"):
            continue                       # system table
        tbl = files.get(f"a{oid:08x}.gdbtable")
        tbx = files.get(f"a{oid:08x}.gdbtablx")
        if tbl is None or tbx is None:
            continue
        try:
            rows = list(read_rows(tbl, tbx))
        except (ValueError, struct.error, IndexError):
            continue                       # corrupt layer: quarantine
        for fid, values, fields, gi in rows:
            geom_field = next(
                (f for f in fields if f.ftype == FT_GEOMETRY), None)
            if geom_field is None:
                continue                   # attribute-only table
            wkt = gi.get("wkt", "") or ""
            epsg = epsg_from_prj(wkt) if wkt else None
            # srid 0 = "EPSG unknown, reproject via the embedded WKT"
            # (operators/crs_wkt.py); bare tables default to 4326
            srid = epsg if epsg is not None else (0 if wkt else 4326)
            crs_wkt = wkt if epsg is None and wkt else None
            attrs = {f.name: values[f.name] for f in fields
                     if f.ftype != FT_GEOMETRY
                     and values.get(f.name) is not None
                     and not isinstance(values.get(f.name), bytes)}
            props = (json.dumps(attrs, sort_keys=True,
                                separators=(",", ":"), default=str)
                     if attrs else None)
            raw = values.get(geom_field.name)
            wkb = None
            if raw:
                try:
                    wkb = shape_to_wkb(raw, gi)
                except (ValueError, struct.error, IndexError):
                    wkb = None             # -skipfailures row
            yield dataset, name, int(fid), wkb, srid, crs_wkt, props


def features_from_gdb(spark: SparkSession, path: str) -> DataFrame:
    """Scan .gdb directories under ``path`` into engine feature rows.

    Plan: binaryFile recursive scan, ONE shuffle grouping files by
    their .gdb directory (a FileGDB is a multi-file container — the
    catalog and layer tables must meet), then map-side parsing.
    """
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(spark)

    raw = (spark.read.format("binaryFile")
           .option("recursiveFileLookup", "true").load(path)
           .select("path", "content")
           .withColumn("gdb_dir", F.regexp_replace(
               F.col("path"), r"/[^/]+$", "")))

    def per_gdb(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        gdb_dir = str(pdf["gdb_dir"].iloc[0]).removeprefix("file:")
        dataset = os.path.basename(gdb_dir.rstrip("/"))
        files = {os.path.basename(str(p)): bytes(c)
                 for p, c in zip(pdf["path"], pdf["content"])}
        try:
            rows = list(read_filegdb(files, dataset))
        except (ValueError, struct.error, IndexError):
            rows = []                      # corrupt gdb: quarantine
        return pd.DataFrame(rows, columns=[
            "dataset", "layer", "fid", "geometry", "srid", "crs_wkt",
            "properties"])

    return raw.groupBy("gdb_dir").applyInPandas(per_gdb, FEATURE_SCHEMA)


def filegdb_feature_rows(members: DataFrame) -> DataFrame:
    """Expand ``*.gdb/*`` archive members (sources/archive.py member
    schema) into feature rows — .gdb uploads arrive zipped (ref
    ingest/utils.py:23-32 archive registry).

    Plan: ONE shuffle grouping members by (archive, .gdb dir), then
    map-side parsing — same shape as the shapefile member route.
    """
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(members.sparkSession)

    gdb = (members
           .filter(F.lower("member").rlike(r"\.gdb/[^/]+$"))
           .withColumn("gdb_dir", F.concat(
               F.col("archive_path"), F.lit("::"),
               F.regexp_replace(F.col("member"), r"/[^/]+$", ""))))

    def per_gdb(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf["gdb_dir"].iloc[0])
        dataset = os.path.basename(key.split("::", 1)[-1].rstrip("/"))
        files = {os.path.basename(str(m)): bytes(c)
                 for m, c in zip(pdf["member"], pdf["content"])}
        try:
            rows = list(read_filegdb(files, dataset))
        except (ValueError, struct.error, IndexError):
            rows = []
        return pd.DataFrame(rows, columns=[
            "dataset", "layer", "fid", "geometry", "srid", "crs_wkt",
            "properties"])

    return gdb.groupBy("gdb_dir").applyInPandas(per_gdb, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# minimal spec-following writer (fixtures + export)
# ---------------------------------------------------------------------------

_DEFAULT_GI = {"xorigin": -400.0, "yorigin": -400.0, "xyscale": 1e9,
               "has_z": False, "has_m": False}

_WKT_4326 = ('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
             'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
             'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433],'
             'AUTHORITY["EPSG","4326"]]')


def _field_bytes(name: str, ftype: int, extra: bytes) -> bytes:
    nm = name.encode("utf-16-le")
    return (bytes([len(name)]) + nm + bytes([0]) + bytes([ftype])
            + extra)


def _geom_field_extra(wkt: str, gi: dict) -> bytes:
    w = wkt.encode("utf-16-le")
    out = bytearray(b"\x00\x01")           # unknown, flag: nullable
    out += struct.pack("<H", len(w)) + w
    out += bytes([0])                      # XY only (no z/m bits)
    out += struct.pack("<3d", gi["xorigin"], gi["yorigin"],
                       gi["xyscale"])
    out += struct.pack("<d", 1.0 / gi["xyscale"])      # xytolerance
    out += struct.pack("<4d", -180.0, -90.0, 180.0, 90.0)
    out += bytes([0]) + struct.pack("<I", 1) + struct.pack("<d", 0.0)
    return bytes(out)


def _table_bytes(names_and_fields: list[tuple], rows: list[list]) -> bytes:
    """Assemble one .gdbtable + matching .gdbtablx.

    names_and_fields: [(name, ftype, extra_bytes, nullable)], rows:
    per row a list of encoded value bytes (None = NULL) aligned to
    the non-objectid fields.  Returns (table_bytes, tablx_bytes).
    """
    field_section = bytearray()
    field_section += struct.pack("<i", 4)              # version 4
    field_section += bytes([1, 3, 0, 0])               # geom type, flags
    field_section += struct.pack("<H", len(names_and_fields))
    for name, ftype, extra, _nullable in names_and_fields:
        field_section += _field_bytes(name, ftype, extra)
    nullable = [f for f in names_and_fields if f[3]]
    n_null_bytes = math.ceil(len(nullable) / 8)

    body = bytearray()
    offsets = []
    header_len = 40
    row_blobs = []
    for row in rows:
        nulls = bytearray(n_null_bytes)
        payload = bytearray()
        ni = 0
        vi = 0
        for name, ftype, extra, nb in names_and_fields:
            if ftype == FT_OBJECTID:
                continue
            v = row[vi]
            vi += 1
            if nb:
                if v is None:
                    nulls[ni // 8] |= 1 << (ni % 8)
                ni += 1
            if v is not None:
                payload += v
        row_blobs.append(bytes(nulls) + bytes(payload))

    pos = header_len
    for blob in row_blobs:
        offsets.append(pos)
        body += struct.pack("<i", len(blob)) + blob
        pos += 4 + len(blob)
    fields_off = pos
    table = bytearray()
    table += struct.pack("<2i", 3, len(rows))
    table += b"\x00" * 16
    total = fields_off + 4 + len(field_section)
    table += struct.pack("<q", total)                  # file size
    table += struct.pack("<q", fields_off)
    table += body
    table += struct.pack("<i", len(field_section)) + field_section
    return bytes(table), gdbtablx_bytes(offsets)


def write_filegdb(dirpath: str, layers: dict[str, list[tuple]],
                  srid_wkt: str = _WKT_4326) -> None:
    """Minimal spec-conformant FileGDB writer (fixtures + export):
    ``layers`` maps layer name -> [(fid, wkb bytes | None), ...].
    Feature ids must be dense from 1 (they become row positions).
    """
    os.makedirs(dirpath, exist_ok=True)
    gi = dict(_DEFAULT_GI)

    # system catalog: Name (string, nullable), FileFormat (int32)
    cat_fields = [
        ("OBJECTID", FT_OBJECTID, b"\x04\x02", False),
        ("Name", FT_STRING, struct.pack("<i", 160) + b"\x01", True),
        ("FileFormat", FT_INT32, b"\x04\x01", True),
    ]
    names = ["GDB_SystemCatalog", "GDB_DBTuning", "GDB_SpatialRefs",
             "GDB_Items", "GDB_ItemTypes", "GDB_ItemRelationships",
             "GDB_ItemRelationshipTypes", "GDB_ReplicaLog"]
    names += list(layers)
    cat_rows = [[vu_bytes(len(n.encode())) + n.encode(),
                 struct.pack("<i", 0)] for n in names]
    tbl, tbx = _table_bytes(cat_fields, cat_rows)
    with open(os.path.join(dirpath, "a00000001.gdbtable"), "wb") as f:
        f.write(tbl)
    with open(os.path.join(dirpath, "a00000001.gdbtablx"), "wb") as f:
        f.write(tbx)

    for li, (layer, feats) in enumerate(layers.items()):
        oid = 9 + li
        lf = [
            ("OBJECTID", FT_OBJECTID, b"\x04\x02", False),
            ("SHAPE", FT_GEOMETRY, _geom_field_extra(srid_wkt, gi),
             True),
        ]
        rows = []
        for _fid, wkb in sorted(feats):
            if wkb is None:
                rows.append([None])
            else:
                shape = wkb_to_shape(wkb, gi)
                rows.append([vu_bytes(len(shape)) + shape])
        tbl, tbx = _table_bytes(lf, rows)
        base = os.path.join(dirpath, f"a{oid:08x}")
        with open(base + ".gdbtable", "wb") as f:
            f.write(tbl)
        with open(base + ".gdbtablx", "wb") as f:
            f.write(tbx)
