"""Shapefile source tests: spec-built .shp bytes through the reader,
the archive pairing path, and normalize."""

from __future__ import annotations

import io
import struct
import zipfile

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.sources import archive as A
from geohub_data_pipeline_spark.sources import shapefile as SHP


# ---------------------------------------------------------------------------
# Minimal spec-following .shp WRITER (tests only; ESRI TD 1998 layout)
# ---------------------------------------------------------------------------

def _shp_record(rec_no: int, payload: bytes) -> bytes:
    return struct.pack(">2i", rec_no, len(payload) // 2) + payload


def _shp_point(x, y):
    return struct.pack("<i2d", 1, x, y)


def _shp_null():
    return struct.pack("<i", 0)


def _shp_poly(shape_type, parts):
    pts = [p for part in parts for p in part]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    body = struct.pack("<i4d", shape_type, min(xs), min(ys),
                       max(xs), max(ys))
    body += struct.pack("<2i", len(parts), len(pts))
    idx = 0
    for part in parts:
        body += struct.pack("<i", idx)
        idx += len(part)
    for x, y in pts:
        body += struct.pack("<2d", x, y)
    return body


def _shp_multipoint(pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    body = struct.pack("<i4d", 8, min(xs), min(ys), max(xs), max(ys))
    body += struct.pack("<i", len(pts))
    for x, y in pts:
        body += struct.pack("<2d", x, y)
    return body


def write_shp(records: list[bytes]) -> bytes:
    body = b"".join(_shp_record(i + 1, r) for i, r in enumerate(records))
    total_words = (100 + len(body)) // 2
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, 1)          # version, shape type
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    assert len(header) == 100
    return header + body


_PRJ_3857 = ('PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",'
             'AUTHORITY["EPSG","4326"]],AUTHORITY["EPSG","3857"]]')


def test_epsg_from_prj():
    assert SHP.epsg_from_prj(_PRJ_3857) == 3857
    assert SHP.epsg_from_prj('GEOGCS["GCS_WGS_1984"]') == 4326
    assert SHP.epsg_from_prj('PROJCS["Unknown"]') is None


def test_read_shp_bytes_kinds():
    sq = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]
    hole = [(0.5, 0.5), (1.0, 0.5), (1.0, 1.0), (0.5, 1.0), (0.5, 0.5)]
    blob = write_shp([
        _shp_point(10.0, 20.0),
        _shp_poly(3, [[(0.0, 0.0), (1.0, 1.0)],
                      [(2.0, 2.0), (3.0, 3.0), (4.0, 2.0)]]),
        _shp_poly(5, [sq, hole]),          # CW outer + CCW hole soup
        _shp_multipoint([(1.0, 2.0), (3.0, 4.0)]),
        _shp_null(),
    ])
    rows = list(SHP.read_shp_bytes(blob, "d.zip", "layer", 4326))
    assert [r[2] for r in rows] == [1, 2, 3, 4, 5]
    kinds = [None if r[3] is None else G.parse_wkb(r[3])["type"]
             for r in rows]
    assert kinds == [G.POINT, G.MULTILINESTRING, G.POLYGON,
                     G.MULTIPOINT, None]
    # polygon record kept rings verbatim (2 rings)
    assert len(G.parse_wkb(rows[2][3])["parts"]) == 2
    # unsupported shape type -> NULL-geometry row, not a crash
    bad = write_shp([struct.pack("<i", 31)])
    rows = list(SHP.read_shp_bytes(bad, "d", "l", None))
    assert rows[0][3] is None


def test_zipped_shapefile_end_to_end(spark, tmp_path):
    """zip(.shp + .prj) -> archive source -> shapefile rows ->
    normalize: srid from .prj, shapefile ring soup structured by
    makevalid (CW outer re-wound, CCW hole homed)."""
    sq_cw = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]
    hole_ccw = [(0.5, 0.5), (1.0, 0.5), (1.0, 1.0), (0.5, 1.0),
                (0.5, 0.5)]
    merc = G.lonlat_to_mercator(10.0, 45.0)
    blob = write_shp([
        _shp_point(*merc),
        _shp_poly(5, [[G.lonlat_to_mercator(x / 10, y / 10)
                       for x, y in ring] for ring in (sq_cw, hole_ccw)]),
    ])
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data/roads.shp", blob)
        zf.writestr("data/roads.prj", _PRJ_3857)
        zf.writestr("data/roads.dbf", b"\x03ignored")
    with open(tmp_path / "upload.zip", "wb") as f:
        f.write(buf.getvalue())

    members = A.read_archives(spark, str(tmp_path / "upload.zip"))
    feats = SHP.shapefile_feature_rows(members)
    rows = {r.fid: r for r in feats.collect()}
    assert set(rows) == {1, 2}
    assert all(r.srid == 3857 and r.layer == "roads"
               and r.dataset == "upload.zip" for r in rows.values())

    norm = {r.fid: r for r in G.normalize_features(feats).collect()}
    assert abs(norm[1].bbox_minx - 10.0) < 1e-9    # reprojected
    assert abs(norm[1].bbox_miny - 45.0) < 1e-9
    parsed = G.parse_wkb(bytes(norm[2].geometry))
    assert parsed["roles"] == [True, False]        # shell + homed hole
    ext, hole = (G._pairs(p) for p in parsed["parts"])
    assert G._ring_area2(ext) > 0 and G._ring_area2(hole) < 0


def test_write_shapefile_roundtrip(spark, tmp_path):
    """Distributed sink round-trip: FEATURE_SCHEMA rows -> .shp/.shx/
    .dbf/.prj per (dataset, layer) -> read_shp_bytes + parse_dbf +
    epsg_from_prj recover geometry, attributes, and srid; polygon
    rings land in shapefile winding (outer CW)."""
    import json
    import os
    import struct as st

    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.sources import shapefile as SHP
    from geohub_data_pipeline_spark.sources.flatgeobuf import (
        FEATURE_SCHEMA,
    )

    poly = G.wkb_polygon([
        [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
        [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)],
    ])
    rows = [
        ("d", "zones", 1, poly, 4326, None,
         json.dumps({"name": "alpha", "pop": 12, "area": 1.5})),
        ("d", "pts", 1, G.wkb_point(3.0, 7.0), 4326, None,
         json.dumps({"name": "x"})),
        ("d", "pts", 2, G.wkb_point(-1.0, 2.0), 4326, None, None),
    ]
    feats = spark.createDataFrame(rows, FEATURE_SCHEMA)
    man = {(r.dataset, r.layer): r
           for r in SHP.write_shapefile_tables(
               feats, str(tmp_path)).collect()}
    assert man[("d", "pts")].n_features == 2
    assert man[("d", "pts")].shape_type == 1
    assert man[("d", "zones")].shape_type == 5

    base = str(tmp_path / "d_pts")
    shp = open(base + ".shp", "rb").read()
    back = list(SHP.read_shp_bytes(shp, "d", "pts", 4326))
    assert len(back) == 2
    assert bytes(back[0][3]) == G.wkb_point(3.0, 7.0)
    attrs = SHP.parse_dbf(open(base + ".dbf", "rb").read())
    assert attrs[0]["name"] == "x" and attrs[0]["fid"] == 1
    assert "name" not in attrs[1] and attrs[1]["fid"] == 2
    assert SHP.epsg_from_prj(open(base + ".prj").read()) == 4326
    # .shx record count mirrors .shp
    shx = open(base + ".shx", "rb").read()
    (words,) = st.unpack_from(">i", shx, 24)
    assert words * 2 == len(shx) == 100 + 8 * 2

    zshp = open(str(tmp_path / "d_zones") + ".shp", "rb").read()
    zb = list(SHP.read_shp_bytes(zshp, "d", "zones", 4326))
    p = G.parse_wkb(bytes(zb[0][3]))
    assert p["type"] in (G.POLYGON, G.MULTIPOLYGON)
    rings = [list(zip(f[0::2], f[1::2])) for f in p["parts"]]
    # outer ring CW on disk (reader keeps file order)
    a2 = G._ring_area2([*rings[0], rings[0][0]][:len(rings[0]) + 1]
                       if rings[0][0] != rings[0][-1] else rings[0])
    assert a2 < 0
    zattrs = SHP.parse_dbf(
        open(str(tmp_path / "d_zones") + ".dbf", "rb").read())
    assert zattrs[0]["pop"] == 12 and zattrs[0]["name"] == "alpha"
    assert abs(zattrs[0]["area"] - 1.5) < 1e-9
