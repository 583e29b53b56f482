"""MVT encoder tests — decoded with an independent protobuf-wire
reader (shares nothing with the encoder)."""

from __future__ import annotations

import json
import math

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators import mvt as M


# ---- independent minimal protobuf-wire decoder ----------------------------

def _read_varint(buf, pos):
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, pos
        shift += 7


def _fields(buf):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        num, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
            yield num, v
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            yield num, buf[pos:pos + ln]
            pos += ln
        elif wt == 1:                      # 64-bit (double values)
            yield num, buf[pos:pos + 8]
            pos += 8
        else:
            raise AssertionError(f"unexpected wire type {wt}")


def _unzigzag(v):
    return (v >> 1) ^ -(v & 1)


def _decode_value(buf: bytes):
    import struct as _s
    for num, val in _fields(buf):
        if num == 1:
            return val.decode()
        if num == 3:
            return _s.unpack("<d", val)[0] if isinstance(val, (bytes, bytearray)) else val
        if num == 6:
            return _unzigzag(val)
        if num == 7:
            return bool(val)
    return None


def decode_tile(buf: bytes) -> dict:
    layers = {}
    for num, payload in _fields(buf):
        assert num == 3
        name = version = extent = None
        feats = []
        keys = []
        values = []
        for fnum, fval in _fields(payload):
            if fnum == 1:
                name = fval.decode()
            elif fnum == 15:
                version = fval
            elif fnum == 5:
                extent = fval
            elif fnum == 3:
                keys.append(fval.decode())
            elif fnum == 4:
                values.append(_decode_value(fval))
            elif fnum == 2:
                feat = {"id": None, "type": None, "coords": [],
                        "tags": []}
                for gnum, gval in _fields(fval):
                    if gnum == 1:
                        feat["id"] = gval
                    elif gnum == 2:
                        pos = 0
                        while pos < len(gval):
                            t, pos = _read_varint(gval, pos)
                            feat["tags"].append(t)
                    elif gnum == 3:
                        feat["type"] = gval
                    elif gnum == 4:
                        # decode command stream
                        pos = 0
                        cx = cy = 0
                        paths = []
                        cur = None
                        while pos < len(gval):
                            cmd, pos = _read_varint(gval, pos)
                            cid, cnt = cmd & 7, cmd >> 3
                            if cid == M.MOVE_TO:
                                for _ in range(cnt):
                                    dx, pos = _read_varint(gval, pos)
                                    dy, pos = _read_varint(gval, pos)
                                    cx += _unzigzag(dx)
                                    cy += _unzigzag(dy)
                                    cur = [(cx, cy)]
                                    paths.append(cur)
                            elif cid == M.LINE_TO:
                                for _ in range(cnt):
                                    dx, pos = _read_varint(gval, pos)
                                    dy, pos = _read_varint(gval, pos)
                                    cx += _unzigzag(dx)
                                    cy += _unzigzag(dy)
                                    cur.append((cx, cy))
                            elif cid == M.CLOSE_PATH:
                                cur.append(cur[0])
                            else:
                                raise AssertionError(f"bad cmd {cid}")
                        feat["coords"] = paths
                feats.append(feat)
        for feat in feats:                  # resolve interned tags
            feat["props"] = {
                keys[feat["tags"][i]]: values[feat["tags"][i + 1]]
                for i in range(0, len(feat["tags"]), 2)}
        layers[name] = {"version": version, "extent": extent,
                        "features": feats, "keys": keys,
                        "values": values}
    return layers


# ---- tests ----------------------------------------------------------------

def test_point_roundtrip_position():
    lon, lat = 11.3, 47.7
    z, x, y = 6, 34, 22
    payload = M.encode_tile(z, x, y, {"pts": [(7, G.wkb_point(lon, lat))]})
    decoded = decode_tile(payload)
    layer = decoded["pts"]
    assert layer["version"] == 2 and layer["extent"] == M.EXTENT
    f = layer["features"][0]
    assert f["id"] == 7 and f["type"] == M.GEOM_POINT
    (px, py) = f["coords"][0][0]
    assert (px, py) == M.tile_local(lon, lat, z, x, y)
    # sanity of the transform itself (inside-tile point -> [0, extent))
    n = 1 << z
    assert math.floor((lon + 180) / 360 * n) == x
    assert 0 <= px < M.EXTENT


def test_linestring_and_polygon_commands():
    z, x, y = 2, 2, 1
    line = G.wkb_linestring([(10.0, 10.0), (12.0, 12.0), (15.0, 11.0)])
    ring = [(10.0, 10.0), (14.0, 10.0), (14.0, 14.0), (10.0, 14.0),
            (10.0, 10.0)]
    poly = G.wkb_polygon([ring])
    payload = M.encode_tile(z, x, y, {
        "lines": [(1, line)], "polys": [(2, poly)]})
    decoded = decode_tile(payload)

    lf = decoded["lines"]["features"][0]
    assert lf["type"] == M.GEOM_LINESTRING
    assert len(lf["coords"][0]) == 3

    pf = decoded["polys"]["features"][0]
    assert pf["type"] == M.GEOM_POLYGON
    # ClosePath re-closed the ring: first == last, 4 distinct vertices
    coords = pf["coords"][0]
    assert coords[0] == coords[-1]
    assert len(coords) == 5


def _shoelace2(pts):
    return sum(x1 * y2 - x2 * y1
               for (x1, y1), (x2, y2) in zip(pts, pts[1:]))


def test_polygon_winding_normalized():
    """MVT 2.1: exterior rings CW on screen (positive y-down shoelace),
    holes CCW — regardless of the input WKB's winding.  Decoders key
    hole-attachment on this, so reversed input must be re-wound."""
    z, x, y = 0, 0, 0
    outer_ccw = [(10.0, 10.0), (40.0, 10.0), (40.0, 40.0), (10.0, 40.0),
                 (10.0, 10.0)]
    outer_cw = outer_ccw[::-1]
    hole_sml = [(20.0, 20.0), (25.0, 20.0), (25.0, 25.0), (20.0, 25.0),
                (20.0, 20.0)]
    for outer in (outer_ccw, outer_cw):
        for hole in (hole_sml, hole_sml[::-1]):
            payload = M.encode_tile(z, x, y, {
                "p": [(1, G.wkb_polygon([outer, hole]))]})
            rings = decode_tile(payload)["p"]["features"][0]["coords"]
            assert len(rings) == 2
            assert _shoelace2(rings[0]) > 0    # exterior: screen-CW
            assert _shoelace2(rings[1]) < 0    # hole: screen-CCW


def test_multipolygon_and_empty_dropped():
    z, x, y = 1, 1, 0
    payload = M.encode_tile(z, x, y, {
        "l": [(1, G.wkb_point(90.0, 40.0)), (2, b"\x01\xff")]})
    decoded = decode_tile(payload)
    assert len(decoded["l"]["features"]) == 1   # garbage WKB dropped


def test_build_tiles_mvt_end_to_end(spark):
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators import pmtiles as P
    from geohub_data_pipeline_spark.operators import tiling as TLG

    feats = spark.createDataFrame(
        [("d", "roads", i, G.wkb_point(-120.0 + i * 10, 30.0 + i), 4326)
         for i in range(6)],
        "dataset string, layer string, fid long, geometry binary, srid int")
    tiles = TLG.build_tiles(G.normalize_features(feats), maxzoom=2,
                            encode="mvt")
    rows = tiles.collect()
    assert all(len(bytes(r.payload)) > 0 for r in rows)
    z0 = next(r for r in rows if r.z == 0)
    decoded = decode_tile(bytes(z0.payload))
    assert [f["id"] for f in decoded["roads"]["features"]] == list(range(6))
    # every decoded point is inside the tile-local coordinate space
    for f in decoded["roads"]["features"]:
        (px, py) = f["coords"][0][0]
        assert -M.EXTENT <= px <= 2 * M.EXTENT   # small buffer allowed


def test_feature_properties_interned():
    """MVT 2.1 §4.4: properties become layer keys/values tables with
    per-feature tag index pairs — shared values interned once."""
    p1 = G.wkb_point(10.0, 20.0)
    p2 = G.wkb_point(11.0, 21.0)
    blob = M.encode_tile(1, 1, 0, {"pois": [
        (1, p1, {"name": "cafe", "rank": 3, "open": True,
                 "score": 0.5}),
        (2, p2, {"name": "bar", "rank": 3}),
    ]})
    layers = decode_tile(blob)
    feats = {f["id"]: f for f in layers["pois"]["features"]}
    assert feats[1]["props"] == {"name": "cafe", "rank": 3,
                                 "open": True, "score": 0.5}
    assert feats[2]["props"] == {"name": "bar", "rank": 3}
    # value 3 interned once across both features
    assert layers["pois"]["values"].count(3) == 1
    # featureless-properties encoding still valid
    blob2 = M.encode_tile(1, 1, 0, {"pois": [(1, p1)]})
    assert decode_tile(blob2)["pois"]["features"][0]["props"] == {}


def test_build_tiles_properties_column(spark):
    """build_tiles(encode='mvt') carries a joined-back properties
    column into the tile payloads."""
    import json

    from geohub_data_pipeline_spark.operators import geometry as GG
    from geohub_data_pipeline_spark.operators import tiling as T

    feats = spark.createDataFrame(
        [("d", "l", 1, GG.wkb_point(10.0, 20.0), 4326,
          '{"name":"x","rank":7}')],
        "dataset string, layer string, fid long, geometry binary, "
        "srid int, properties string")
    norm = GG.normalize_features(feats).join(
        feats.select("dataset", "layer", "fid", "properties"),
        ["dataset", "layer", "fid"])
    tiles = T.build_tiles(norm, maxzoom=1, encode="mvt").collect()
    assert tiles
    decoded = decode_tile(bytes(tiles[0].payload))
    assert decoded["l"]["features"][0]["props"] == {"name": "x",
                                                    "rank": 7}


def test_engine_decoder_roundtrip(spark, tmp_path):
    """The engine's own decode_mvt/features_from_tiles inverts the
    encoder: build a PMTiles archive from features, read it back
    through the pmtiles source + decoder, and recover geometry types,
    properties and (quantization-bounded) positions."""
    from geohub_data_pipeline_spark.operators import geometry as GG
    from geohub_data_pipeline_spark.operators import mvt as M
    from geohub_data_pipeline_spark.operators import pmtiles as PMT
    from geohub_data_pipeline_spark.operators import tiling as TLG

    feats = spark.createDataFrame(
        [("d", "towns", 1,
          GG.promote_to_multi(GG.wkb_point(13.4, 52.5)), 4326,
          GG.MULTIPOINT, 13.4, 52.5, 13.4, 52.5,
          '{"name":"berlin","pop":3600000}')],
        "dataset string, layer string, fid long, geometry binary, "
        "srid int, geom_type int, bbox_minx double, bbox_miny double, "
        "bbox_maxx double, bbox_maxy double, properties string")
    tiles = TLG.build_tiles(feats, maxzoom=4, encode="mvt")
    manifest = PMT.write_pmtiles_tables(
        tiles, str(tmp_path), payload_format="mvt").collect()
    assert manifest

    from geohub_data_pipeline_spark.sources import pmtiles_source as DS
    DS.register(spark)
    back = (spark.read.format("pmtiles")
            .option("path", manifest[0].path).load())
    out = M.features_from_tiles(back.filter("z = 4")).collect()
    assert len(out) == 1
    r = out[0]
    assert r.layer == "towns"
    g = GG.parse_wkb(bytes(r.geometry))
    assert g["type"] == GG.POINT
    # quantization error at z4 extent 4096: ~360/(16*4096) deg
    assert abs(g["coords"][0] - 13.4) < 0.01
    assert abs(g["coords"][1] - 52.5) < 0.01
    props = json.loads(r.properties)
    assert props["name"] == "berlin" and props["pop"] == 3600000
    assert props["_z"] == 4


def test_engine_decoder_polygon_winding(spark):
    """Polygon with a hole survives encode->decode: exterior/interior
    grouping by tile-coord winding."""
    from geohub_data_pipeline_spark.operators import geometry as GG
    from geohub_data_pipeline_spark.operators import mvt as M

    shell = [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0),
             (0.0, 0.0)]
    hole = [(5.0, 5.0), (5.0, 10.0), (10.0, 10.0), (10.0, 5.0),
            (5.0, 5.0)]
    wkb = GG.wkb_polygon([shell, hole])
    enc = M.encode_tile(2, 2, 1, {"zones": [(7, wkb)]})
    layers = M.decode_mvt(enc)
    f = layers["zones"]["features"][0]
    assert f["type"] == M.GEOM_POLYGON
    assert len(f["parts"]) == 2
    signs = [M._shoelace_signed(p) for p in f["parts"]]
    assert signs[0] > 0 and signs[1] < 0   # exterior CW (y-down)


def test_decoder_negative_int_value_and_absent_id(spark):
    """Spec fields the engine encoder never emits: int_value (field
    4, two's complement) and an absent Feature.id — both must decode
    correctly from external tiles."""
    from geohub_data_pipeline_spark.operators import mvt as M

    # hand-build a layer: value with int_value -5, feature WITHOUT id
    v_neg = M._varint((4 << 3) | 0) + M._varint((-5) & ((1 << 64) - 1))
    value_msg = M._field_bytes(4, v_neg)
    geom = M._field_bytes(4, b"".join(
        M._varint(t) for t in [M._cmd(M.MOVE_TO, 1),
                               M._zigzag(100), M._zigzag(200)]))
    feat = (M._field_bytes(2, M._varint(0) + M._varint(0))  # tags k0 v0
            + M._field_varint(3, M.GEOM_POINT) + geom)
    layer = (M._field_varint(15, 2) + M._field_bytes(1, b"ext")
             + M._field_bytes(2, feat) + M._field_bytes(3, b"count")
             + value_msg + M._field_varint(5, M.EXTENT))
    tile = M._field_bytes(3, layer)

    layers = M.decode_mvt(tile)
    f = layers["ext"]["features"][0]
    assert f["id"] is None                 # absent, not 0
    assert f["props"]["count"] == -5       # two's complement decoded

    df = spark.createDataFrame(
        [("d", 3, 1, 1, bytearray(tile))],
        "dataset string, z int, x int, y int, payload binary")
    rows = M.features_from_tiles(df).collect()
    assert len(rows) == 1
    assert 0 < rows[0].fid < (1 << 63)     # synthesized, join-safe


def test_archive_member_fids_encode_to_tiles(spark, tmp_path):
    """Member-scoped hash fids are positive by construction, so an
    archive of GPX members flows end-to-end into MVT tiles (negative
    fids would crash the uint varint encoder)."""
    import zipfile

    from geohub_data_pipeline_spark import processing as PROC

    gpx = (b'<?xml version="1.0"?>'
           b'<gpx xmlns="http://www.topografix.com/GPX/1/1">'
           b'<wpt lat="50" lon="10"><name>w</name></wpt></gpx>')
    z = tmp_path / "trips.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("a.gpx", gpx)
        zf.writestr("b.gpx", gpx)
    out = PROC.process_geo_file(spark, str(z), str(tmp_path / "o"))
    assert any(a.endswith(".pmtiles") for a in out["artifacts"])


def test_merge_tile_fragments_roundtrip(spark, tmp_path):
    """A polygon spanning several z4 tiles re-ingests as ONE feature
    row (not one per covering tile): the encoder ships the full
    geometry to every covering tile on the same global pixel grid,
    so copies are bit-identical and merge_tile_fragments collapses
    them exactly.  feature count out == feature count in."""
    from geohub_data_pipeline_spark.operators import geometry as GG
    from geohub_data_pipeline_spark.operators import mvt as M
    from geohub_data_pipeline_spark.operators import pmtiles as PMT
    from geohub_data_pipeline_spark.operators import tiling as TLG

    # ~40 x 30 degree polygon: spans 2+ tiles in each axis at z4
    ring = [(-10.0, -5.0), (30.0, -5.0), (30.0, 25.0),
            (-10.0, 25.0), (-10.0, -5.0)]
    feats = spark.createDataFrame(
        [("d", "zones", 7, GG.promote_to_multi(GG.wkb_polygon([ring])),
          4326, GG.MULTIPOLYGON, -10.0, -5.0, 30.0, 25.0,
          '{"name":"big"}'),
         ("d", "zones", 8, GG.promote_to_multi(
             GG.wkb_point(100.25, 40.25)),
          4326, GG.MULTIPOINT, 100.25, 40.25, 100.25, 40.25,
          '{"name":"pt"}')],
        "dataset string, layer string, fid long, geometry binary, "
        "srid int, geom_type int, bbox_minx double, bbox_miny double, "
        "bbox_maxx double, bbox_maxy double, properties string")
    tiles = TLG.build_tiles(feats, maxzoom=4, encode="mvt")
    manifest = PMT.write_pmtiles_tables(
        tiles, str(tmp_path), payload_format="mvt").collect()

    from geohub_data_pipeline_spark.sources import pmtiles_source as DS
    DS.register(spark)
    back = (spark.read.format("pmtiles")
            .option("path", manifest[0].path).load())
    frags = M.features_from_tiles(back.filter("z = 4"))
    n_frag = frags.count()
    assert n_frag > 2                      # polygon rode many tiles

    merged = M.merge_tile_fragments(frags).collect()
    assert len(merged) == 2                # == input feature count
    by_fid = {r.fid: r for r in merged}
    assert by_fid[7].n_tiles > 1 and by_fid[8].n_tiles == 1
    assert json.loads(by_fid[7].properties) == {"name": "big"}
    g = GG.parse_wkb(bytes(by_fid[7].geometry))
    assert g["type"] in (GG.POLYGON, GG.MULTIPOLYGON)
    # quantization-bounded bbox round-trip
    c = [xy for part in g["parts"] for xy in part]
    xs, ys = c[0::2], c[1::2]
    assert abs(min(xs) - -10.0) < 0.05 and abs(max(xs) - 30.0) < 0.05
    assert abs(min(ys) - -5.0) < 0.05 and abs(max(ys) - 25.0) < 0.05


def test_weld_clipped_fragments_recovers_features(spark):
    """A synthetically CLIPPED archive (tippecanoe-style: every tile
    carries only its clip of the geometry) welds back to one row per
    original feature: fragment count, exact area, closed borders."""
    import json as _json
    import math

    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.operators import mvt as MVT

    z = 3
    n = 1 << z

    def lat_of_row(wy):
        return math.degrees(math.atan(
            math.sinh(math.pi * (1 - 2 * wy / n))))

    def rect(x0, y0, x1, y1):
        return G.wkb_polygon([[(x0, y0), (x1, y0), (x1, y1),
                               (x0, y1), (x0, y0)]])

    def clipped_rows(fid, lon0, lon1, lat0, lat1):
        """Clip the rect at z-level tile borders, one row per tile."""
        rows = []
        for tx in range(n):
            w = tx / n * 360.0 - 180.0
            e = (tx + 1) / n * 360.0 - 180.0
            cx0, cx1 = max(lon0, w), min(lon1, e)
            if cx0 >= cx1:
                continue
            for ty in range(n):
                top, bot = lat_of_row(ty), lat_of_row(ty + 1)
                cy0, cy1 = max(lat0, bot), min(lat1, top)
                if cy0 >= cy1:
                    continue
                props = {"_z": z, "_x": tx, "_y": ty, "name": "r"}
                rows.append(("d", "l", fid,
                             rect(cx0, cy0, cx1, cy1), 4326, None,
                             _json.dumps(props, sort_keys=True)))
        return rows

    # rect A spans one vertical border (lon 45 at z=3); rect B spans
    # a horizontal border (lat_of_row(3) ~ 40.98); rect C inside one
    # tile (no clipping)
    rows = (clipped_rows(1, 40.0, 50.0, 10.0, 20.0)
            + clipped_rows(2, 10.0, 20.0, 35.0, 45.0)
            + clipped_rows(3, 50.0, 55.0, 10.0, 15.0))
    feats = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, "
              "geometry binary, srid int, crs_wkt string, "
              "properties string")
    out = {r.fid: r for r in
           MVT.weld_clipped_fragments(feats).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_fragments == 2 and out[2].n_fragments == 2
    assert out[3].n_fragments == 1
    assert all(r.n_open == 0 for r in out.values())
    assert all(_json.loads(r.properties) == {"name": "r"}
               for r in out.values())

    def area(wkb):
        from geohub_data_pipeline_spark.operators import spatial as SP
        tot = 0.0
        for ring in SP._rings_of_wkb(bytes(wkb)):
            tot += G._ring_area2([(float(x), float(y))
                                  for x, y in ring]) / 2.0
        return tot

    assert abs(area(out[1].geometry) - 100.0) < 1e-9
    assert abs(area(out[2].geometry) - 100.0) < 1e-9
    assert abs(area(out[3].geometry) - 25.0) < 1e-9


def test_weld_passes_through_points_and_lines(spark):
    """Non-polygon rows (points, lines, null geometry) route AROUND
    the dissolve: one output row per input row, n_fragments = 1,
    n_open = 0, provenance stripped — alongside welded polygons
    (r7 ADVICE high: the inner attrs->merged join used to drop every
    non-polygon feature)."""
    import json as _json

    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.operators import mvt as MVT

    def props(name):
        return _json.dumps({"_z": 3, "_x": 5, "_y": 3, "name": name},
                           sort_keys=True)

    poly = G.wkb_polygon([[(50.0, 10.0), (55.0, 10.0), (55.0, 15.0),
                           (50.0, 15.0), (50.0, 10.0)]])
    rows = [
        ("d", "l", 1, poly, 4326, None, props("poly")),
        ("d", "l", 2, G.wkb_point(51.0, 11.0), 4326, None,
         props("pt")),
        ("d", "l", 3, G.wkb_linestring([(50.5, 10.5), (54.0, 14.0)]),
         4326, None, props("ln")),
        ("d", "l", 4, None, 4326, None, props("null")),
    ]
    feats = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, "
              "geometry binary, srid int, crs_wkt string, "
              "properties string")
    out = {r.fid: r for r in
           MVT.weld_clipped_fragments(feats).collect()}
    assert set(out) == {1, 2, 3, 4}
    for fid in (2, 3, 4):
        assert out[fid].n_fragments == 1
        assert out[fid].n_open == 0
        d = _json.loads(out[fid].properties)
        assert "_z" not in d and "_x" not in d and "_y" not in d
    # geometry bytes of the pass-through rows are untouched
    assert bytes(out[2].geometry) == G.wkb_point(51.0, 11.0)
    assert bytes(out[3].geometry) == G.wkb_linestring(
        [(50.5, 10.5), (54.0, 14.0)])
    assert out[4].geometry is None
    assert out[1].n_fragments == 1 and out[1].n_open == 0
