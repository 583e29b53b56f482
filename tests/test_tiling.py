"""Tile pyramid tests (T8/T9 analog) incl. the FIXTURES.md property:
every feature's bbox intersects its assigned tile's bbox at every
zoom."""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators import tiling as TLG


def _normalized(spark, n=40, layer="l1", dataset="d1"):
    rows = []
    for i in range(n):
        lon = -170.0 + (i * 8.7) % 340.0
        lat = -80.0 + (i * 5.3) % 160.0
        rows.append((dataset, layer, i, G.wkb_point(lon, lat), 4326))
    df = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, geometry binary, "
              "srid int")
    return G.normalize_features(df)


def _tile_bounds(z, x, y):
    n = 2 ** z
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0

    def lat_of(yy):
        t = math.pi * (1 - 2 * yy / n)
        return math.degrees(math.atan(math.sinh(t)))

    return lon0, lat_of(y + 1), lon1, lat_of(y)


def test_every_feature_lands_in_intersecting_tile(spark):
    norm = _normalized(spark)
    keyed = TLG.tile_keys(norm.withColumn("maxzoom", F.lit(5)))
    rows = keyed.select("fid", "z", "x", "y",
                        "bbox_minx", "bbox_miny").collect()
    assert len(rows) > 0
    eps = 1e-9
    for r in rows:
        lon0, lat0, lon1, lat1 = _tile_bounds(r.z, r.x, r.y)
        assert lon0 - eps <= r.bbox_minx <= lon1 + eps, r
        assert lat0 - eps <= r.bbox_miny <= lat1 + eps, r


def test_point_hits_exactly_one_tile_per_zoom(spark):
    norm = _normalized(spark, n=25)
    keyed = TLG.tile_keys(norm.withColumn("maxzoom", F.lit(4)))
    per = (keyed.groupBy("fid", "z").count().collect())
    assert all(r["count"] == 1 for r in per)
    zs = {r.z for r in per}
    assert zs == {0, 1, 2, 3, 4}


def test_build_tiles_payload_and_audit(spark):
    norm = _normalized(spark, n=30)
    tiles = TLG.build_tiles(norm, maxzoom=3)
    collected = tiles.collect()
    # z0 holds every feature in one tile
    z0 = [t for t in collected if t.z == 0]
    assert len(z0) == 1 and z0[0].n_features == 30
    # payloads are deterministic json with sorted fids
    body = json.loads(bytes(z0[0].payload))
    fids = [f["fid"] for f in body["features"]]
    assert fids == sorted(fids) and len(fids) == 30

    audit = {(r.layer, r.z): r for r in TLG.tile_audit(tiles).collect()}
    # tilestats invariant: every zoom has tiles, every tile nonempty
    for z in range(4):
        a = audit[("l1", z)]
        assert a.n_tiles >= 1 and a.min_features_per_tile >= 1
        assert a.n_features == 30   # points: each feature in exactly 1 tile


def test_zoom_heuristic_monotone():
    assert TLG.zoom_for_feature_count(1) == 0
    assert TLG.zoom_for_feature_count(5) == 2
    zs = [TLG.zoom_for_feature_count(n) for n in (1, 10, 100, 10_000)]
    assert zs == sorted(zs)


def test_joined_mode_single_pyramid(spark):
    l1 = _normalized(spark, n=10, layer="a")
    l2 = _normalized(spark, n=10, layer="b")
    tiles = TLG.build_tiles_joined([l1, l2], maxzoom=2)
    z0 = tiles.filter("z = 0").collect()
    # one tile per layer at z0, same archive (T9 --named-layer analog)
    assert sorted(t.layer for t in z0) == ["a", "b"]
    assert all(t.n_features == 10 for t in z0)


def test_feature_drop_cap(spark):
    norm = _normalized(spark, n=30)
    tiles = TLG.build_tiles(norm, maxzoom=1, max_features_per_tile=7)
    assert tiles.agg(F.max("n_features")).first()[0] <= 7


def test_build_tiles_with_low_zoom_simplification(spark):
    """Low-zoom tiles carry simplified geometry (smaller payload);
    high-zoom tiles keep full detail (--simplify-only-low-zooms)."""
    import math
    wiggly = [(i * 0.002, 0.0005 * math.sin(i)) for i in range(400)]
    df = spark.createDataFrame(
        [("d", "l", 1, G.wkb_linestring(wiggly), 4326)],
        "dataset string, layer string, fid long, geometry binary, srid int")
    norm = G.normalize_features(df)
    plain = TLG.build_tiles(norm, maxzoom=11)
    simp = TLG.build_tiles(norm, maxzoom=11, simplify_low_zooms=True,
                           full_detail_zoom=10)
    # payload hashes differ at low zooms (geometry was rewritten)...
    plain_h = {t.z: t.payload_hash for t in plain.collect()}
    simp_h = {t.z: t.payload_hash for t in simp.collect()}
    assert simp_h[0] != plain_h[0]
    # ...but full-detail zooms are byte-identical
    assert simp_h[11] == plain_h[11]
    assert simp_h[10] == plain_h[10]


def test_shared_border_stats_adjacent_squares(spark):
    """Two side-by-side unit squares share exactly one edge; an
    isolated square shares none; ring orientation must not matter."""
    from geohub_data_pipeline_spark.operators.tiling import (
        shared_border_stats)

    def sq(fid, x, y, ccw=True):
        ring = [(x, y), (x + 1, y), (x + 1, y + 1), (x, y + 1), (x, y)]
        if not ccw:
            ring = ring[::-1]
        return (fid, [{"x": float(px), "y": float(py)}
                      for px, py in ring])

    feats = spark.createDataFrame(
        [sq(1, 0, 0), sq(2, 1, 0, ccw=False), sq(3, 10, 10)],
        "feature_id long, ring array<struct<x double, y double>>")
    got = {r.feature_id: r for r in shared_border_stats(feats).collect()}
    assert got[1].n_edges == 4 and got[1].n_shared == 1
    assert got[2].n_edges == 4 and got[2].n_shared == 1
    assert got[3].n_edges == 4 and got[3].n_shared == 0
    assert got[1].shared_fraction == 0.25


def test_point_drop_rate_gamma(spark):
    """tippecanoe point-dropping gamma: at zoom z < maxzoom each
    point survives with deterministic 'probability'
    1/rate**(maxzoom-z); maxzoom keeps everything; non-points are
    never dropped; the kept set is nested across zooms (a point
    dropped at z is also dropped below z)."""
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.operators.tiling import build_tiles

    n = 4000
    rows = [("d", "pts", i,
             G.promote_to_multi(G.wkb_point(-170 + (i % 340) * 0.9,
                                            -80 + (i * 7 % 160) * 0.9)),
             4, 4326,
             -170 + (i % 340) * 0.9, -80 + (i * 7 % 160) * 0.9,
             -170 + (i % 340) * 0.9, -80 + (i * 7 % 160) * 0.9, False)
            for i in range(n)]
    norm = spark.createDataFrame(rows, (
        "dataset string, layer string, fid long, geometry binary, "
        "geom_type int, srid int, bbox_minx double, bbox_miny double, "
        "bbox_maxx double, bbox_maxy double, needs_makevalid boolean"))

    tiles = build_tiles(norm, maxzoom=4, point_drop_rate=2.5)
    per_z = {r.z: r.total for r in
             tiles.groupBy("z").agg(
                 F.sum("n_features").alias("total")).collect()}
    # maxzoom keeps all points
    assert per_z[4] == n
    # each zoom down keeps ~1/2.5 of the previous (hash-uniform)
    for z in (3, 2, 1, 0):
        expect = n / (2.5 ** (4 - z))
        assert abs(per_z[z] - expect) < 0.15 * n / (2.5 ** (4 - z)) + 30, \
            (z, per_z[z], expect)
    # determinism: same input -> same pyramid
    again = {r.z: r.total for r in
             build_tiles(norm, maxzoom=4, point_drop_rate=2.5)
             .groupBy("z").agg(
                 F.sum("n_features").alias("total")).collect()}
    assert again == per_z
    # default: no dropping
    full = {r.z: r.total for r in
            build_tiles(norm, maxzoom=4).groupBy("z").agg(
                F.sum("n_features").alias("total")).collect()}
    assert all(v == n for v in full.values())


def test_hex_cols_nearest_center(spark):
    """Cube rounding must assign every point to the NEAREST hex
    center — verified against the 7-cell neighborhood for a lattice
    of points, plus containment within the circumradius."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.functions import tiles as TL

    s = 3.25
    pts = spark.range(500).select(
        (-19.95 + ((F.col("id") * 13) % 400).cast("double") / 10.0)
        .alias("lon"),
        (-19.95 + ((F.col("id") * 7) % 400).cast("double") / 10.0)
        .alias("lat"))
    rows = pts.select(
        "lon", "lat",
        *TL.hex_cols(F.col("lon"), F.col("lat"), s)).collect()

    def center(q, r):
        return (s * 1.5 * q,
                s * (math.sqrt(3.0) / 2.0 * q + math.sqrt(3.0) * r))

    neigh = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1),
             (-1, 1)]
    for r0 in rows:
        cx, cy = center(r0.hex_q, r0.hex_r)
        d0 = np.hypot(r0.lon - cx, r0.lat - cy)
        assert d0 <= s + 1e-9
        for dq, dr in neigh[1:]:
            nx, ny = center(r0.hex_q + dq, r0.hex_r + dr)
            assert d0 <= np.hypot(r0.lon - nx, r0.lat - ny) + 1e-9


def test_batched_encoder_byte_parity_with_per_group(spark):
    """r11 optimization pin: build_tiles' batched mapInPandas encoder
    must emit byte-identical payloads to the legacy per-group
    encoders (_encode_tile / _encode_tile_mvt) for the same capped
    feature groups — the rewrite moved WHERE encoding happens (one
    batch of many tiles vs one pandas frame per tile), never WHAT is
    encoded."""
    import pandas as pd

    norm = _normalized(spark, n=30)
    for encode, legacy in (("json", TLG._encode_tile),
                           ("mvt", TLG._encode_tile_mvt)):
        tiles = {(t.z, t.x, t.y, t.layer): t
                 for t in TLG.build_tiles(norm, maxzoom=2,
                                          encode=encode).collect()}
        keyed = TLG.tile_keys(norm.withColumn("maxzoom", F.lit(2)))
        groups = (keyed.select("z", "x", "y", "layer", "fid",
                               "geometry").toPandas()
                  .groupby(["z", "x", "y", "layer"]))
        assert len(tiles) == len(groups)
        for key, gpdf in groups:
            want = legacy(pd.DataFrame(gpdf)).iloc[0]
            got = tiles[key]
            assert bytes(got.payload) == bytes(want["payload"]), key
            assert got.payload_hash == want["payload_hash"], key
            assert got.n_features == want["n_features"], key
