"""PMTiles v3 archive round-trip tests (T8/T9 output + S11/S12 reads)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators import pmtiles as P
from geohub_data_pipeline_spark.operators import tiling as TLG


def test_hilbert_tileid_roundtrip():
    cases = [(0, 0, 0), (1, 0, 0), (1, 1, 1), (5, 17, 12), (12, 4095, 17),
             (3, 7, 7)]
    seen = set()
    for z, x, y in cases:
        tid = P.zxy_to_tileid(z, x, y)
        assert P.tileid_to_zxy(tid) == (z, x, y)
        assert tid not in seen
        seen.add(tid)
    # spec anchor points: z0 -> id 0; z1 starts at 1
    assert P.zxy_to_tileid(0, 0, 0) == 0
    assert {P.zxy_to_tileid(1, x, y) for x in (0, 1) for y in (0, 1)} == \
        {1, 2, 3, 4}


def test_varint_directory_roundtrip():
    entries = [(0, 0, 10, 1), (5, 10, 200, 1), (1000, 210, 7, 1),
               (2 ** 40, 217, 123456, 1)]
    assert P._parse_directory(P._serialize_directory(entries)) == entries


def test_archive_roundtrip():
    tiles = [
        (0, 0, 0, b'{"all":1}'),
        (1, 0, 0, b'{"q":0}'),
        (1, 1, 1, b'{"q":3}'),
        (2, 2, 1, b'{"q":0}'),       # duplicate payload -> deduped content
    ]
    meta = {"name": "t", "vector_layers": [{"id": "roads"}]}
    path = "/tmp/test_rt.pmtiles"
    P.write_pmtiles(path, tiles, meta)
    back = P.read_pmtiles(path)
    assert back["metadata"] == meta
    assert back["min_zoom"] == 0 and back["max_zoom"] == 2
    assert back["n_tile_entries"] == 4
    assert back["n_tile_contents"] == 3       # {"q":0} stored once
    assert back["clustered"]
    for z, x, y, payload in tiles:
        assert back["tiles"][(z, x, y)] == payload
    assert P.pmtiles_layer_names(path) == ["roads"]


def test_archive_zstd_roundtrip(tmp_path):
    """compress='zstd' writes spec compression id 4 with genuine
    RFC 8878 frames; reader and the pushdown source both decode it."""
    from geohub_data_pipeline_spark.functions import compression as CMP

    tiles = [(0, 0, 0, b'{"all":1}'), (1, 1, 0, b'{"q":1}' * 50)]
    meta = {"name": "z"}
    path = str(tmp_path / "z.pmtiles")
    P.write_pmtiles(path, tiles, meta, compress="zstd")
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[97] == P.COMPRESSION_ZSTD      # internal compression
    assert buf[98] == P.COMPRESSION_ZSTD      # tile compression
    # root directory bytes are a real zstd frame, not renamed gzip
    root_off = int.from_bytes(buf[8:16], "little")
    assert buf[root_off:root_off + 4] == CMP.ZSTD_MAGIC
    back = P.read_pmtiles(path)
    assert back["metadata"] == meta
    for z, x, y, payload in tiles:
        assert back["tiles"][(z, x, y)] == payload


def test_spark_tiles_to_archive(spark, tmp_path):
    """Full path: WKB features -> tile pyramid -> one PMTiles archive
    per dataset with tilestats metadata (the audit surface)."""
    rows = [("d1", layer, i + off, G.wkb_point(-150.0 + i * 30.0, 10.0 + i),
             4326)
            for layer, off in (("roads", 0), ("zones", 100))
            for i in range(8)]
    feats = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, geometry binary, "
              "srid int")
    tiles = TLG.build_tiles(G.normalize_features(feats), maxzoom=3) \
        .withColumn("dataset", F.lit("d1"))
    manifest = P.write_pmtiles_tables(tiles, str(tmp_path)).collect()
    assert len(manifest) == 1
    m = manifest[0]
    assert m.n_layers == 2 and m.min_zoom == 0 and m.max_zoom == 3

    back = P.read_pmtiles(m.path)
    # tilestats audit invariant (T17): layerCount present and > 0
    stats = back["metadata"]["tilestats"]
    assert stats["layerCount"] == 2
    assert all(lyr["count"] > 0 for lyr in stats["layers"])
    assert P.pmtiles_layer_names(m.path) == ["roads", "zones"]
    # the z0 tile merges both layers into one payload
    z0 = json.loads(back["tiles"][(0, 0, 0)])
    assert set(z0["layers"]) == {"roads", "zones"}
    assert len(z0["layers"]["roads"]["features"]) == 8


def test_mvt_pmtiles_archive(spark, tmp_path):
    """Full renderable path: WKB -> MVT tiles -> PMTiles(type=MVT);
    multi-layer tiles decode with both layers present."""
    from tests.test_mvt import decode_tile

    rows = [("d2", layer, i + off,
             G.wkb_point(-60.0 + i * 15.0, -20.0 + i * 8.0), 4326)
            for layer, off in (("roads", 0), ("pois", 50))
            for i in range(5)]
    feats = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, geometry binary, "
              "srid int")
    tiles = TLG.build_tiles(G.normalize_features(feats), maxzoom=2,
                            encode="mvt").withColumn("dataset", F.lit("d2"))
    m = P.write_pmtiles_tables(tiles, str(tmp_path),
                               payload_format="mvt").collect()[0]
    back = P.read_pmtiles(m.path)
    decoded = decode_tile(back["tiles"][(0, 0, 0)])
    assert set(decoded) == {"pois", "roads"}
    assert len(decoded["roads"]["features"]) == 5
    assert len(decoded["pois"]["features"]) == 5
    with open(m.path, "rb") as f:
        assert f.read()[99] == 1     # header tile_type = MVT


def test_run_length_coalescing(tmp_path):
    """Dense identical tiles collapse to one directory entry + one
    content blob; reader expands the run back out."""
    tiles = [(6, x, y, b"SAME") for x in range(64) for y in range(64)]
    path = str(tmp_path / "run.pmtiles")
    P.write_pmtiles(path, tiles, {"name": "run"})
    back = P.read_pmtiles(path)
    assert back["n_addressed_tiles"] == 4096
    assert back["n_tile_entries"] == 1
    assert back["n_tile_contents"] == 1
    assert len(back["tiles"]) == 4096
    assert all(v == b"SAME" for v in back["tiles"].values())


def test_leaf_directory_spill(tmp_path):
    """Archives whose root directory would exceed the 16 KiB budget
    spill into leaf directories; reader follows the rl==0 pointers."""
    import struct

    tiles = []
    for z in (8, 9):
        n = 2 ** z
        for x in range(0, n, 3):
            for y in range(0, n, 5):
                # (x+y)%4 pattern: mix of shared and unique payloads
                payload = (b"COMMON" if (x + y) % 4
                           else f"{z}/{x}/{y}".encode())
                tiles.append((z, x, y, payload))
    assert len(tiles) > 20000
    path = str(tmp_path / "big.pmtiles")
    P.write_pmtiles(path, tiles, {"name": "big"})
    buf = open(path, "rb").read()
    root_off, root_len, _, _, leaf_off, leaf_len, _, _ = \
        struct.unpack_from("<QQQQQQQQ", buf, 8)
    assert root_len <= 16384 - P.HEADER_SIZE
    assert leaf_len > 0
    back = P.read_pmtiles(path)
    assert len(back["tiles"]) == len(tiles)
    for z, x, y, payload in tiles:
        assert back["tiles"][(z, x, y)] == payload
