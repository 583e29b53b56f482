"""Archive source tests: zip/gz/tar expansion, GeoJSON members to
feature rows, and a zipped multi-layer fixture through the full CLI
tile pipeline."""

from __future__ import annotations

import gzip
import io
import json
import os
import tarfile
import zipfile

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.sources import archive as A


def _geojson_layer(kind: str, n: int) -> bytes:
    feats = []
    for i in range(n):
        x = float(i) * 3.0 - 60.0
        y = float(i) * 2.0 - 20.0
        if kind == "points":
            geom = {"type": "Point", "coordinates": [x, y]}
        elif kind == "lines":
            geom = {"type": "LineString",
                    "coordinates": [[x, y], [x + 1, y + 1]]}
        else:
            geom = {"type": "Polygon", "coordinates": [[
                [x, y], [x + 1, y], [x + 1, y + 1], [x, y + 1], [x, y]]]}
        feats.append({"type": "Feature", "id": i + 1,
                      "geometry": geom, "properties": {"n": i}})
    return json.dumps(
        {"type": "FeatureCollection", "features": feats}).encode()


def _write_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("points.geojson", _geojson_layer("points", 5))
        zf.writestr("lines.geojson", _geojson_layer("lines", 4))
        zf.writestr("polys.geojson", _geojson_layer("polys", 3))
        zf.writestr("readme.txt", b"not a layer")


def test_zip_gz_tar_expansion(spark, tmp_path):
    _write_zip(str(tmp_path / "multi.zip"))
    with open(tmp_path / "single.geojson.gz", "wb") as f:
        f.write(gzip.compress(_geojson_layer("points", 2)))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        data = _geojson_layer("lines", 2)
        info = tarfile.TarInfo("nested/deep.geojson")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with open(tmp_path / "bundle.tgz", "wb") as f:
        f.write(buf.getvalue())

    members = A.read_archives(spark, str(tmp_path)).collect()
    by_member = {(os.path.basename(r.archive_path), r.member): r
                 for r in members}
    assert ("multi.zip", "points.geojson") in by_member
    assert ("multi.zip", "readme.txt") in by_member
    assert ("single.geojson.gz", "single.geojson") in by_member
    assert ("bundle.tgz", "nested/deep.geojson") in by_member

    # vsi paths mirror the reference's GDAL prefix registry
    r = by_member[("multi.zip", "points.geojson")]
    assert r.vsi_path.startswith("/vsizip/") \
        and r.vsi_path.endswith("multi.zip/points.geojson")
    assert by_member[("single.geojson.gz", "single.geojson")] \
        .vsi_path.startswith("/vsigzip/")
    assert by_member[("bundle.tgz", "nested/deep.geojson")] \
        .vsi_path.startswith("/vsitar/")

    # content round-trips exactly
    assert bytes(r.content) == _geojson_layer("points", 5)
    assert r.size == len(bytes(r.content))


def test_tar_gz_expands_members(spark, tmp_path):
    """`.tar.gz` must route to the tar branch (regression: splitext
    saw only `.gz` and gunzipped it into one opaque `.tar` member)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        data = _geojson_layer("polys", 3)
        info = tarfile.TarInfo("inner/layer.geojson")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with open(tmp_path / "bundle.tar.gz", "wb") as f:
        f.write(buf.getvalue())

    members = A.read_archives(spark, str(tmp_path / "bundle.tar.gz")).collect()
    assert [r.member for r in members] == ["inner/layer.geojson"]
    assert bytes(members[0].content) == _geojson_layer("polys", 3)
    assert members[0].vsi_path.startswith("/vsitar/")

    feats = A.features_from_archives(
        spark, str(tmp_path / "bundle.tar.gz")).collect()
    assert len(feats) == 3


def test_corrupt_archive_skipped(spark, tmp_path):
    with open(tmp_path / "broken.zip", "wb") as f:
        f.write(b"PK\x03\x04 garbage that is not a zip")
    _write_zip(str(tmp_path / "ok.zip"))
    members = A.read_archives(spark, str(tmp_path)).collect()
    assert {os.path.basename(r.archive_path) for r in members} == {"ok.zip"}


def test_geojson_members_to_features(spark, tmp_path):
    _write_zip(str(tmp_path / "multi.zip"))
    feats = A.features_from_archives(
        spark, str(tmp_path / "multi.zip")).collect()
    by_layer: dict = {}
    for r in feats:
        by_layer.setdefault(r.layer, []).append(r)
    assert {len(by_layer["points"]), len(by_layer["lines"]),
            len(by_layer["polys"])} == {5, 4, 3}
    assert {r.dataset for r in feats} == {"multi.zip"}
    assert {r.srid for r in feats} == {4326}
    # GeoJSON ids carried through; geometry decodes to the right type
    pts = sorted(by_layer["points"], key=lambda r: r.fid)
    assert [r.fid for r in pts] == [1, 2, 3, 4, 5]
    parsed = G.parse_wkb(bytes(pts[0].geometry))
    assert parsed["type"] == G.POINT and parsed["coords"] == [-60.0, -20.0]
    poly = G.parse_wkb(bytes(by_layer["polys"][0].geometry))
    assert poly["type"] == G.POLYGON


def test_wkb_from_geojson_all_types():
    cases = {
        "Point": {"type": "Point", "coordinates": [1.0, 2.0]},
        "MultiPoint": {"type": "MultiPoint",
                       "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
        "LineString": {"type": "LineString",
                       "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        "MultiLineString": {
            "type": "MultiLineString",
            "coordinates": [[[0.0, 0.0], [1.0, 1.0]],
                            [[2.0, 2.0], [3.0, 3.0]]]},
        "Polygon": {"type": "Polygon", "coordinates": [
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]},
        "MultiPolygon": {"type": "MultiPolygon", "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
            [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]]]},
    }
    want = {"Point": G.POINT, "MultiPoint": G.MULTIPOINT,
            "LineString": G.LINESTRING,
            "MultiLineString": G.MULTILINESTRING,
            "Polygon": G.POLYGON, "MultiPolygon": G.MULTIPOLYGON}
    for name, geom in cases.items():
        parsed = G.parse_wkb(G.wkb_from_geojson(geom))
        assert parsed is not None and parsed["type"] == want[name], name
    # malformed / unsupported -> None, never raises
    assert G.wkb_from_geojson({"type": "Point"}) is None
    assert G.wkb_from_geojson({"type": "GeometryCollection",
                               "geometries": []}) is None
    assert G.wkb_from_geojson({"type": "Nope", "coordinates": []}) is None


def test_zip_through_cli_tile_pipeline(spark, tmp_path):
    """T14 + archive reading: a zipped multi-layer GeoJSON fixture
    flows end-to-end through the CLI tile pipeline (tiles + audits +
    a real PMTiles archive)."""
    import pyspark.sql  # noqa: F401  (session alive for the CLI)
    from geohub_data_pipeline_spark import cli

    src = str(tmp_path / "upload.zip")
    _write_zip(src)
    dst = str(tmp_path / "out")
    rc = cli.main(["--src", src, "--dst", dst, "--maxzoom", "2"])
    assert rc == 0
    tiles = spark.read.parquet(f"{dst}/tiles")
    assert tiles.count() > 0
    audit = spark.read.parquet(f"{dst}/feature_audit").collect()
    status = {r.layer: r.audit_status for r in audit}
    # readme.txt is not a layer; all three geojson layers audit ok
    assert set(status) == {"points", "lines", "polys"}
    assert set(status.values()) == {"ok"}
    archives = os.listdir(f"{dst}/archives")
    assert any(a.endswith(".pmtiles") for a in archives)
