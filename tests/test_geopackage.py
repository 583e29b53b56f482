"""GeoPackage source tests: stdlib sqlite3 reader + spec blobs."""

from __future__ import annotations

import io
import struct
import zipfile

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.sources import archive as A
from geohub_data_pipeline_spark.sources import geopackage as GP


def _sample_gpkg(path, srid=4326):
    GP.write_gpkg(path, {
        "points": [(1, G.wkb_point(12.5, 41.9)),
                   (2, G.wkb_point(-3.7, 40.4)),
                   (7, None)],                       # NULL geometry
        "zones": [(1, G.wkb_polygon([[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0),
                                      (0.0, 1.0), (0.0, 0.0)]]))],
    }, srid=srid)


def test_gpkg_blob_roundtrip():
    wkb = G.wkb_point(1.5, -2.5)
    blob = b"GP\x00\x01" + struct.pack("<i", 4326) + wkb
    assert GP.parse_gpkg_blob(blob) == (4326, wkb)
    # envelope variant (XY, 32 bytes) skips the envelope
    blob_env = (b"GP\x00\x03" + struct.pack("<i", 3857)
                + struct.pack("<4d", 0, 0, 0, 0) + wkb)
    assert GP.parse_gpkg_blob(blob_env) == (3857, wkb)
    # empty-geometry flag -> None
    assert GP.parse_gpkg_blob(b"GP\x00\x11"
                              + struct.pack("<i", 4326) + wkb) is None
    # big-endian header ints
    blob_be = b"GP\x00\x00" + struct.pack(">i", 4326) + wkb
    assert GP.parse_gpkg_blob(blob_be) == (4326, wkb)
    import pytest
    with pytest.raises(ValueError):
        GP.parse_gpkg_blob(b"XX\x00\x01garbage....")


def test_features_from_gpkg(spark, tmp_path):
    _sample_gpkg(str(tmp_path / "data.gpkg"))
    out = GP.features_from_gpkg(spark, str(tmp_path / "data.gpkg")) \
        .collect()
    by_key = {(r.layer, r.fid): r for r in out}
    assert set(by_key) == {("points", 1), ("points", 2), ("points", 7),
                           ("zones", 1)}
    assert all(r.dataset == "data.gpkg" and r.srid == 4326 for r in out)
    p = G.parse_wkb(bytes(by_key[("points", 1)].geometry))
    assert p["type"] == G.POINT and p["coords"] == [12.5, 41.9]
    assert by_key[("points", 7)].geometry is None    # NULL preserved

    # corrupt gpkg quarantined, not a task failure
    with open(tmp_path / "broken.gpkg", "wb") as f:
        f.write(b"SQLite format 3\x00" + b"\x00" * 80)
    got = GP.features_from_gpkg(spark, str(tmp_path)).collect()
    assert {r.dataset for r in got} == {"data.gpkg"}


def test_gpkg_through_normalize(spark, tmp_path):
    """GPKG feature rows flow straight into the T7 normalize stage."""
    _sample_gpkg(str(tmp_path / "d.gpkg"), srid=4326)
    feats = GP.features_from_gpkg(spark, str(tmp_path / "d.gpkg"))
    norm = {(r.layer, r.fid): r
            for r in G.normalize_features(feats).collect()}
    # NULL geometry dropped by -skipfailures; the rest normalized
    assert set(norm) == {("points", 1), ("points", 2), ("zones", 1)}
    assert norm[("points", 1)].geom_type == G.MULTIPOINT
    assert norm[("zones", 1)].geom_type == G.MULTIPOLYGON


def test_zipped_gpkg_member(spark, tmp_path):
    """A .gpkg inside a .zip expands through the archive source."""
    _sample_gpkg(str(tmp_path / "inner.gpkg"), srid=3857)
    with open(tmp_path / "inner.gpkg", "rb") as f:
        gpkg_bytes = f.read()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("upload/inner.gpkg", gpkg_bytes)
    with open(tmp_path / "bundle.zip", "wb") as f:
        f.write(buf.getvalue())

    feats = A.features_from_archives(
        spark, str(tmp_path / "bundle.zip")).collect()
    assert {(r.layer, r.fid) for r in feats} == \
        {("points", 1), ("points", 2), ("points", 7), ("zones", 1)}
    assert all(r.srid == 3857 for r in feats)
    assert all(r.dataset == "bundle.zip" for r in feats)


def test_write_gpkg_preserves_attributes(tmp_path):
    """GPKG write->read round-trip carries typed attribute columns —
    the reference's ogr2ogr path copies fields by default (ref
    ingest/processing.py:138-159); a sink that drops the properties
    bag would lose them."""
    import json

    p = str(tmp_path / "attrs.gpkg")
    GP.write_gpkg(p, {
        "cities": [
            (1, G.wkb_point(12.5, 41.9),
             {"name": "roma", "pop": 2873000, "area_km2": 1285.3}),
            (2, G.wkb_point(-3.7, 40.4),
             json.dumps({"name": "madrid", "pop": 3223000})),
            (3, G.wkb_point(2.35, 48.85), None),   # no attributes
        ],
        # legacy 2-tuple form still writes
        "plain": [(1, G.wkb_point(0.0, 0.0))],
    }, srid=4326)

    rows = list(GP.read_gpkg_bytes(open(p, "rb").read(), "attrs.gpkg",
                                   with_props=True))
    by_layer_fid = {(r[1], r[2]): r for r in rows}
    roma = json.loads(by_layer_fid[("cities", 1)][5])
    assert roma == {"name": "roma", "pop": 2873000,
                    "area_km2": 1285.3}
    madrid = json.loads(by_layer_fid[("cities", 2)][5])
    assert madrid == {"name": "madrid", "pop": 3223000}
    assert by_layer_fid[("cities", 3)][5] is None
    assert by_layer_fid[("plain", 1)][5] is None
    # int stays int, float stays float through SQLite typing
    assert isinstance(roma["pop"], int)
    assert isinstance(roma["area_km2"], float)


def test_write_gpkg_tables_roundtrip(spark, tmp_path):
    """Distributed sink round-trip: FEATURE_SCHEMA rows -> one .gpkg
    per dataset (all layers) -> features_from_gpkg returns the same
    fid/geometry/properties; null geometry skipped, null fid kept
    (sqlite assigns)."""
    import json

    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.sources.flatgeobuf import (
        FEATURE_SCHEMA,
    )

    def pt(x, y):
        return G.wkb_from_geojson(
            {"type": "Point", "coordinates": [x, y]})

    rows = [
        ("d1", "roads", 1, pt(1.0, 2.0), 4326, None,
         json.dumps({"name": "a", "lanes": 2})),
        ("d1", "roads", 2, pt(3.0, 4.0), 4326, None,
         json.dumps({"name": "b", "lanes": 4})),
        ("d1", "poi", 7, pt(5.0, 6.0), 4326, None, None),
        ("d1", "poi", 8, None, 4326, None, None),     # skipped
        ("d2", "zones", 1, pt(-1.0, -2.0), 3857, None, None),
    ]
    feats = spark.createDataFrame(rows, FEATURE_SCHEMA)
    man = {r.dataset: r
           for r in GP.write_gpkg_tables(
               feats, str(tmp_path)).collect()}
    assert man["d1"].n_layers == 2 and man["d1"].n_features == 3
    assert man["d2"].n_features == 1

    back = GP.features_from_gpkg(
        spark, man["d1"].path).collect()
    by = {(r.layer, r.fid): r for r in back}
    assert set(by) == {("roads", 1), ("roads", 2), ("poi", 7)}
    assert bytes(by[("roads", 1)].geometry) == pt(1.0, 2.0)
    props = json.loads(by[("roads", 2)].properties)
    assert props["name"] == "b" and props["lanes"] == 4
    back2 = GP.features_from_gpkg(spark, man["d2"].path).collect()
    assert len(back2) == 1 and back2[0].srid == 3857


def test_write_gpkg_tables_per_layer_srid(spark, tmp_path):
    """One dataset with layers in DIFFERENT CRSs keeps each layer's
    srid in the registry tables and GP headers; mixed srids WITHIN a
    layer refuse loudly (never silent re-tagging)."""
    import pytest as _pytest

    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.sources.flatgeobuf import (
        FEATURE_SCHEMA,
    )

    def pt(x, y):
        return G.wkb_from_geojson(
            {"type": "Point", "coordinates": [x, y]})

    rows = [("d", "wgs", 1, pt(1.0, 2.0), 4326, None, None),
            ("d", "merc", 1, pt(111319.0, 222684.0), 3857, None,
             None)]
    feats = spark.createDataFrame(rows, FEATURE_SCHEMA)
    out = GP.write_gpkg_tables(feats, str(tmp_path / "a")).collect()
    back = {r.layer: r for r in GP.features_from_gpkg(
        spark, out[0].path).collect()}
    assert back["wgs"].srid == 4326 and back["merc"].srid == 3857

    bad = spark.createDataFrame(
        [("d", "one", 1, pt(0.0, 0.0), 4326, None, None),
         ("d", "one", 2, pt(1.0, 1.0), 3857, None, None)],
        FEATURE_SCHEMA)
    with _pytest.raises(Exception, match="mixes"):
        GP.write_gpkg_tables(bad, str(tmp_path / "b")).collect()


def test_gpkg_definition_12_063_wkt2_resolves(spark, tmp_path):
    """A modern GeoPackage whose srs row has definition='undefined'
    but a populated OGC 12-063 WKT2 column must reproject through
    the closed-form WKT2 resolver (r7) — srs_id deliberately NOT an
    EPSG code the engine knows."""
    import sqlite3

    from geohub_data_pipeline_spark.operators import crs as C
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.sources.geopackage import (
        features_from_gpkg, write_gpkg)

    wkt2 = (
        'PROJCRS["WGS 84 / UTM zone 33N",'
        'BASEGEOGCRS["WGS 84",ENSEMBLE["WGS 84 ensemble",'
        'MEMBER["t"],ELLIPSOID["WGS 84",6378137,298.257223563,'
        'LENGTHUNIT["metre",1]],ENSEMBLEACCURACY[2.0]],'
        'PRIMEM["Greenwich",0,'
        'ANGLEUNIT["degree",0.0174532925199433]]],'
        'CONVERSION["UTM zone 33N",'
        'METHOD["Transverse Mercator",ID["EPSG",9807]],'
        'PARAMETER["Latitude of natural origin",0,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Longitude of natural origin",15,'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'PARAMETER["Scale factor at natural origin",0.9996,'
        'SCALEUNIT["unity",1]],'
        'PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],'
        'PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],'
        'CS[Cartesian,2],'
        'AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],'
        'AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]')
    x, y = C.from_lonlat(32633)(15.5, 47.0)
    path = str(tmp_path / "w2.gpkg")
    write_gpkg(path, {"pts": [(1, G.wkb_point(x, y))]}, srid=99999)
    con = sqlite3.connect(path)
    con.execute("ALTER TABLE gpkg_spatial_ref_sys "
                "ADD COLUMN definition_12_063 TEXT")
    con.execute("UPDATE gpkg_spatial_ref_sys "
                "SET definition_12_063 = ? WHERE srs_id = 99999",
                (wkt2,))
    con.commit()
    con.close()
    feats = features_from_gpkg(spark, path)
    row = feats.collect()[0]
    assert row.srid == 99999 and row.crs_wkt == wkt2
    norm = G.normalize_features(feats).collect()[0]
    assert abs(norm.bbox_minx - 15.5) < 1e-7
    assert abs(norm.bbox_miny - 47.0) < 1e-7
