"""GeoParquet sink tests (T7's output artifact, Spark-native form)."""

from __future__ import annotations

import json

import pyarrow.parquet as pq

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators.geoparquet import (
    write_geoparquet_tables,
)
from geohub_data_pipeline_spark.sources import fixtures as FX


def test_write_geoparquet_per_layer(spark, tmp_path):
    feats = FX.vector_features(spark, n_per_layer=20)
    norm = G.normalize_features(feats)
    manifest = {(m.dataset, m.layer): m
                for m in write_geoparquet_tables(
                    norm, str(tmp_path)).collect()}
    # one file per surviving layer (nosrid/utm layers dropped upstream)
    assert ("d1", "points") in manifest and ("d2", "nosrid") not in manifest

    m = manifest[("d1", "points")]
    table = pq.read_table(m.path)
    # standardized geo metadata present and well-formed
    geo = json.loads(table.schema.metadata[b"geo"])
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["encoding"] == "WKB"
    assert geo["columns"]["geometry"]["geometry_types"] == ["MultiPoint"]
    bbox = geo["columns"]["geometry"]["bbox"]
    assert bbox[0] <= bbox[2] and bbox[1] <= bbox[3]

    # WKB payloads parse and row counts match the stage output
    assert table.num_rows == m.n_features
    parsed = G.parse_wkb(table["geometry"][0].as_py())
    assert parsed is not None and parsed["type"] == G.MULTIPOINT

    # and Spark reads it straight back as a plain parquet table
    back = spark.read.parquet(m.path)
    assert back.count() == m.n_features
    assert set(back.columns) == {"fid", "geometry"}


def test_geoparquet_reader_roundtrip(spark, tmp_path):
    """features_from_geoparquet is the read twin of the sink: the
    engine's own artifacts load back as feature rows with layer,
    fid, WKB and srid intact — and the path is fully Spark-native
    (plain parquet scan)."""
    from geohub_data_pipeline_spark.operators.geoparquet import (
        features_from_geoparquet,
        geoparquet_info,
    )
    from geohub_data_pipeline_spark import processing as PROC

    feats = FX.vector_features(spark, n_per_layer=10)
    norm = G.normalize_features(feats)
    manifest = write_geoparquet_tables(norm, str(tmp_path)).collect()
    m = next(x for x in manifest if x.layer == "points")

    assert geoparquet_info(m.path)["primary_column"] == "geometry"
    back = features_from_geoparquet(spark, m.path).collect()
    assert len(back) == m.n_features
    assert {r.layer for r in back} == {f"{m.dataset}_points"}
    assert {r.srid for r in back} == {4326}   # null crs -> OGC:CRS84
    g = G.parse_wkb(bytes(back[0].geometry))
    assert g is not None and g["type"] == G.MULTIPOINT

    # the dispatch tree routes a .parquet with a geo footer here
    routed = PROC.read_vector_features(spark, m.path)
    assert sorted(routed.columns)[:3] == ["crs_wkt", "dataset", "fid"]
    assert routed.count() == m.n_features

    # directory-of-layers form: whole output dir loads as one frame
    all_back = features_from_geoparquet(spark, str(tmp_path))
    assert all_back.count() == sum(x.n_features for x in manifest)
    assert all_back.select("layer").distinct().count() == len(manifest)


def test_geoparquet_rejects_non_wkb_and_unresolvable_crs(spark, tmp_path):
    """GeoParquet 1.1 native/GeoArrow encodings and PROJJSON crs
    without an EPSG identity must REJECT (dead-letter quarantine),
    not silently read as WKB lon/lat."""
    import pandas as pd
    import pyarrow as pa
    import pytest

    from geohub_data_pipeline_spark.operators.geoparquet import (
        features_from_geoparquet,
    )

    def write_with_geo(path, geo):
        tbl = pa.Table.from_pandas(
            pd.DataFrame({"geometry": [b"\x00"], "name": ["x"]}))
        tbl = tbl.replace_schema_metadata({b"geo": json.dumps(geo).encode()})
        pq.write_table(tbl, path)

    native = tmp_path / "native.parquet"
    write_with_geo(str(native), {
        "version": "1.1.0", "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "point",
                                 "geometry_types": ["Point"]}}})
    with pytest.raises(ValueError, match="encoding"):
        features_from_geoparquet(spark, str(native))

    # PROJJSON without an EPSG identity: carried as the crs_wkt
    # sidecar (srid 0, the .prj convention) so the WKT/PROJJSON
    # resolver can reproject it downstream (r7)
    nocrs = tmp_path / "nocrs.parquet"
    noid_crs = {"type": "ProjectedCRS", "name": "mystery"}
    write_with_geo(str(nocrs), {
        "version": "1.0.0", "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "WKB",
                                 "crs": noid_crs}}})
    row = features_from_geoparquet(spark, str(nocrs)).collect()[0]
    assert row.srid == 0
    assert json.loads(row.crs_wkt) == noid_crs

    # a crs that is neither EPSG-identified nor a PROJJSON object
    # still rejects — assuming lon/lat would mis-georeference
    badcrs = tmp_path / "badcrs.parquet"
    write_with_geo(str(badcrs), {
        "version": "1.0.0", "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "WKB",
                                 "crs": "mystery text"}}})
    with pytest.raises(ValueError, match="EPSG"):
        features_from_geoparquet(spark, str(badcrs))


def test_geoparquet_projjson_no_epsg_reprojects(spark, tmp_path):
    """A GeoParquet whose crs is a PROJJSON ProjectedCRS WITHOUT an
    EPSG id must reproject through the closed-form PROJJSON resolver
    (srid 0 + crs_wkt sidecar, r7)."""
    import pandas as pd
    import pyarrow as pa

    from geohub_data_pipeline_spark.operators import crs as C
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.operators.geoparquet import (
        features_from_geoparquet,
    )

    pjson = {
        "type": "ProjectedCRS", "name": "no-id UTM 33N",
        "base_crs": {
            "type": "GeographicCRS", "name": "WGS 84",
            "datum_ensemble": {
                "name": "e",
                "ellipsoid": {"name": "WGS 84",
                              "semi_major_axis": 6378137,
                              "inverse_flattening": 298.257223563}}},
        "conversion": {
            "name": "UTM 33N",
            "method": {"name": "Transverse Mercator"},
            "parameters": [
                {"name": "Latitude of natural origin", "value": 0,
                 "unit": "degree"},
                {"name": "Longitude of natural origin", "value": 15,
                 "unit": "degree"},
                {"name": "Scale factor at natural origin",
                 "value": 0.9996, "unit": "unity"},
                {"name": "False easting", "value": 500000,
                 "unit": "metre"},
                {"name": "False northing", "value": 0,
                 "unit": "metre"}]},
        "coordinate_system": {
            "subtype": "Cartesian",
            "axis": [{"name": "E", "direction": "east",
                      "unit": "metre"}]}}
    x, y = C.from_lonlat(32633)(15.5, 47.0)
    geo = {"version": "1.0.0", "primary_column": "geometry",
           "columns": {"geometry": {"encoding": "WKB",
                                    "crs": pjson}}}
    tbl = pa.Table.from_pandas(pd.DataFrame({
        "geometry": [G.wkb_point(x, y)], "fid": [1]}))
    tbl = tbl.replace_schema_metadata(
        {b"geo": json.dumps(geo).encode()})
    path = str(tmp_path / "pj.parquet")
    pq.write_table(tbl, path)
    feats = features_from_geoparquet(spark, path)
    row = feats.collect()[0]
    assert row.srid == 0 and row.crs_wkt
    norm = G.normalize_features(feats).collect()[0]
    assert abs(norm.bbox_minx - 15.5) < 1e-7
    assert abs(norm.bbox_miny - 47.0) < 1e-7
