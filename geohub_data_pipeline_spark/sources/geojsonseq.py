"""Newline-delimited GeoJSON (GeoJSONSeq / .ndjson / RFC 8142) source.

GDAL's GeoJSONSeq driver reads one Feature per line (optionally
RS-prefixed per RFC 8142); it exists precisely because monolithic
FeatureCollections don't stream — and for the same reason it is the
best TEXT vector format at Spark scale: newline-delimited files are
SPLITTABLE, so one 500 GB .geojsonl fans out across the cluster
instead of parsing on a single task the way a one-object .geojson
must (sources/archive.py geojson_feature_rows).

The scan is ``spark.read.text`` (distributed, splittable); each
Arrow batch of lines parses with stdlib json + the engine's
RFC 7946 -> WKB builder.  GeoJSON is WGS84 by definition (RFC 7946
§4) — srid 4326, no reprojection.

Reference behavior: the reference feeds any GDAL vector format
through ogr2ogr (ref ingest/processing.py:100-213); GeoJSONSeq is in
its default driver set.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from geohub_data_pipeline_spark.sources.shapefile import FEATURE_SCHEMA

_RS = "\x1e"                               # RFC 8142 record separator


def parse_feature_line(line: str):
    """One GeoJSONSeq line -> (wkb, fid_or_None, props_json_or_None),
    or None for blank/malformed lines (-skipfailures)."""
    from geohub_data_pipeline_spark.operators import geometry as G

    line = line.lstrip(_RS).strip()
    if not line:
        return None
    try:
        feat = json.loads(line)
    except ValueError:
        return None
    if feat.get("type") == "FeatureCollection":
        return None                        # not a sequence line
    if feat.get("type") != "Feature":      # bare geometry line
        feat = {"type": "Feature", "geometry": feat, "properties": {}}
    geom = feat.get("geometry")
    wkb = G.wkb_from_geojson(geom) if geom else None
    if wkb is None:
        return None
    fid = feat.get("id")
    fid = int(fid) if isinstance(fid, (int, float)) else None
    props = feat.get("properties")
    pjson = (json.dumps(props, sort_keys=True, separators=(",", ":"))
             if isinstance(props, dict) and props else None)
    return wkb, fid, pjson


def features_from_geojsonseq(spark: SparkSession, path: str) -> DataFrame:
    """Scan .geojsonl/.ndjson/.geojsons files under ``path`` into
    engine feature rows.  Layer = file stem; fid = the feature's own
    ``id`` when numeric, else a deterministic 64-bit hash of the line
    (no global row-number shuffle — same posture as the CSV source)."""
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(spark)

    dataset = os.path.basename(path.rstrip("/"))
    raw = (spark.read.text(path)
           .select(F.col("value"),
                   F.regexp_extract(F.input_file_name(),
                                    r"([^/]+?)(\.[a-zA-Z0-9]+)?$", 1)
                   .alias("layer"),
                   F.xxhash64("value").alias("line_hash")))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["dataset", "layer", "fid", "geometry", "srid",
                "crs_wkt", "properties"]
        for pdf in it:
            rows = []
            for line, layer, lh in zip(pdf["value"], pdf["layer"],
                                       pdf["line_hash"]):
                parsed = parse_feature_line(str(line))
                if parsed is None:
                    continue               # -skipfailures
                wkb, fid, pjson = parsed
                rows.append((dataset, str(layer),
                             fid if fid is not None else int(lh),
                             wkb, 4326, None, pjson))
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(kernel, FEATURE_SCHEMA)


def write_geojsonseq_tables(features: DataFrame,
                            dst_dir: str) -> DataFrame:
    """One ``.geojsonl`` per (dataset, layer) — the read twin of
    ``features_from_geojsonseq`` (round-trip: write -> read gives
    back fid/geometry/properties).  One Feature per line, RFC 7946
    geometry via ``geometry.geojson_from_wkb``, ``id`` = fid,
    properties inlined from the JSON string column when present.

    Plan: ONE shuffle keyed on (dataset, layer), then each group
    writes its file independently — no driver collect.  (For a
    single huge layer, newline-delimited output also concatenates:
    write per-partition part files with ``df.write.text`` and cat;
    this artifact-per-layer form matches the engine's .fgb/.pmtiles
    model.)
    """
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(features.sparkSession)
    has_props = "properties" in features.columns

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        dataset = str(pdf["dataset"].iloc[0])
        layer = str(pdf["layer"].iloc[0])
        pdf = pdf.sort_values("fid")
        os.makedirs(dst_dir, exist_ok=True)
        from geohub_data_pipeline_spark.functions.paths import (
            artifact_stem)
        path = os.path.join(
            dst_dir, artifact_stem(dataset, layer) + ".geojsonl")
        n = 0
        with open(path, "w", encoding="utf-8") as f:
            for row in pdf.itertuples(index=False):
                if row.geometry is None:
                    continue
                geom = G.geojson_from_wkb(bytes(row.geometry))
                if geom is None:
                    continue
                props = {}
                if has_props and isinstance(row.properties, str):
                    try:
                        props = json.loads(row.properties)
                    except ValueError:
                        props = {}
                # fid is nullable in FEATURE_SCHEMA; pandas surfaces
                # a null as NaN — RFC 7946 makes "id" optional
                fid = (None if pd.isna(row.fid) else int(row.fid))
                feat = {"type": "Feature", "id": fid,
                        "geometry": geom, "properties": props}
                f.write(json.dumps(feat, separators=(",", ":"))
                        + "\n")
                n += 1
        return pd.DataFrame([{
            "dataset": dataset, "layer": layer, "path": path,
            "n_features": n,
            "file_bytes": os.path.getsize(path)}])

    return features.groupBy("dataset", "layer").applyInPandas(
        write_group, "dataset string, layer string, path string, "
                     "n_features long, file_bytes long")
