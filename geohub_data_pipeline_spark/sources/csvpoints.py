"""CSV point-table vector source — Spark-native scan, no GDAL.

The spreadsheet upload: a CSV with latitude/longitude columns (the
reference routes these through GDAL's CSV driver with X_POSSIBLE_NAMES/
Y_POSSIBLE_NAMES; ref ingest config allowlists tabular uploads).
Coordinate columns are found by the same name heuristics the GDAL
driver uses: lon/lng/long/longitude/x vs lat/latitude/y
(case-insensitive); every other column becomes a feature property.

Scale posture: this is the BEST-scaling vector source in the engine —
the parse is Spark's own distributed CSV reader (splittable files,
schema inference off the first file, predicate pushdown on the
property columns), and only the 21-byte WKB point packing runs in an
Arrow-batched kernel (numpy byte assembly, no per-row Python
arithmetic).  A 100 TB point table parallelizes like any other
DataFrame scan.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.sources.shapefile import FEATURE_SCHEMA

_LON_NAMES = ("lon", "lng", "long", "longitude", "x")
_LAT_NAMES = ("lat", "latitude", "y")
_WKT_NAMES = ("wkt", "geometry", "geom", "wkb_geometry", "the_geom")


def detect_coord_columns(columns: list[str]) -> tuple[str, str] | None:
    """(lon_col, lat_col) by GDAL-style name matching, else None."""
    low = {c.lower().strip(): c for c in columns}
    lon = next((low[n] for n in _LON_NAMES if n in low), None)
    lat = next((low[n] for n in _LAT_NAMES if n in low), None)
    if lon and lat:
        return lon, lat
    return None


def detect_wkt_column(columns: list[str]) -> str | None:
    """The GDAL GEOM_POSSIBLE_NAMES analog: a WKT geometry column —
    the PostGIS/BigQuery CSV-export shape (any geometry type, not
    just points)."""
    low = {c.lower().strip(): c for c in columns}
    return next((low[n] for n in _WKT_NAMES if n in low), None)


def features_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """Scan a CSV (or a directory of CSV parts) with lat/lon columns
    into engine feature rows.  Layer = file stem; fid = a
    deterministic 64-bit xxhash of (lon, lat, properties), computed
    map-side — a global row-number would shuffle every row of a
    terabyte-scale CSV to one partition, a hash keeps the scan
    embarrassingly parallel.  Tables carrying a real id column keep
    it in the property bag; exact-duplicate rows share a fid, which
    the (dataset, layer, fid) join key tolerates the same way
    repeated GDAL FIDs are."""
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(spark)

    df = (spark.read.option("header", True).option("inferSchema", False)
          .csv(path))
    stem = os.path.basename(path.rstrip("/"))
    stem = stem.rsplit(".", 1)[0] or stem
    pair = detect_coord_columns(df.columns)
    if pair is None:
        wcol = detect_wkt_column(df.columns)
        if wcol is None:
            raise ValueError(
                f"no lon/lat or WKT columns in {path}: {df.columns}")
        return _wkt_rows(df, wcol, os.path.basename(path.rstrip("/")),
                         stem)
    lon_c, lat_c = pair
    props = [c for c in df.columns if c not in (lon_c, lat_c)]

    base = df.select(
        F.lit(os.path.basename(path.rstrip("/"))).alias("dataset"),
        F.lit(stem).alias("layer"),
        F.col(lon_c).cast("double").alias("_lon"),
        F.col(lat_c).cast("double").alias("_lat"),
        F.to_json(F.struct(*[F.col(c) for c in props])
                  if props else F.struct(F.lit(1).alias("_")))
        .alias("properties"),
    ).filter(F.col("_lon").isNotNull() & F.col("_lat").isNotNull())

    base = base.withColumn(
        "fid", F.xxhash64("_lon", "_lat", "properties").cast("long"))

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = b"\x01\x01\x00\x00\x00"     # little-endian WKB Point
        for pdf in it:
            xy = np.column_stack([
                pdf["_lon"].to_numpy(np.float64),
                pdf["_lat"].to_numpy(np.float64),
            ]).astype("<f8").tobytes()
            geoms = [header + xy[i * 16:(i + 1) * 16]
                     for i in range(len(pdf))]
            yield pd.DataFrame({
                "dataset": pdf["dataset"], "layer": pdf["layer"],
                "fid": pdf["fid"], "geometry": geoms,
                "srid": np.int32(4326),
                "crs_wkt": None, "properties": pdf["properties"],
            })

    return base.mapInPandas(pack, FEATURE_SCHEMA)


def _wkt_rows(df: DataFrame, wcol: str, dataset: str,
              layer: str) -> DataFrame:
    """WKT-column CSV -> feature rows: the scan stays Spark-native;
    the WKT parse runs in an Arrow kernel (any geometry type)."""
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(df.sparkSession)

    props = [c for c in df.columns if c != wcol]
    base = df.select(
        F.lit(dataset).alias("dataset"),
        F.lit(layer).alias("layer"),
        F.col(wcol).alias("_wkt"),
        (F.to_json(F.struct(*[F.col(c) for c in props]))
         if props else F.lit(None).cast("string")).alias("properties"),
        F.xxhash64(wcol, *props).cast("long").alias("fid"),
    ).filter(F.col("_wkt").isNotNull())

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geohub_data_pipeline_spark.functions import wkt as W
        for pdf in it:
            geoms = [W.wkt_to_wkb(str(t)) for t in pdf["_wkt"]]
            keep = [i for i, g in enumerate(geoms) if g is not None]
            sub = pdf.iloc[keep]
            yield pd.DataFrame({
                "dataset": sub["dataset"], "layer": sub["layer"],
                "fid": sub["fid"],
                "geometry": [geoms[i] for i in keep],
                "srid": np.int32(4326),
                "crs_wkt": None, "properties": sub["properties"],
            })

    return base.mapInPandas(pack, FEATURE_SCHEMA)


def read_csv_bytes(payload: bytes, dataset: str):
    """Single-document form (archive members): yield feature rows
    from CSV bytes — same heuristics as ``features_from_csv``."""
    import csv
    import io

    from geohub_data_pipeline_spark.operators import geometry as G

    rd = csv.DictReader(io.StringIO(payload.decode("utf-8", "replace")))
    if not rd.fieldnames:
        return
    stem = dataset.rsplit(".", 1)[0] or dataset
    pair = detect_coord_columns(list(rd.fieldnames))
    wcol = None if pair else detect_wkt_column(list(rd.fieldnames))
    if pair is None and wcol is None:
        return
    fid = 0
    for row in rd:
        if pair is not None:
            lon_c, lat_c = pair
            try:
                lon, lat = float(row[lon_c]), float(row[lat_c])
            except (TypeError, ValueError):
                continue
            wkb = G.wkb_point(lon, lat)
            skip = (lon_c, lat_c)
        else:
            from geohub_data_pipeline_spark.functions import wkt as W
            wkb = W.wkt_to_wkb(row.get(wcol) or "")
            if wkb is None:
                continue
            skip = (wcol,)
        fid += 1
        # k is None for ragged rows (DictReader's restkey) — a None
        # key crashes json.dumps(sort_keys=True) against str keys
        props = {k: v for k, v in row.items()
                 if k is not None and k not in skip and v is not None}
        yield (dataset, stem, fid, wkb, 4326,
               None, json.dumps(props, sort_keys=True))
