"""GeoParquet vector output — the FGB-stage artifact (T7 sink).

The reference materializes every vector layer as FlatGeobuf before
tiling (ref /root/reference/ingest/processing.py:100-213) because
tippecanoe streams FGB well.  A Spark-native engine's equivalent
interchange format is **GeoParquet**: the same WKB-in-parquet layout
the whole pipeline already uses, plus the standardized ``geo`` file
metadata — readable by GDAL/ogr2ogr, GeoPandas, DuckDB-spatial, and
(as plain parquet) Spark itself; columnar, splittable, predicate-
pushdown-friendly — everything FGB is not at 100 TB.

``write_geoparquet_tables`` writes one GeoParquet file per
(dataset, layer) inside ``applyInPandas`` via pyarrow (needed to set
file-level key-value metadata, which Spark's writer cannot), and
returns a manifest DataFrame including the per-layer bbox.
"""

from __future__ import annotations

import json
import os

GEOPARQUET_VERSION = "1.0.0"


def geo_metadata(geometry_types: list[str], bbox: list[float]) -> dict:
    return {
        "version": GEOPARQUET_VERSION,
        "primary_column": "geometry",
        "columns": {
            "geometry": {
                "encoding": "WKB",
                "geometry_types": geometry_types,
                "crs": None,          # per spec: null = OGC:CRS84 (lon/lat)
                "bbox": bbox,
            }
        },
    }


_TYPE_NAMES = {1: "MultiPoint", 4: "MultiPoint",
               2: "MultiLineString", 5: "MultiLineString",
               3: "MultiPolygon", 6: "MultiPolygon"}


def write_geoparquet_tables(normalized, dst_dir: str):
    """One GeoParquet file per (dataset, layer) from
    normalize_features output; returns a manifest DataFrame
    (dataset, layer, path, n_features, file_bytes, bbox doubles).
    """
    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package

    ship_package(normalized.sparkSession)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        dataset = pdf["dataset"].iloc[0]
        layer = pdf["layer"].iloc[0]
        pdf = pdf.sort_values("fid")
        bbox = [float(pdf["bbox_minx"].min()), float(pdf["bbox_miny"].min()),
                float(pdf["bbox_maxx"].max()), float(pdf["bbox_maxy"].max())]
        gtypes = sorted({_TYPE_NAMES.get(int(t), "Unknown")
                         for t in pdf["geom_type"].unique()})
        table = pa.Table.from_pydict({
            "fid": pa.array(pdf["fid"], pa.int64()),
            "geometry": pa.array(
                [bytes(b) for b in pdf["geometry"]], pa.binary()),
        })
        meta = dict(table.schema.metadata or {})
        meta[b"geo"] = json.dumps(
            geo_metadata(gtypes, bbox), sort_keys=True).encode()
        table = table.replace_schema_metadata(meta)

        safe = f"{dataset}_{layer}".replace("/", "_")
        path = os.path.join(dst_dir, f"{safe}.parquet")
        os.makedirs(dst_dir, exist_ok=True)
        pq.write_table(table, path, compression="zstd")
        return pd.DataFrame([{
            "dataset": dataset, "layer": layer, "path": path,
            "n_features": len(pdf),
            "file_bytes": os.path.getsize(path),
            "bbox_minx": bbox[0], "bbox_miny": bbox[1],
            "bbox_maxx": bbox[2], "bbox_maxy": bbox[3],
        }])

    return normalized.groupBy("dataset", "layer").applyInPandas(
        write_group,
        "dataset string, layer string, path string, n_features long, "
        "file_bytes long, bbox_minx double, bbox_miny double, "
        "bbox_maxx double, bbox_maxy double")


def geoparquet_info(path: str) -> dict | None:
    """The parsed ``geo`` footer metadata of a (Geo)Parquet file or
    of the first parquet part under a directory, else None.  A footer
    read is a few KB regardless of file size — driver-side by design,
    like any catalog lookup."""
    import glob

    import pyarrow.parquet as pq

    files = [path]
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    try:
        meta = pq.read_schema(files[0]).metadata or {}
    except OSError:
        return None
    raw = meta.get(b"geo")
    if not raw:
        return None
    try:
        return json.loads(raw)
    except ValueError:
        return None


def _epsg_code(crs) -> int | None:
    """EPSG code of a PROJJSON crs object, or None when the object
    carries no resolvable EPSG identity."""
    if isinstance(crs, dict):
        ident = crs.get("id", {})
        if str(ident.get("authority", "")).upper() == "EPSG":
            try:
                return int(ident.get("code"))
            except (TypeError, ValueError):
                return None
    return None


def _srid_of_geo(geo: dict) -> tuple[int, str | None]:
    """GeoParquet ``crs`` -> (srid, crs_text): null/absent means
    OGC:CRS84 (lon/lat WGS84 == srid 4326 for this 2D engine); a
    PROJJSON object with an EPSG id resolves to that code.  A
    PROJJSON object WITHOUT an EPSG identity keeps its JSON text as
    the crs_wkt sidecar with srid 0 — the shapefile .prj convention
    ("EPSG unknown, reproject via the embedded CRS text"), resolved
    downstream by operators/crs_wkt.pair_from_wkt's PROJJSON path.
    A crs that is neither raises — silently assuming lon/lat would
    mis-georeference every feature (quarantine instead)."""
    import json as _json

    col = geo.get("columns", {}).get(geo.get("primary_column",
                                             "geometry"), {})
    crs = col.get("crs")
    if not crs:
        return 4326, None
    code = _epsg_code(crs)
    if code is not None:
        return code, None
    if isinstance(crs, dict) and crs.get("type"):
        return 0, _json.dumps(crs, sort_keys=True,
                              separators=(",", ":"))
    raise ValueError(
        "GeoParquet crs has no EPSG identity and is not a PROJJSON "
        "object — refusing to assume lon/lat")


def _check_encoding(geo: dict, path: str) -> None:
    """GeoParquet 1.1 allows native/GeoArrow geometry encodings; this
    reader implements WKB only — reading a native-encoded column as
    WKB silently drops or garbles every feature, so reject it."""
    col = geo.get("columns", {}).get(geo.get("primary_column",
                                             "geometry"), {})
    enc = str(col.get("encoding", "WKB"))
    if enc.upper() != "WKB":
        raise ValueError(
            f"unsupported GeoParquet geometry encoding {enc!r} in "
            f"{path} (native/GeoArrow not implemented; WKB only)")


def features_from_geoparquet(spark, path: str):
    """GeoParquet -> engine feature rows, fully Spark-native: the
    scan is Spark's own distributed parquet reader (splittable,
    column-pruned, predicate pushdown on attributes), the layer comes
    from ``input_file_name`` and the property bag from ``to_json``
    over the non-geometry columns — no Python in the row path at
    all; only the one-footer ``geo`` metadata read happens on the
    driver.  This is the read twin of ``write_geoparquet_tables``
    (the engine's T7 interchange artifact).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    geo = geoparquet_info(path) or {}
    gcol = geo.get("primary_column", "geometry")
    if geo:
        _check_encoding(geo, path)
    srid, crs_text = _srid_of_geo(geo) if geo else (4326, None)

    df = spark.read.parquet(path)
    if gcol not in df.columns:
        raise ValueError(f"no geometry column {gcol!r} in {path}")
    dataset = os.path.basename(path.rstrip("/"))
    layer = F.regexp_extract(F.input_file_name(),
                             r"([^/]+?)(\.parquet)?$", 1)
    props = [c for c in df.columns if c not in (gcol, "fid")]

    out = df.select(
        F.lit(dataset).alias("dataset"),
        layer.alias("layer"),
        (F.col("fid").cast("long") if "fid" in df.columns
         else F.row_number().over(
             Window.partitionBy(F.input_file_name())
             .orderBy(F.monotonically_increasing_id())).cast("long"))
        .alias("fid"),
        F.col(gcol).alias("geometry"),
        F.lit(srid).cast("int").alias("srid"),
        F.lit(crs_text).cast("string").alias("crs_wkt"),
        (F.to_json(F.struct(*[F.col(c) for c in props])) if props
         else F.lit(None).cast("string")).alias("properties"),
    )
    return out
