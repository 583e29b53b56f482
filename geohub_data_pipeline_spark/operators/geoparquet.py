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
