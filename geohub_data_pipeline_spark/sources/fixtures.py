"""Deterministic pipeline-domain fixture generators (FIXTURES.md §B).

Synthetic tables modeling the reference's inputs — ingest messages,
vector features, raster blocks, cancel messages — with the exact
defect mix FIXTURES.md prescribes (malformed messages, invalid
bowties, NULL geometries, NULL-srid layers, ragged raster edges, RGB
vs greyscale datasets).  Everything is a pure function of the row
index (no RNG): identical on every run and engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators.raster import BLOCK

_EXTS = (".gpkg", ".zip", ".tif", ".geojson")


def ingest_messages(spark: SparkSession, n: int = 200) -> DataFrame:
    """Work-item stream: ~10% not under /raw/ (T4), ~5% .pmtiles
    passthrough (T5), ~2% malformed (dead-letter)."""
    rows = []
    for i in range(n):
        if i % 50 == 49:                        # ~2% malformed
            body = f"not-a-message-{i}"
        else:
            user = f"user{i % 10}"
            folder = "staging" if i % 10 == 3 else "raw"   # ~10% non-raw
            ext = ".pmtiles" if i % 20 == 7 else _EXTS[i % 4]  # ~5% pmtiles
            url = (f"https://acct.blob.core.windows.net/userdata/{user}/"
                   f"{folder}/upload_{i}{ext}")
            token = hashlib.md5(f"tok{i}".encode()).hexdigest()
            join = "true" if i % 2 == 0 else "false"
            body = f"{url};{token};join_vector_tiles={join}"
        rows.append((i, body, f"2024-01-01T{i % 24:02d}:{i % 60:02d}:00"))
    return spark.createDataFrame(
        rows, "msg_id long, body string, enqueued_ts string")


def vector_features(spark: SparkSession, n_per_layer: int = 40) -> DataFrame:
    """Features across datasets/layers with the §B defect mix:
    Point/Line/Polygon + Multi*, ~3% bowties, ~1% NULL geometry,
    srid mix (4326/3857/32633 native + 29101 unsupported) and one
    NULL-srid layer."""
    from geohub_data_pipeline_spark.operators import crs as C

    rows = []
    fid = 0
    layers = [
        ("d1", "points", 4326), ("d1", "lines", 4326),
        ("d1", "polys", 4326), ("d2", "merc", 3857),
        ("d2", "utm", 32633), ("d2", "unsupp", 29101),
        ("d2", "nosrid", None),
    ]
    for dataset, layer, srid in layers:
        for i in range(n_per_layer):
            fid += 1
            lon = -170.0 + (i * 8.31) % 340.0
            lat = -80.0 + (i * 5.07) % 160.0
            if srid == 3857:
                x, y = G.lonlat_to_mercator(lon, lat)
            elif srid == 32633:
                # genuine zone-33 coordinates (lon 12..18, lat 0..72)
                lon = 12.0 + (i * 0.73) % 6.0
                lat = (i * 4.1) % 72.0
                x, y = C.lonlat_to_utm(lon, lat, 33)
            else:
                x, y = lon, lat
            if fid % 97 == 0:                      # ~1% NULL geometry
                wkb = None
            elif layer == "polys" and i % 33 == 5:  # ~3% bowties
                wkb = G.wkb_polygon([[(x, y), (x + 1, y + 1), (x + 1, y),
                                      (x, y + 1), (x, y)]])
            elif layer == "points" or layer in ("merc", "utm", "unsupp",
                                                "nosrid"):
                wkb = G.wkb_point(x, y)
            elif layer == "lines":
                wkb = G.wkb_linestring([(x, y), (x + 0.5, y + 0.25),
                                        (x + 1.0, y)])
            else:
                wkb = G.wkb_polygon([[(x, y), (x + 0.5, y), (x + 0.5, y + 0.5),
                                      (x, y + 0.5), (x, y)]])
            rows.append((dataset, layer, fid, wkb, srid,
                         f"feat_{fid}", ("a", "b", "c")[i % 3],
                         1000 + i * 37, float(i) * 1.5))
    return spark.createDataFrame(
        rows, "dataset string, layer string, fid long, geometry binary, "
              "srid int, name string, category string, population long, "
              "area_km2 double")


def raster_blocks(spark: SparkSession) -> DataFrame:
    """Raster blocks per §B: an RGB dataset (colorinterp 3/4/5), a
    greyscale dataset, a NetCDF-style subdataset, ragged edges."""
    rows = []

    def add(dataset, subdataset, band, colorinterp, grid_w, grid_h,
            full_w, full_h, srid):
        for by in range(grid_h):
            for bx in range(grid_w):
                w = min(BLOCK, full_w - bx * BLOCK)
                h = min(BLOCK, full_h - by * BLOCK)
                px = [float((band * 7 + by * BLOCK + yy) % 251)
                      for yy in range(h) for xx in range(w)]
                rows.append((dataset, subdataset, band, colorinterp,
                             bx, by, w, h, px, None, srid))

    for band, ci in ((1, 3), (2, 4), (3, 5)):          # RGB dataset
        add("rgb.tif", None, band, ci, 2, 2, 2 * BLOCK - 32, 2 * BLOCK - 64,
            3857)
    add("grey.tif", None, 1, 1, 2, 1, 2 * BLOCK, BLOCK, 4326)
    add("climate.nc", "NETCDF:climate.nc:temp", 1, 1, 1, 1, BLOCK, BLOCK,
        4326)
    return spark.createDataFrame(
        rows, "dataset string, subdataset string, band int, colorinterp int, "
              "block_x int, block_y int, width int, height int, "
              "pixels array<double>, nodata double, srid int")


def cancel_messages(spark: SparkSession,
                    messages: DataFrame) -> DataFrame:
    """Cancel stream targeting every 25th raw upload of the message set."""
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.streaming.service import parse_messages

    parsed = (
        parse_messages(messages)
        .filter(~F.col("malformed") & F.col("blob_url").contains("/raw/"))
        .join(messages.select("msg_id", "enqueued_ts"), "msg_id")
    )
    targets = parsed.filter(F.col("msg_id") % 25 == 0)
    return targets.select(
        F.regexp_extract("blob_url", r"userdata/([^/]+)/", 1).alias("user"),
        F.col("blob_url").alias("url"),
        F.lit(True).alias("cancel"),
        F.col("enqueued_ts").alias("sent_ts"),
    )
