"""Arc/Info ASCII Grid (.asc/.grd/.aig/.sgr) raster source — stdlib
text parse.

``.asc``/``.grd``/``.aig``/``.sgr`` are in the reference's accepted
raster format list, all grouped under "Arc/Info ASCII Grid File"
(ref ingest/config.py:46,67-78 ALLOWED_GDAL_FORMATS); GDAL reads
them into the same pipeline as GeoTIFF.  The format is a 6-line text
header
(ncols, nrows, xllcorner/xllcenter, yllcorner/yllcenter, cellsize,
optional nodata_value) followed by row-major whitespace-separated
values, north row first.

The source parses bytes straight into the engine's raster BLOCK model
(operators/raster.py BLOCK_SCHEMA: 256x256 blocks, level 0), so an
.asc upload flows through the SAME overview cascade, dispatch, and
COG assembly as any GeoTIFF — format support is a parser, not a new
pipeline.

Scale: one grid = one task (single-file text format); blocks leave as
Arrow batches and the cascade re-partitions them like any raster.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from geohub_data_pipeline_spark.operators.raster import BLOCK, BLOCK_SCHEMA

_HEADER_KEYS = {"ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
                "yllcenter", "cellsize", "nodata_value"}


def parse_aaigrid(text: str) -> tuple[dict, np.ndarray]:
    """Parse .asc text -> (header dict, float64 array [nrows, ncols]).

    Raises ValueError on malformed input (callers quarantine).
    """
    tokens = text.split()
    header: dict[str, float] = {}
    i = 0
    while i + 1 < len(tokens) and tokens[i].lower() in _HEADER_KEYS:
        header[tokens[i].lower()] = float(tokens[i + 1])
        i += 2
    if "ncols" not in header or "nrows" not in header:
        raise ValueError("AAIGrid: missing ncols/nrows header")
    ncols, nrows = int(header["ncols"]), int(header["nrows"])
    if ncols <= 0 or nrows <= 0:
        raise ValueError("AAIGrid: non-positive dimensions")
    values = tokens[i:]
    if len(values) != ncols * nrows:
        raise ValueError(
            f"AAIGrid: expected {ncols * nrows} values, "
            f"got {len(values)}")
    try:
        arr = np.array(values, dtype=np.float64).reshape(nrows, ncols)
    except ValueError as ex:
        raise ValueError(f"AAIGrid: non-numeric cell: {ex}") from None
    return header, arr


def georef_of(header: dict) -> tuple[float, float, float, float]:
    """(origin_x, origin_y, pixel_sx, pixel_sy) from an AAIGrid header.

    The header gives the LOWER-LEFT corner (or cell center, for the
    xllcenter/yllcenter variants); GeoTIFF's ModelTiepoint wants the
    TOP-LEFT corner, so the Y origin is yll + nrows*cellsize.
    """
    cell = float(header.get("cellsize", 1.0))
    nrows = int(header["nrows"])
    if "xllcorner" in header:
        x0 = float(header["xllcorner"])
    elif "xllcenter" in header:
        x0 = float(header["xllcenter"]) - cell / 2.0
    else:
        x0 = 0.0
    if "yllcorner" in header:
        yll = float(header["yllcorner"])
    elif "yllcenter" in header:
        yll = float(header["yllcenter"]) - cell / 2.0
    else:
        yll = 0.0
    return x0, yll + nrows * cell, cell, cell


def georef_from_aaigrid(spark: SparkSession, path: str,
                        srid: int = 4326) -> DataFrame:
    """Per-dataset georeferencing sidecar (GEOREF_SCHEMA) from .asc
    headers — consumed by ``assemble_cog_tables(georef=...)`` so COGs
    keep the grid's spatial referencing (the reference preserves it
    through GDAL; ref ingest/processing.py:469-552)."""
    import os

    from geohub_data_pipeline_spark.operators.raster import GEOREF_SCHEMA
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(spark)

    raw = (spark.read.format("binaryFile").load(path)
           .select("path", "content"))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in GEOREF_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                dataset = os.path.basename(str(p).removeprefix("file:"))
                try:
                    header, _ = parse_aaigrid(
                        bytes(content).decode("ascii", "strict"))
                    ox, oy, sx, sy = georef_of(header)
                    rows.append((dataset, ox, oy, sx, sy, srid))
                except (ValueError, UnicodeDecodeError):
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(kernel, GEOREF_SCHEMA)


def _blocks_of(dataset: str, header: dict, arr: np.ndarray,
               srid: int) -> list[tuple]:
    nodata = float(header.get("nodata_value", -9999.0))
    nrows, ncols = arr.shape
    rows = []
    for by in range(0, nrows, BLOCK):
        for bx in range(0, ncols, BLOCK):
            tile = arr[by:by + BLOCK, bx:bx + BLOCK]
            rows.append((
                dataset, None, 1, 0, bx // BLOCK, by // BLOCK,
                int(tile.shape[1]), int(tile.shape[0]),
                tile.ravel().tolist(), nodata, srid,
            ))
    return rows


def blocks_from_aaigrid(spark: SparkSession, path: str,
                        srid: int = 4326) -> DataFrame:
    """Scan .asc files under ``path`` into raster block rows
    (BLOCK_SCHEMA level 0) — ready for rgb_dispatch /
    overview_cascade / COG assembly."""
    import os

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(spark)

    raw = (spark.read.format("binaryFile").load(path)
           .select("path", "content"))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in BLOCK_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                dataset = os.path.basename(str(p).removeprefix("file:"))
                try:
                    header, arr = parse_aaigrid(
                        bytes(content).decode("ascii", "strict"))
                    rows += _blocks_of(dataset, header, arr, srid)
                except (ValueError, UnicodeDecodeError):
                    continue               # corrupt grid: quarantine
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(kernel, BLOCK_SCHEMA)
