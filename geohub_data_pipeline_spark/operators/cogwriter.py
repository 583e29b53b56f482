"""Pure-python tiled GeoTIFF writer — the COG assembly sink (T11).

Reference output (ref /root/reference/ingest/config.py:92-103,
processing.py:496-522): Cloud-Optimized GeoTIFF, 256x256 internal
tiles, overview pyramid, EPSG:3857.  rasterio is unavailable here, so
this module writes the TIFF container directly:

* classic little-endian TIFF, one IFD per resolution level, chained
  (full resolution first, then each overview — the COG IFD layout),
* tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts),
* float64 samples (SampleFormat=IEEEFP); tiles compressed with the
  NEGOTIATED codec — ZSTD (the reference profile, via pyarrow's
  bundled codec) when available, else stdlib deflate — and the codec
  actually used is recorded in the Compression tag (50000 / 8 / 1),
* GeoTIFF georeferencing tags (ModelPixelScale, ModelTiepoint,
  GeoKeyDirectory with the EPSG code).

The Spark side (``assemble_cog_tables``) groups blocks per
(dataset, band) and writes one file per group inside
``applyInPandas`` — each output is produced by exactly one task,
blocks arrive via Arrow, and the returned manifest is a DataFrame
(auditable, joinable).  Output verified structurally by
tests/test_cogwriter.py with an independent TIFF parser.
"""

from __future__ import annotations

import math
import os
import struct
import zlib
from collections.abc import Iterable

import numpy as np

from geohub_data_pipeline_spark.functions import compression as CMP

TILE = 256
COMPRESSION_NONE = CMP.TIFF_NONE
COMPRESSION_DEFLATE = CMP.TIFF_DEFLATE     # Adobe deflate (zlib)
COMPRESSION_ZSTD = CMP.TIFF_ZSTD           # libtiff-registered ZSTD

_TAG_OF = {"zstd": COMPRESSION_ZSTD, "deflate": COMPRESSION_DEFLATE,
           "none": COMPRESSION_NONE}


def _codec_of(compress) -> str:
    """True -> negotiate (zstd if present else deflate); str -> as
    given; False/None -> none."""
    if compress is True:
        return CMP.negotiate("zstd")
    if not compress:
        return "none"
    return compress

# TIFF tag ids
T_IMAGE_WIDTH = 256
T_IMAGE_LENGTH = 257
T_BITS_PER_SAMPLE = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_SAMPLES_PER_PIXEL = 277
T_TILE_WIDTH = 322
T_TILE_LENGTH = 323
T_TILE_OFFSETS = 324
T_TILE_BYTE_COUNTS = 325
T_SAMPLE_FORMAT = 339
T_MODEL_PIXEL_SCALE = 33550
T_MODEL_TIEPOINT = 33922
T_GEO_KEY_DIRECTORY = 34735

TYPE_SHORT, TYPE_LONG, TYPE_DOUBLE = 3, 4, 12


def _entry(tag: int, typ: int, count: int, value_or_offset: int) -> bytes:
    return struct.pack("<HHI", tag, typ, count) + struct.pack(
        "<I", value_or_offset)


class _Level:
    def __init__(self, width: int, height: int,
                 tiles: dict[tuple[int, int], np.ndarray]):
        self.width = width
        self.height = height
        self.tiles = tiles  # (tx, ty) -> float64 array padded to TILE^2


def _pad(tile: np.ndarray, nodata: float) -> np.ndarray:
    h, w = tile.shape
    if (h, w) == (TILE, TILE):
        return tile
    out = np.full((TILE, TILE), nodata, dtype=np.float64)
    out[:h, :w] = tile
    return out


def write_geotiff(path: str, levels: list[_Level], epsg: int = 3857,
                  pixel_scale: tuple[float, float] = (1.0, 1.0),
                  origin: tuple[float, float] = (0.0, 0.0),
                  compress: bool | str = True,
                  dtype: str = "f8") -> int:
    """Write a multi-level tiled float64 GeoTIFF; returns bytes written.

    compress=True negotiates the codec: ZSTD (the reference's COG
    profile, ref ingest/config.py:92-101) when pyarrow provides it,
    else stdlib deflate; "zstd"/"deflate"/False force a choice.  The
    Compression tag records what was actually used.
    """
    out = geotiff_bytes(levels, epsg, pixel_scale, origin, compress,
                        dtype=dtype)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(out)
    return len(out)


_N_TAGS = 15                               # fixed tag set per IFD
T_PLANAR_CONFIG = 284


_DTYPES = {"u1": (8, 1), "u2": (16, 1), "u4": (32, 1),
           "i1": (8, 2), "i2": (16, 2), "i4": (32, 2),
           "f4": (32, 3), "f8": (64, 3)}


def geotiff_bytes(levels: list[_Level], epsg: int = 3857,
                  pixel_scale: tuple[float, float] = (1.0, 1.0),
                  origin: tuple[float, float] = (0.0, 0.0),
                  compress: bool | str = True,
                  dtype: str = "f8") -> bytes:
    """Assemble the tiled multi-IFD GeoTIFF container in memory.

    CLOUD-OPTIMIZED layout (what rio-cogeo's validator — and the
    reference's post-write ``cog_validate``, ref processing.py:
    511-514 — requires): the 8-byte header, every IFD, the tile
    offset/count arrays, and the geo payloads all lead the file so a
    reader gets the complete structure in one small ranged read;
    tile data follows, smallest overview first (the GDAL COG driver's
    order — low zooms stream before full resolution).

    MULTIBAND (T12 RGB composites, ref processing.py:727-739): when
    level tiles are 3-D ``(TILE, TILE, spp)``, the file is written
    chunky-interleaved (PlanarConfiguration 1) with
    PhotometricInterpretation RGB for spp >= 3 — ONE file for the
    composite, as the reference's ``dataset2cog`` without ``bands``.
    """
    codec = _codec_of(compress)
    compression = _TAG_OF[codec]
    if dtype not in _DTYPES:
        raise ValueError(f"unsupported COG dtype {dtype}")
    bits, sfmt = _DTYPES[dtype]
    np_dtype = np.dtype("<" + dtype)
    first_tiles = next(iter(levels[0].tiles.values()))
    spp = first_tiles.shape[2] if first_tiles.ndim == 3 else 1
    photometric = 2 if spp >= 3 else 1

    # ---- pass 1: compress tiles, measure structures ----------------
    level_bufs: list[list[bytes]] = []
    for lv in levels:
        bufs = []
        nx = math.ceil(lv.width / TILE)
        ny = math.ceil(lv.height / TILE)
        for ty in range(ny):
            for tx in range(nx):
                tile = lv.tiles.get((tx, ty))
                if tile is None:
                    shape = (TILE, TILE, spp) if spp > 1 \
                        else (TILE, TILE)
                    tile = np.zeros(shape, dtype=np.float64)
                if sfmt != 3:              # integer output: round+clip
                    info = np.iinfo(np_dtype)
                    # NaN survives rint/clip and casts to undefined
                    # ints (warp fills outside-footprint with NaN when
                    # no nodata is declared) — zero non-finite first
                    tile = np.where(np.isfinite(tile), tile, 0.0)
                    tile = np.clip(np.rint(tile), info.min, info.max)
                buf = np.ascontiguousarray(tile, dtype=np_dtype) \
                    .tobytes()
                if codec == "zstd":
                    buf = CMP.zstd_compress(buf)
                elif codec == "deflate":
                    buf = zlib.compress(buf, 6)
                bufs.append(buf)
        level_bufs.append(bufs)

    ifd_size = 2 + 12 * _N_TAGS + 4
    ifd_offs = [8 + i * ifd_size for i in range(len(levels))]
    cursor = 8 + len(levels) * ifd_size
    ext_offs: list[tuple[int, int]] = []   # (offsets_off, counts_off)
    for bufs in level_bufs:
        if len(bufs) > 1:
            ext_offs.append((cursor, cursor + 4 * len(bufs)))
            cursor += 8 * len(bufs)
        else:
            ext_offs.append((0, 0))
    bits_off = sfmt_off = 0
    if spp > 2:                            # count-spp arrays go external
        bits_off = cursor
        sfmt_off = cursor + 2 * spp
        cursor += 4 * spp
    scale_off = cursor
    tiepoint_off = scale_off + 24
    geokeys_off = tiepoint_off + 48
    data_start = geokeys_off + 32
    if data_start % 2:
        data_start += 1                    # TIFF word alignment

    # tile data offsets: smallest overview first
    tile_offs: list[list[int]] = [[] for _ in levels]
    pos = data_start
    for li in range(len(levels) - 1, -1, -1):
        for buf in level_bufs[li]:
            tile_offs[li].append(pos)
            pos += len(buf)

    # ---- pass 2: emit ----------------------------------------------
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offs[0])
    for li, (lv, bufs) in enumerate(zip(levels, level_bufs)):
        n_tiles = len(bufs)
        if spp == 1:
            bits_tag = (T_BITS_PER_SAMPLE, TYPE_SHORT, 1, bits)
            sfmt_tag = (T_SAMPLE_FORMAT, TYPE_SHORT, 1, sfmt)
        elif spp == 2:                     # two shorts fit inline
            bits_tag = (T_BITS_PER_SAMPLE, TYPE_SHORT, 2,
                        bits | (bits << 16))
            sfmt_tag = (T_SAMPLE_FORMAT, TYPE_SHORT, 2,
                        sfmt | (sfmt << 16))
        else:
            bits_tag = (T_BITS_PER_SAMPLE, TYPE_SHORT, spp, bits_off)
            sfmt_tag = (T_SAMPLE_FORMAT, TYPE_SHORT, spp, sfmt_off)
        tags = [
            (T_IMAGE_WIDTH, TYPE_LONG, 1, lv.width),
            (T_IMAGE_LENGTH, TYPE_LONG, 1, lv.height),
            bits_tag,
            (T_COMPRESSION, TYPE_SHORT, 1, compression),
            (T_PHOTOMETRIC, TYPE_SHORT, 1, photometric),
            (T_SAMPLES_PER_PIXEL, TYPE_SHORT, 1, spp),
            (T_TILE_WIDTH, TYPE_SHORT, 1, TILE),
            (T_TILE_LENGTH, TYPE_SHORT, 1, TILE),
            (T_TILE_OFFSETS, TYPE_LONG, n_tiles,
             tile_offs[li][0] if n_tiles == 1 else ext_offs[li][0]),
            (T_TILE_BYTE_COUNTS, TYPE_LONG, n_tiles,
             len(bufs[0]) if n_tiles == 1 else ext_offs[li][1]),
            sfmt_tag,
            (T_PLANAR_CONFIG, TYPE_SHORT, 1, 1),
            (T_MODEL_PIXEL_SCALE, TYPE_DOUBLE, 3, scale_off),
            (T_MODEL_TIEPOINT, TYPE_DOUBLE, 6, tiepoint_off),
            (T_GEO_KEY_DIRECTORY, TYPE_SHORT, 16, geokeys_off),
        ]
        assert len(tags) == _N_TAGS
        out += struct.pack("<H", len(tags))
        for t in sorted(tags):
            out += _entry(*t)
        out += struct.pack(
            "<I", ifd_offs[li + 1] if li + 1 < len(levels) else 0)
    for li, bufs in enumerate(level_bufs):
        if len(bufs) > 1:
            out += b"".join(struct.pack("<I", o)
                            for o in tile_offs[li])
            out += b"".join(struct.pack("<I", len(b)) for b in bufs)
    if spp > 2:
        out += struct.pack(f"<{spp}H", *([bits] * spp))
        out += struct.pack(f"<{spp}H", *([sfmt] * spp))
    out += struct.pack("<3d", pixel_scale[0], pixel_scale[1], 0.0)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, origin[0], origin[1], 0.0)
    # version 1.1.0, 3 keys: GTModelType=1 (projected), GTRasterType=1,
    # ProjectedCSType=epsg
    out += struct.pack("<16H",
                       1, 1, 0, 3,
                       1024, 0, 1, 1,
                       1025, 0, 1, 1,
                       3072, 0, 1, epsg)
    while len(out) < data_start:
        out += b"\x00"
    for li in range(len(levels) - 1, -1, -1):
        out += b"".join(level_bufs[li])
    return bytes(out)


def blocks_to_levels(rows: Iterable, nodata: float = 0.0) -> list[_Level]:
    """Group raster-block rows (operators/raster.py schema, possibly
    multiple ``level`` values) into writer levels, padded to TILE."""
    by_level: dict[int, dict[tuple[int, int], np.ndarray]] = {}
    dims: dict[int, tuple[int, int]] = {}
    for r in rows:
        lvl = int(getattr(r, "level", 0) or 0)
        arr = np.asarray(r.pixels, dtype=np.float64).reshape(
            int(r.height), int(r.width))
        nd = nodata if r.nodata is None else float(r.nodata)
        by_level.setdefault(lvl, {})[(int(r.block_x), int(r.block_y))] = \
            _pad(arr, nd)
        w = int(r.block_x) * TILE + int(r.width)
        h = int(r.block_y) * TILE + int(r.height)
        cw, ch = dims.get(lvl, (0, 0))
        dims[lvl] = (max(cw, w), max(ch, h))
    return [
        _Level(dims[lvl][0], dims[lvl][1], by_level[lvl])
        for lvl in sorted(by_level)
    ]


def _attach_sidecars(blocks, georef, dtypes):
    """Broadcast-join the tiny per-dataset georef + dtype sidecars
    onto the block stream (no shuffle added); missing sidecars become
    typed NULL columns so the group kernel has one code path."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    if georef is not None:
        blocks = blocks.join(
            broadcast(georef.dropDuplicates(["dataset"])),
            "dataset", "left")
    else:
        for c, t in (("origin_x", "double"), ("origin_y", "double"),
                     ("pixel_sx", "double"), ("pixel_sy", "double"),
                     ("georef_srid", "int")):
            blocks = blocks.withColumn(c, F.lit(None).cast(t))
    if dtypes is not None:
        blocks = blocks.join(
            broadcast(dtypes.dropDuplicates(["dataset"])
                      .withColumnRenamed("dtype", "__dtype")),
            "dataset", "left")
    else:
        blocks = blocks.withColumn("__dtype",
                                   F.lit(None).cast("string"))
    return blocks


def _group_dtype(first, fallback: str) -> str:
    """Per-group output sample type: the probed source dtype when the
    sidecar carries one, else the caller's choice (the reference
    preserves the source dtype, ref ingest/config.py:92-101)."""
    dt = first.get("__dtype")
    if isinstance(dt, str) and dt in _DTYPES:
        return dt
    return fallback


def assemble_cog_tables(blocks, dst_dir: str, epsg: int = 3857,
                        georef=None, dtype: str = "f8", dtypes=None):
    """Distributed COG assembly: one GeoTIFF per (dataset, band),
    written by the task holding that group; returns a manifest
    DataFrame (dataset, band, path, n_levels, n_blocks, file_bytes).

    ``georef`` (optional): a per-dataset GEOREF_SCHEMA DataFrame
    (operators/raster.py) from the format sources' ``georef_from_*``
    — broadcast-joined onto the blocks so each output file carries
    the grid's real ModelPixelScale/ModelTiepoint/EPSG instead of the
    unit defaults (the reference preserves georeferencing through
    GDAL end to end, ref ingest/processing.py:469-552).

    ``dtypes`` (optional): a per-dataset ``(dataset, dtype)`` sidecar
    (e.g. ``sources/geotiff.dtypes_from_geotiff``) — when present, a
    dataset's output preserves its probed source sample type and the
    ``dtype`` argument is only the fallback.
    """
    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package

    ship_package(blocks.sparkSession)
    blocks = _attach_sidecars(blocks, georef, dtypes)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        dataset = pdf["dataset"].iloc[0]
        band = int(pdf["band"].iloc[0])
        first = pdf.iloc[0]
        ox = first.get("origin_x")
        scale = (float(first["pixel_sx"]), float(first["pixel_sy"])) \
            if pd.notna(ox) else (1.0, 1.0)
        origin = (float(first["origin_x"]), float(first["origin_y"])) \
            if pd.notna(ox) else (0.0, 0.0)
        g_epsg = int(first["georef_srid"]) \
            if pd.notna(first.get("georef_srid")) else epsg
        rows = list(pdf.itertuples(index=False))
        levels = blocks_to_levels(rows)
        safe = str(dataset).replace("/", "_")
        path = os.path.join(dst_dir, f"{safe}_band{band}.tif")
        nbytes = write_geotiff(path, levels, epsg=g_epsg,
                               pixel_scale=scale, origin=origin,
                               dtype=_group_dtype(first, dtype))
        return pd.DataFrame([{
            "dataset": dataset, "band": band, "path": path,
            "n_levels": len(levels), "n_blocks": len(rows),
            "file_bytes": nbytes,
        }])

    return blocks.groupBy("dataset", "band").applyInPandas(
        write_group,
        "dataset string, band int, path string, n_levels int, "
        "n_blocks long, file_bytes long")


def blocks_to_levels_rgb(rows: Iterable, nodata: float = 0.0) -> list:
    """Group multi-band block rows into writer levels of
    ``(TILE, TILE, n_bands)`` chunky tiles (bands sorted by band id;
    missing band-blocks fill with nodata)."""
    by_key: dict[tuple[int, int, int], dict[int, np.ndarray]] = {}
    dims: dict[int, tuple[int, int]] = {}
    bands: set[int] = set()
    for r in rows:
        lvl = int(getattr(r, "level", 0) or 0)
        band = int(r.band)
        bands.add(band)
        arr = np.asarray(r.pixels, dtype=np.float64).reshape(
            int(r.height), int(r.width))
        nd = nodata if r.nodata is None else float(r.nodata)
        by_key.setdefault(
            (lvl, int(r.block_x), int(r.block_y)), {})[band] = \
            _pad(arr, nd)
        w = int(r.block_x) * TILE + int(r.width)
        h = int(r.block_y) * TILE + int(r.height)
        cw, ch = dims.get(lvl, (0, 0))
        dims[lvl] = (max(cw, w), max(ch, h))
    order = sorted(bands)
    by_level: dict[int, dict[tuple[int, int], np.ndarray]] = {}
    for (lvl, bx, by), per_band in by_key.items():
        stack = np.stack(
            [per_band.get(b, np.full((TILE, TILE), nodata))
             for b in order], axis=2)
        by_level.setdefault(lvl, {})[(bx, by)] = stack
    return [_Level(dims[lvl][0], dims[lvl][1], by_level[lvl])
            for lvl in sorted(by_level)]


def assemble_cog_rgb_tables(blocks, dst_dir: str, epsg: int = 3857,
                            georef=None, dtype: str = "f8",
                            dtypes=None):
    """T12 multiband assembly: ONE chunky-interleaved RGB COG per
    (dataset, subdataset), all bands together — the reference's
    ``dataset2cog`` without a ``bands`` list (ref processing.py:
    727-739).  Same broadcast georef/dtype sidecar plan as
    ``assemble_cog_tables``; the only difference is the grouping key
    omits ``band``.
    """
    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package

    ship_package(blocks.sparkSession)
    blocks = _attach_sidecars(blocks, georef, dtypes)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        dataset = pdf["dataset"].iloc[0]
        first = pdf.iloc[0]
        ox = first.get("origin_x")
        scale = (float(first["pixel_sx"]), float(first["pixel_sy"])) \
            if pd.notna(ox) else (1.0, 1.0)
        origin = (float(first["origin_x"]), float(first["origin_y"])) \
            if pd.notna(ox) else (0.0, 0.0)
        g_epsg = int(first["georef_srid"]) \
            if pd.notna(first.get("georef_srid")) else epsg
        rows = list(pdf.itertuples(index=False))
        levels = blocks_to_levels_rgb(rows)
        n_bands = len({int(r.band) for r in rows})
        safe = str(dataset).replace("/", "_")
        # the subdataset is part of the GROUP key, so it must be part
        # of the file name too — else two subdatasets of one dataset
        # race to the same path and silently overwrite each other
        sub = pdf["subdataset"].iloc[0] \
            if "subdataset" in pdf.columns else None
        if sub is not None and pd.notna(sub) and str(sub):
            safe_sub = str(sub).replace("/", "_").replace(":", "_")
            path = os.path.join(dst_dir, f"{safe}_{safe_sub}_rgb.tif")
        else:
            sub = None
            path = os.path.join(dst_dir, f"{safe}_rgb.tif")
        nbytes = write_geotiff(path, levels, epsg=g_epsg,
                               pixel_scale=scale, origin=origin,
                               dtype=_group_dtype(first, dtype))
        return pd.DataFrame([{
            "dataset": dataset, "subdataset": sub,
            "n_bands": n_bands, "path": path,
            "n_levels": len(levels), "n_blocks": len(rows),
            "file_bytes": nbytes,
        }])

    key = ["dataset"] + (["subdataset"]
                         if "subdataset" in blocks.columns else [])
    return blocks.groupBy(*key).applyInPandas(
        write_group,
        "dataset string, subdataset string, n_bands int, path string, "
        "n_levels int, n_blocks long, file_bytes long")
