"""PMTiles v3 archive writer/reader — the reference's primary output.

The reference ships tippecanoe-produced ``.pmtiles`` archives and
audits them by reading their metadata (ref /root/reference/ingest/
processing.py:257-265, 349-359; fgb_upload/main.py:54-66).  This
module writes structurally valid PMTiles v3 archives straight from
the tile DataFrame (operators/tiling.py) and reads them back:

* 127-byte v3 header (magic ``PMTiles``, version 3),
* Hilbert-ordered tile ids (the spec's addressing scheme),
* varint-encoded directories (delta tile ids, run lengths, lengths,
  offsets) with run-length coalescing of identical consecutive tiles
  and automatic leaf-directory spill once the root would exceed the
  spec's 16 KiB header+root budget (entries with run_length == 0 in
  the root point into the leaf section),
* JSON metadata with ``vector_layers`` (the field the reference's
  backfill reads, ref fgb_upload/main.py:54-66),
* internal/tile compression = none (codec slot).

``write_pmtiles_tables`` assembles one archive per dataset inside
``applyInPandas`` (multi-layer datasets -> one archive listing every
layer — the T9 joined mode), returning a manifest DataFrame.
Round-trip verified by tests/test_pmtiles.py with an independent
parser path (reader vs writer share only the varint helpers).
"""

from __future__ import annotations

import gzip
import json
import os
import struct

HEADER_SIZE = 127
MAGIC = b"PMTiles"
VERSION = 3
COMPRESSION_NONE = 1
COMPRESSION_GZIP = 2
COMPRESSION_ZSTD = 4
TILETYPE_UNKNOWN = 0


def _gzip(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)       # mtime=0: deterministic bytes


# ---------------------------------------------------------------------------
# Hilbert tile addressing (PMTiles tile ids)
# ---------------------------------------------------------------------------

def _xy2d(z: int, x: int, y: int) -> int:
    """Hilbert curve distance of (x, y) on a 2^z x 2^z grid."""
    d = 0
    s = (1 << z) >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _d2xy(z: int, d: int) -> tuple[int, int]:
    x = y = 0
    t = d
    s = 1
    while s < (1 << z):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    base = ((1 << (2 * z)) - 1) // 3          # sum of 4^i for i < z
    return base + _xy2d(z, x, y)


def tileid_to_zxy(tid: int) -> tuple[int, int, int]:
    z = 0
    while ((1 << (2 * (z + 1))) - 1) // 3 <= tid:
        z += 1
    x, y = _d2xy(z, tid - ((1 << (2 * z)) - 1) // 3)
    return z, x, y


# ---------------------------------------------------------------------------
# Varints + directory serialization
# ---------------------------------------------------------------------------

def _write_varint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, pos
        shift += 7


def _serialize_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length), sorted by id."""
    out = bytearray()
    _write_varint(out, len(entries))
    last = 0
    for tid, _off, _len, _rl in entries:
        _write_varint(out, tid - last)
        last = tid
    for _tid, _off, _len, rl in entries:
        _write_varint(out, rl)
    for _tid, _off, ln, _rl in entries:
        _write_varint(out, ln)
    for _tid, off, _ln, _rl in entries:
        _write_varint(out, off + 1)          # explicit offsets (no 0-chain)
    return bytes(out)


def _parse_directory(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(buf, 0)
    tids, rls, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        tids.append(last)
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        rls.append(v)
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        lens.append(v)
    prev_off = prev_len = 0
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        off = prev_off + prev_len if v == 0 else v - 1
        offs.append(off)
        prev_off, prev_len = off, lens[i]
    return list(zip(tids, offs, lens, rls))


# Spec guidance: header + root directory should fit the first 16 KiB so
# clients resolve any tile in at most 2 ranged reads (root -> leaf).
ROOT_DIR_BUDGET = 16384 - HEADER_SIZE


def _split_directories(entries, codec):
    """(root_blob, leaf_section_bytes, n_tile_entries).

    Root-only while it fits ROOT_DIR_BUDGET; otherwise chunk the tile
    entries into leaf directories (doubling the chunk size until the
    root of leaf pointers fits).  Root leaf-pointer entries carry
    run_length == 0 with (offset, length) into the leaf section —
    the spec's discriminator for "points at a leaf directory".
    """
    root = codec(_serialize_directory(entries))
    if len(root) <= ROOT_DIR_BUDGET:
        return root, b"", len(entries)
    leaf_size = 4096
    while True:
        root_entries: list[tuple[int, int, int, int]] = []
        leaves = bytearray()
        for i in range(0, len(entries), leaf_size):
            chunk = entries[i:i + leaf_size]
            blob = codec(_serialize_directory(chunk))
            root_entries.append((chunk[0][0], len(leaves), len(blob), 0))
            leaves += blob
        root = codec(_serialize_directory(root_entries))
        if len(root) <= ROOT_DIR_BUDGET or leaf_size >= len(entries):
            return root, bytes(leaves), len(entries)
        leaf_size *= 2


# ---------------------------------------------------------------------------
# Archive write / read
# ---------------------------------------------------------------------------

TILETYPE_MVT = 1


def write_pmtiles(path: str, tiles: list[tuple[int, int, int, bytes]],
                  metadata: dict, tile_type: int = TILETYPE_UNKNOWN,
                  compress: bool | str = True) -> int:
    """Write tiles [(z, x, y, payload)] + metadata; returns file size.

    compress: True/"gzip" gzips tiles, directory, and metadata (spec
    compression id 2 — the universally-readable default); "zstd"
    uses spec compression id 4 via the Arrow codec (self-describing
    RFC 8878 frames); False writes raw.  The header records the codec
    actually used.
    """
    if compress == "zstd":
        from geohub_data_pipeline_spark.functions import (
            compression as _CMP,
        )
        codec = _CMP.zstd_compress
        comp = COMPRESSION_ZSTD
    elif compress:
        codec = _gzip
        comp = COMPRESSION_GZIP
    else:
        codec = (lambda b: b)
        comp = COMPRESSION_NONE
    keyed = sorted(
        ((zxy_to_tileid(z, x, y), payload) for z, x, y, payload in tiles))
    data = bytearray()
    entries: list[tuple[int, int, int, int]] = []
    contents: dict[bytes, int] = {}
    for tid, payload in keyed:
        blob = codec(payload)
        if blob in contents:                  # de-dupe identical tiles
            off, ln = contents[blob]
        else:
            off, ln = len(data), len(blob)
            contents[blob] = (off, ln)
            data += blob
        if entries:                           # run-length coalescing:
            ptid, poff, pln, prl = entries[-1]
            if tid == ptid + prl and (off, ln) == (poff, pln):
                entries[-1] = (ptid, poff, pln, prl + 1)
                continue
        entries.append((tid, off, ln, 1))

    root, leaves, n_tile_entries = _split_directories(entries, codec)
    meta = codec(json.dumps(metadata, sort_keys=True).encode())

    zs = [t[0] for t in tiles] or [0]
    root_off = HEADER_SIZE
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    tile_off = leaf_off + len(leaves)
    header = bytearray(HEADER_SIZE)
    header[0:7] = MAGIC
    header[7] = VERSION
    struct.pack_into("<QQQQQQQQ", header, 8,
                     root_off, len(root), meta_off, len(meta),
                     leaf_off, len(leaves), tile_off, len(data))
    struct.pack_into("<QQQ", header, 72,
                     len(keyed), n_tile_entries, len(contents))
    header[96] = 1                            # clustered
    header[97] = comp                         # internal compression
    header[98] = comp                         # tile compression
    header[99] = tile_type
    header[100] = min(zs)                     # min zoom
    header[101] = max(zs)                     # max zoom
    # bounds/center left zeroed (optional for our audits)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(header) + root + meta + leaves + bytes(data))
    return HEADER_SIZE + len(root) + len(meta) + len(leaves) + len(data)


def read_pmtiles(path: str) -> dict:
    """Read header, metadata, and all tiles (S11/S12 analog)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[0:7] != MAGIC or buf[7] != VERSION:
        raise ValueError("not a PMTiles v3 archive")
    (root_off, root_len, meta_off, meta_len,
     leaf_off, _leaf_len, tile_off, tile_len) = struct.unpack_from(
        "<QQQQQQQQ", buf, 8)
    n_addressed, n_entries, n_contents = struct.unpack_from("<QQQ", buf, 72)
    internal_comp, tile_comp = buf[97], buf[98]

    def _un(blob: bytes, comp: int) -> bytes:
        if comp == COMPRESSION_GZIP:
            return gzip.decompress(blob)
        if comp == COMPRESSION_ZSTD:
            from geohub_data_pipeline_spark.functions import (
                compression as _CMP,
            )
            return _CMP.zstd_decompress(blob)
        return blob

    tiles = {}

    def _walk(entries, depth=0):
        for tid, off, ln, rl in entries:
            if rl == 0:                       # leaf-directory pointer
                if depth:
                    raise ValueError("nested leaf directories")
                _walk(_parse_directory(
                    _un(buf[leaf_off + off:leaf_off + off + ln],
                        internal_comp)), depth + 1)
                continue
            for k in range(rl):               # run-length expansion
                z, x, y = tileid_to_zxy(tid + k)
                tiles[(z, x, y)] = _un(
                    buf[tile_off + off:tile_off + off + ln], tile_comp)

    _walk(_parse_directory(
        _un(buf[root_off:root_off + root_len], internal_comp)))
    return {
        "metadata": json.loads(
            _un(buf[meta_off:meta_off + meta_len], internal_comp)),
        "tiles": tiles,
        "min_zoom": buf[100],
        "max_zoom": buf[101],
        "n_addressed_tiles": n_addressed,
        "n_tile_entries": n_entries,
        "n_tile_contents": n_contents,
        "clustered": buf[96] == 1,
    }


def pmtiles_layer_names(path: str) -> list[str]:
    """vector_layers ids (ref fgb_upload/main.py:54-66)."""
    meta = read_pmtiles(path)["metadata"]
    return [lyr["id"] for lyr in meta.get("vector_layers", [])]


def write_pmtiles_tables(tiles_df, dst_dir: str,
                         payload_format: str = "json"):
    """One archive per dataset from a build_tiles output DataFrame
    (every layer of the dataset in one archive — T9 joined mode);
    returns a manifest (dataset, path, n_tiles, n_layers, file_bytes,
    min_zoom, max_zoom).

    payload_format: 'json' (audit payloads; layers merged into one
    JSON doc) or 'mvt' (real vector tiles; multi-layer merge is
    protobuf message concatenation — an MVT Tile IS repeated Layer
    fields, so concatenating per-layer blobs yields a valid
    multi-layer tile).
    """
    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package

    ship_package(tiles_df.sparkSession)
    if "dataset" not in tiles_df.columns:
        from pyspark.sql import functions as F
        tiles_df = tiles_df.withColumn("dataset", F.lit("tiles"))

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        dataset = pdf["dataset"].iloc[0]
        layers = sorted(pdf["layer"].unique())
        # tilestats-style metadata the audits read (T17/S11)
        # name/description/attribution match the tippecanoe flags the
        # reference passes (ref ingest/processing.py:251-254)
        meta = {
            "name": str(dataset),
            "description": str(dataset),
            "attribution": "United Nations Development Programme (UNDP)",
            "vector_layers": [{"id": str(l)} for l in layers],
            "tilestats": {
                "layerCount": len(layers),
                "layers": [
                    {"layer": str(l),
                     "count": int(pdf[pdf["layer"] == l]["n_features"].sum())}
                    for l in layers
                ],
            },
        }
        # one payload per tile id: merge per-layer payloads
        per_tile: dict[tuple[int, int, int], dict] = {}
        for r in pdf.itertuples(index=False):
            key = (int(r.z), int(r.x), int(r.y))
            per_tile.setdefault(key, {})[str(r.layer)] = bytes(r.payload)
        if payload_format == "mvt":
            tiles = [
                (z, x, y,
                 b"".join(layer_map[k] for k in sorted(layer_map)))
                for (z, x, y), layer_map in per_tile.items()
            ]
        else:
            tiles = [
                (z, x, y,
                 json.dumps({"layers": {k: json.loads(v)
                                        for k, v in layer_map.items()}},
                            sort_keys=True,
                            separators=(",", ":")).encode())
                for (z, x, y), layer_map in per_tile.items()
            ]
        safe = str(dataset).replace("/", "_")
        path = os.path.join(dst_dir, f"{safe}.pmtiles")
        ttype = TILETYPE_MVT if payload_format == "mvt" else TILETYPE_UNKNOWN
        nbytes = write_pmtiles(path, tiles, meta, tile_type=ttype)
        return pd.DataFrame([{
            "dataset": dataset, "path": path, "n_tiles": len(tiles),
            "n_layers": len(layers), "file_bytes": nbytes,
            "min_zoom": int(pdf["z"].min()), "max_zoom": int(pdf["z"].max()),
        }])

    return tiles_df.groupBy("dataset").applyInPandas(
        write_group,
        "dataset string, path string, n_tiles long, n_layers int, "
        "file_bytes long, min_zoom int, max_zoom int")
