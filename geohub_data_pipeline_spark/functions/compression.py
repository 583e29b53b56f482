"""Codec negotiation for artifact sinks (COG tiles, PMTiles blobs).

The reference's COG profile compresses with ZSTD
(ref ingest/config.py:92-101 ``COMPRESS=ZSTD``) and PMTiles reserves
spec compression id 4 for it.  No python-level zstd module ships in
this environment, but pyarrow's bundled Arrow codec does — so ZSTD is
negotiated: use it when pyarrow exposes it, fall back to the stdlib
deflate/gzip codecs otherwise, and always RECORD the codec actually
used in the artifact header (TIFF Compression tag / PMTiles header
byte) so readers never guess.

RFC 8878 frames written by the codec carry the Frame_Content_Size, so
a 10-line header parse recovers the decompressed size that
``pyarrow.Codec.decompress`` requires — blobs stay self-describing
with no side-channel length.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

# TIFF Compression tag values
TIFF_NONE = 1
TIFF_DEFLATE = 8           # Adobe deflate (zlib)
TIFF_ZSTD = 50000          # libtiff-registered ZSTD

# PMTiles spec compression ids
PMT_NONE = 1
PMT_GZIP = 2
PMT_ZSTD = 4


def zstd_available() -> bool:
    try:
        import pyarrow as pa
        return bool(pa.Codec.is_available("zstd"))
    except Exception:
        return False


def zstd_compress(data: bytes, level: int = 9) -> bytes:
    import pyarrow as pa
    return bytes(pa.Codec("zstd", compression_level=level).compress(data))


def zstd_frame_content_size(frame: bytes) -> int | None:
    """Frame_Content_Size from an RFC 8878 frame header (None when
    the frame omits it)."""
    if len(frame) < 6 or frame[:4] != ZSTD_MAGIC:
        return None
    fhd = frame[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_flag = fhd & 0x3
    off = 5
    if not single_segment:
        off += 1                           # Window_Descriptor
    off += (0, 1, 2, 4)[did_flag]          # Dictionary_ID
    try:
        if fcs_flag == 0:
            return frame[off] if single_segment else None
        if fcs_flag == 1:
            return struct.unpack_from("<H", frame, off)[0] + 256
        if fcs_flag == 2:
            return struct.unpack_from("<I", frame, off)[0]
        return struct.unpack_from("<Q", frame, off)[0]
    except (struct.error, IndexError):
        return None


def zstd_decompress(frame: bytes, size: int | None = None) -> bytes:
    import pyarrow as pa
    if size is None:
        size = zstd_frame_content_size(frame)
    if size is None:
        raise ValueError("zstd frame lacks content size; pass size=")
    return bytes(pa.Codec("zstd").decompress(frame, size))


def negotiate(preferred: str = "zstd") -> str:
    """Pick the artifact codec: the preferred one when its
    implementation is present, else the stdlib fallback."""
    if preferred == "zstd" and zstd_available():
        return "zstd"
    return "deflate"
