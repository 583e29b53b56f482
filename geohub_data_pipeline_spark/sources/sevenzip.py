"""Minimal .7z container reader — stdlib only (``lzma`` + ``struct``).

The reference mounts ``.7z`` uploads through GDAL's ``/vsi7z/`` prefix
(ref ingest/utils.py:23-32); this container has no GDAL and no py7zr,
so the common-case container is decoded directly from the public
format spec (7zFormat.txt, shipped with the LZMA SDK / 7-Zip):

* signature header -> next-header offset/size,
* plain (kHeader) or LZMA-compressed (kEncodedHeader) headers,
* single-coder folders using Copy (0x00), LZMA1 (0x030101) or
  LZMA2 (0x21) — decoded via ``lzma.FORMAT_RAW`` with filter
  parameters recovered from the coder properties,
* solid multi-file streams via SubStreamsInfo.

Anything outside that envelope (BCJ/delta filter chains, AES
encryption, multi-coder bind pairs, external structures) raises
``ValueError`` — the archive source quarantines the blob exactly like
a corrupt zip, never fails the task.
"""

from __future__ import annotations

import lzma
import struct

MAGIC = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZES = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_CODEC_COPY = b"\x00"
_CODEC_LZMA2 = b"\x21"
_CODEC_LZMA1 = b"\x03\x01\x01"


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("7z: truncated header")
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def take(self, n: int) -> bytes:
        v = self.buf[self.pos:self.pos + n]
        if len(v) != n:
            raise ValueError("7z: truncated header")
        self.pos += n
        return v

    def num(self) -> int:
        """7z variable-length number (REAL_UINT64 encoding)."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if (first & mask) == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        bits: list[bool] = []
        b = 0
        mask = 0
        for _ in range(n):
            if mask == 0:
                b = self.byte()
                mask = 0x80
            bits.append(bool(b & mask))
            mask >>= 1
        return bits


def _skip_crcs(r: _Reader, n: int) -> None:
    all_defined = r.byte()
    defined = [True] * n if all_defined else r.bitvector(n)
    r.take(4 * sum(defined))


def _read_pack_info(r: _Reader) -> tuple[int, list[int]]:
    pack_pos = r.num()
    n = r.num()
    sizes: list[int] = []
    while True:
        t = r.num()
        if t == _K_END:
            break
        if t == _K_SIZE:
            sizes = [r.num() for _ in range(n)]
        elif t == _K_CRC:
            _skip_crcs(r, n)
        else:
            raise ValueError(f"7z: unexpected pack-info prop {t}")
    if len(sizes) != n:
        raise ValueError("7z: missing pack sizes")
    return pack_pos, sizes


def _read_folder(r: _Reader) -> tuple[bytes, bytes]:
    n_coders = r.num()
    if n_coders != 1:
        raise ValueError("7z: multi-coder folders unsupported")
    flags = r.byte()
    codec = r.take(flags & 0x0F)
    if flags & 0x10:
        raise ValueError("7z: complex coders unsupported")
    props = b""
    if flags & 0x20:
        props = r.take(r.num())
    return codec, props


def _read_unpack_info(r: _Reader):
    if r.num() != _K_FOLDER:
        raise ValueError("7z: expected kFolder")
    n_folders = r.num()
    if r.byte() != 0:
        raise ValueError("7z: external folder data unsupported")
    folders = [_read_folder(r) for _ in range(n_folders)]
    sizes: list[int] = []
    crc_defined = [False] * n_folders
    while True:
        t = r.num()
        if t == _K_END:
            break
        if t == _K_UNPACK_SIZES:
            # single-coder folders: exactly one out-stream each
            sizes = [r.num() for _ in range(n_folders)]
        elif t == _K_CRC:
            all_def = r.byte()
            crc_defined = ([True] * n_folders if all_def
                           else r.bitvector(n_folders))
            r.take(4 * sum(crc_defined))
        else:
            raise ValueError(f"7z: unexpected unpack-info prop {t}")
    if len(sizes) != n_folders:
        raise ValueError("7z: missing unpack sizes")
    return folders, sizes, crc_defined


def _read_substreams(r: _Reader, n_folders: int, folder_sizes: list[int],
                     folder_crc_defined: list[bool]
                     ) -> tuple[list[int], list[int]]:
    counts = [1] * n_folders
    sizes: list[int] = []
    t = r.num()
    if t == _K_NUM_UNPACK_STREAM:
        counts = [r.num() for _ in range(n_folders)]
        t = r.num()
    if t == _K_SIZE:
        for f in range(n_folders):
            total = 0
            for _ in range(max(0, counts[f] - 1)):
                s = r.num()
                sizes.append(s)
                total += s
            if counts[f] > 0:
                sizes.append(folder_sizes[f] - total)
        t = r.num()
    else:
        for f in range(n_folders):
            if counts[f] == 1:
                sizes.append(folder_sizes[f])
            elif counts[f] != 0:
                raise ValueError("7z: substream sizes missing")
    while t != _K_END:
        if t == _K_CRC:
            # digests only for streams whose CRC is not already known
            n_unknown = sum(
                c if not (c == 1 and folder_crc_defined[f]) else 0
                for f, c in enumerate(counts))
            _skip_crcs(r, n_unknown)
        else:
            raise ValueError(f"7z: unexpected substreams prop {t}")
        t = r.num()
    return counts, sizes


def _read_streams_info(r: _Reader):
    pack_pos, pack_sizes = 0, []
    folders: list[tuple[bytes, bytes]] = []
    folder_sizes: list[int] = []
    crc_def: list[bool] = []
    counts: list[int] | None = None
    sub_sizes: list[int] | None = None
    while True:
        t = r.num()
        if t == _K_END:
            break
        if t == _K_PACK_INFO:
            pack_pos, pack_sizes = _read_pack_info(r)
        elif t == _K_UNPACK_INFO:
            folders, folder_sizes, crc_def = _read_unpack_info(r)
        elif t == _K_SUBSTREAMS:
            counts, sub_sizes = _read_substreams(
                r, len(folders), folder_sizes, crc_def)
        else:
            raise ValueError(f"7z: unexpected streams-info prop {t}")
    if counts is None:
        counts = [1] * len(folders)
        sub_sizes = list(folder_sizes)
    return pack_pos, pack_sizes, folders, folder_sizes, counts, sub_sizes


def _lzma2_filter(props: bytes) -> dict:
    if len(props) != 1:
        raise ValueError("7z: bad LZMA2 props")
    p = props[0]
    if p > 40:
        raise ValueError("7z: bad LZMA2 dict prop")
    dict_size = 0xFFFFFFFF if p == 40 else (2 | (p & 1)) << (p // 2 + 11)
    return {"id": lzma.FILTER_LZMA2, "dict_size": dict_size}


def _lzma1_filter(props: bytes) -> dict:
    if len(props) != 5:
        raise ValueError("7z: bad LZMA1 props")
    d = props[0]
    lc, rem = d % 9, d // 9
    lp, pb = rem % 5, rem // 5
    if pb > 4:
        raise ValueError("7z: bad LZMA1 props byte")
    dict_size = struct.unpack("<I", props[1:5])[0]
    return {"id": lzma.FILTER_LZMA1, "dict_size": max(dict_size, 1 << 12),
            "lc": lc, "lp": lp, "pb": pb}


def _decode_folder(codec: bytes, props: bytes, packed: bytes,
                   out_size: int) -> bytes:
    if codec == _CODEC_COPY:
        out = packed
    elif codec == _CODEC_LZMA2:
        dec = lzma.LZMADecompressor(lzma.FORMAT_RAW,
                                    filters=[_lzma2_filter(props)])
        out = dec.decompress(packed, max_length=out_size)
    elif codec == _CODEC_LZMA1:
        dec = lzma.LZMADecompressor(lzma.FORMAT_RAW,
                                    filters=[_lzma1_filter(props)])
        out = dec.decompress(packed, max_length=out_size)
    else:
        raise ValueError(f"7z: unsupported codec {codec.hex()}")
    if len(out) < out_size:
        raise ValueError("7z: folder stream shorter than declared")
    return out[:out_size]


def _read_files_info(r: _Reader) -> tuple[list[str], list[bool]]:
    n_files = r.num()
    names: list[str] | None = None
    empty = [False] * n_files
    while True:
        t = r.num()
        if t == _K_END:
            break
        size = r.num()
        end = r.pos + size
        if t == _K_EMPTY_STREAM:
            empty = r.bitvector(n_files)
        elif t == _K_NAME:
            if r.byte() != 0:
                raise ValueError("7z: external names unsupported")
            data = r.take(size - 1)
            names = data.decode("utf-16-le").split("\x00")[:-1]
        # every other property (times, attributes, dummy) is skipped
        r.pos = end
    if names is None or len(names) != n_files:
        raise ValueError("7z: missing file names")
    return names, empty


def extract_7z(payload: bytes) -> list[tuple[str, bytes]]:
    """Decode a .7z blob into ``[(member_name, content), ...]``.

    Raises ValueError for anything outside the supported envelope;
    callers treat that like a corrupt archive (quarantine row).
    """
    if payload[:6] != MAGIC:
        raise ValueError("7z: bad signature")
    if len(payload) < 32:
        raise ValueError("7z: truncated signature header")
    nh_off, nh_size = struct.unpack_from("<QQ", payload, 12)
    base = 32
    hdr = payload[base + nh_off: base + nh_off + nh_size]
    if len(hdr) != nh_size:
        raise ValueError("7z: truncated")
    r = _Reader(hdr)
    t = r.num()
    if t == _K_ENCODED_HEADER:
        # the header itself is one compressed folder
        (pack_pos, pack_sizes, folders, folder_sizes,
         _counts, _sub) = _read_streams_info(r)
        if len(folders) != 1 or len(pack_sizes) != 1:
            raise ValueError("7z: unsupported encoded header layout")
        start = base + pack_pos
        packed = payload[start:start + pack_sizes[0]]
        hdr = _decode_folder(folders[0][0], folders[0][1], packed,
                             folder_sizes[0])
        r = _Reader(hdr)
        t = r.num()
    if t != _K_HEADER:
        raise ValueError("7z: missing header")

    pack_pos = 0
    pack_sizes: list[int] = []
    folders = []
    folder_sizes = []
    counts: list[int] = []
    sub_sizes: list[int] = []
    names: list[str] = []
    empty: list[bool] = []
    while True:
        t = r.num()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            (pack_pos, pack_sizes, folders, folder_sizes,
             counts, sub_sizes) = _read_streams_info(r)
        elif t == _K_FILES_INFO:
            names, empty = _read_files_info(r)
        else:
            raise ValueError(f"7z: unexpected header prop {t}")

    # one packed stream per folder (single-coder => no bind pairs)
    if len(pack_sizes) != len(folders):
        raise ValueError("7z: packed-stream/folder mismatch unsupported")

    # decompress folders and slice substreams in order
    contents: list[bytes] = []
    offset = base + pack_pos
    si = 0
    for f, (codec, props) in enumerate(folders):
        packed = payload[offset:offset + pack_sizes[f]]
        offset += pack_sizes[f]
        out = _decode_folder(codec, props, packed, folder_sizes[f])
        at = 0
        for _ in range(counts[f]):
            contents.append(out[at:at + sub_sizes[si]])
            at += sub_sizes[si]
            si += 1

    out_files: list[tuple[str, bytes]] = []
    ci = 0
    for name, is_empty in zip(names, empty):
        if is_empty:
            continue                      # directories / empty files
        if ci >= len(contents):
            raise ValueError("7z: more non-empty files than streams")
        out_files.append((name.replace("\\", "/"), contents[ci]))
        ci += 1
    return out_files
