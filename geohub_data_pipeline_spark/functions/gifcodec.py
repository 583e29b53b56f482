"""GIF87a/89a codec — stdlib LZW decode (+ encoder for fixtures).

Completes the multimodal decode matrix (operators/multimodal.py): the
reference's media probing runs through GDAL/PIL which fully decode
GIF; this is the same capability from the published spec
(GIF89a specification, CompuServe 1990; LZW variant with variable
code width, clear/EOI codes, LSB-first bit packing, 12-bit cap).

Supports: global + local color tables, interlaced images (the
four-pass row schedule), multiple frames (first frame decoded for
stats; frame count reported), GIF89a extensions (skipped per spec
block structure).  Output is an (H, W) palette-index array plus the
RGB palette, or an (H, W, 3) RGB array via ``decode_gif_rgb``.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """Decode the concatenated image sub-block bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi                     # truncated stream: stop
        byte = bitpos >> 3
        shift = bitpos & 7
        val = data[byte] | (data[byte + 1] << 8 if byte + 1 < len(data)
                            else 0) | ((data[byte + 2] << 16)
                                       if byte + 2 < len(data) else 0)
        bitpos += width
        return (val >> shift) & ((1 << width) - 1)

    def reset_table():
        return ({i: bytes((i,)) for i in range(clear)}, clear + 2,
                min_code_size + 1)

    table, next_code, width = reset_table()
    prev: bytes | None = None
    while len(out) < expected:
        code = read_code(width)
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]        # the KwKwK case
        else:
            break                          # corrupt stream: stop clean
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table = {bytes((i,)): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes((b,))
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            # GIF writers bump the width when the NEXT code would not
            # fit the current width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        prev = bytes((b,))
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """First frame -> (indices (H, W) uint8, palette (N, 3) uint8,
    n_frames).  Raises ValueError on malformed input."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("bad GIF header")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    first = None
    first_pal = gct
    n_frames = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                  # trailer
            break
        if block == 0x21:                  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB",
                                                      payload, pos)
        pos += 9
        if w == 0 or h == 0:
            raise ValueError("GIF image descriptor with zero dims")
        pal = gct
        if ipacked & 0x80:                 # local color table
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, np.uint8,
                                n * 3, pos).reshape(n, 3)
            pos += n * 3
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1                           # block terminator
        n_frames += 1
        if first is None:
            raw = _lzw_decode(b"".join(chunks), min_code, w * h)
            if len(raw) < w * h:
                raw += bytes(w * h - len(raw))
            arr = np.frombuffer(bytes(raw[:w * h]),
                                np.uint8).reshape(h, w)
            if ipacked & 0x40:             # interlaced: 4-pass schedule
                out = np.empty_like(arr)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for row in range(start, h, step):
                        out[row] = arr[src]
                        src += 1
                arr = out
            first = arr
            first_pal = pal
    if first is None:
        raise ValueError("GIF with no image descriptor")
    if first_pal is None:
        first_pal = np.stack([np.arange(256, dtype=np.uint8)] * 3,
                             axis=1)
    return first, first_pal, n_frames


def decode_gif_rgb(payload: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 RGB via the palette."""
    idx, pal, _ = decode_gif(payload)
    return pal[np.minimum(idx, len(pal) - 1)]


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """(H, W) uint8 indices + (N, 3) palette -> GIF89a bytes."""
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (int(n) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    min_code = max(2, bits)
    out.append(min_code)
    rows = indices
    if interlace:
        order = [r for start, step in _INTERLACE_PASSES
                 for r in range(start, h, step)]
        rows = indices[order]
    data = _lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
