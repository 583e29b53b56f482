"""Minimal AVI (RIFF) container codec for Motion-JPEG video — stdlib only.

Video at pipeline scale is an opaque binary column plus typed
metadata; what the engine owes is the CONTAINER plumbing — walk the
RIFF chunk tree, read the stream headers, locate the frame chunks,
honor the even-byte padding rule — and frame-level access so a
sampling UDF can pull every Nth frame without decoding the rest.
Motion-JPEG is the one mainstream video codec whose frames are
standalone JPEG images, which lets the existing baseline JPEG codec
(functions/jpegcodec.py) decode sampled frames with no new
dependencies.

Layout written/parsed (the classic AVI 1.0 shape):

    RIFF('AVI ')
      LIST('hdrl')
        'avih' (MainAVIHeader: µs/frame, total frames, dims)
        LIST('strl')
          'strh' (AVIStreamHeader: fcc 'vids', handler 'MJPG',
                  rate/scale, length)
          'strf' (BITMAPINFOHEADER: dims, biCompression 'MJPG')
      LIST('movi')
        '00dc' <JPEG bytes> [pad to even]  x n_frames
      'idx1'  (one entry per frame chunk)

Parsing is defensive: fourcc/size walking with bounds checks, the
even-padding rule applied after every chunk, headers validated
against the frame chunks actually present.

No counterpart in the reference (it is a geo ingest pipeline); this
covers the multimodal bucket of SURVEY §2-beyond alongside the
PNG/JPEG/GIF and WAV kernels.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg_avi(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Wrap pre-encoded JPEG frames into an AVI/MJPEG container."""
    n = len(frames)
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0x10, n, 0, 1, 0,
        width, height, 0, 0, 0, 0)
    # flags, prio+lang, initialframes, scale, rate, start, length,
    # bufsize, quality, samplesize, then the rcFrame rect
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: (fourcc, flags, offset-from-movi-list-type, size)
    idx, off = [], 4
    for f in frames:
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container: header metadata + raw JPEG frames.

    Returns ``{"width", "height", "fps", "n_frames", "frames":
    [bytes, ...]}``.  Raises ``ValueError`` on malformed input
    (truncated chunks, missing headers, frame-count mismatch).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if 8 + riff_size > len(data):
        raise ValueError("truncated RIFF payload")

    meta: dict = {"frames": []}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(
                    f"chunk {fourcc!r} overruns its parent")
            if fourcc == b"LIST":
                list_type = data[body_start:body_start + 4]
                if list_type in (b"hdrl", b"strl", b"movi"):
                    walk(body_start + 4, body_end)
            elif fourcc == b"avih":
                if size < 20:
                    raise ValueError(
                        f"avih chunk too small ({size} bytes)")
                us_pf, _, _, _, total = struct.unpack_from(
                    "<5I", data, body_start)
                meta["fps"] = 1_000_000 // us_pf if us_pf else 0
                meta["n_frames_hdr"] = total
            elif fourcc == b"strf":
                if size < 12:
                    raise ValueError(
                        f"strf chunk too small ({size} bytes)")
                _, w, h = struct.unpack_from("<Iii", data, body_start)
                meta["width"], meta["height"] = w, abs(h)
            elif fourcc in (b"00dc", b"00db"):
                meta["frames"].append(data[body_start:body_end])
            pos = body_end + (size % 2)          # even-byte padding

    walk(12, 8 + riff_size)
    if "width" not in meta or "n_frames_hdr" not in meta:
        raise ValueError("missing avih/strf headers")
    if meta["n_frames_hdr"] != len(meta["frames"]):
        raise ValueError(
            f"header declares {meta['n_frames_hdr']} frames, "
            f"movi contains {len(meta['frames'])}")
    meta["n_frames"] = len(meta["frames"])
    del meta["n_frames_hdr"]
    return meta
