"""Multimodal (image/audio/video) column operators — north star.

Media are opaque ``binary`` payload columns with typed metadata; all
compute-heavy work is Arrow-batched ``mapInPandas`` so payload bytes
never round-trip through Python row objects.

The *decode* step ships three paths, tried in order:

* REAL stdlib codecs: PNG (zlib inflate + chunk walk), baseline JPEG
  (functions/jpegcodec.py — full Huffman + IDCT pixel decode) and WAV
  (``wave``) are decoded from actual bytes,
* real third-party codecs (PIL / soundfile / av) behind import guards
  for formats stdlib can't read (progressive JPEG, FLAC, video),
* a deterministic fake codec for a self-describing TLV header format
  (``FAKE_MAGIC``) used where no codec applies (video in this env) —
  the Spark-side plumbing (schema, batching, partitioning, UDF
  signatures) is identical in every path.

Matching deterministic *encoders* (``encode_png_gray``,
``encode_wav_pcm16``) exist so fixtures and the registry query
exercise the real decode path end-to-end on genuine media bytes.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("media_id long, media_type string, payload binary, "
                "source string")

DECODED_SCHEMA = ("media_id long, media_type string, ok boolean, "
                  "width int, height int, n_channels int, "
                  "n_samples long, sample_rate int, "
                  "payload_bytes long, content_hash string, "
                  "error string")

FAKE_MAGIC = b"FAKE"


def fake_media_payload(media_type: str, width: int = 0, height: int = 0,
                       n_channels: int = 0, n_samples: int = 0,
                       sample_rate: int = 0, body: bytes = b"") -> bytes:
    """Deterministic stand-in payload: FAKE | type | dims | body."""
    t = {"image": 1, "audio": 2, "video": 3}[media_type]
    return (FAKE_MAGIC
            + struct.pack("<BIIIQI", t, width, height, n_channels,
                          n_samples, sample_rate)
            + body)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type -> sample count per pixel (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png_gray(width: int, height: int,
                    pixel_fn=lambda x, y: (x * 31 + y * 17) % 251) -> bytes:
    """Deterministic minimal PNG encoder (8-bit grayscale, filter 0,
    non-interlaced) — real spec-conformant bytes from the stdlib only,
    so fixtures and registry queries can drive the real decoder."""
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(pixel_fn(x, y) & 0xFF for x in range(width))
        for y in range(height))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def encode_wav_pcm16(n_samples: int, sample_rate: int,
                     n_channels: int = 1,
                     sample_fn=lambda i: ((i * 2654435761) % 65536) - 32768
                     ) -> bytes:
    """Deterministic PCM16 WAV bytes via the stdlib ``wave`` writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"".join(
            struct.pack("<h", sample_fn(i))
            for i in range(n_samples * n_channels)))
    return buf.getvalue()


def _decode_png(payload: bytes, meta: dict) -> dict:
    """Real PNG decode: chunk walk + IHDR parse + full IDAT inflate,
    verified against the expected defiltered scanline size."""
    try:
        if payload[:8] != PNG_MAGIC:
            raise ValueError("bad PNG signature")
        pos, width = 8, None
        idat: list[bytes] = []
        while pos + 8 <= len(payload):
            (length,), ctype = struct.unpack_from(">I", payload, pos), \
                payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if len(data) != length:
                raise ValueError("truncated chunk")
            if ctype == b"IHDR":
                width, height, depth, color, _comp, _filt, interlace = \
                    struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length                 # len + type + data + crc
        if width is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        if interlace:
            raise ValueError("interlaced PNG unsupported")
        channels = _PNG_CHANNELS[color]
        raw = zlib.decompress(b"".join(idat))
        expect = height * (1 + (width * channels * depth + 7) // 8)
        if len(raw) != expect:
            raise ValueError(
                f"decoded {len(raw)} bytes, expected {expect}")
        meta.update(ok=True, width=width, height=height,
                    n_channels=channels)
    except Exception as ex:
        meta["error"] = f"decode-error: {ex}"
    return meta


def encode_mp4_probe(width: int, height: int, n_ticks: int,
                     timescale: int = 10) -> bytes:
    """Deterministic minimal ISO-BMFF stream (ftyp + moov/mvhd +
    trak/tkhd) — real spec-conformant container bytes for driving the
    MP4 probe; no media samples (probe-level, like GDAL's)."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(b"mvhd", b"\x00" * 12
               + struct.pack(">II", timescale, n_ticks) + b"\x00" * 80)
    tkhd = box(b"tkhd", b"\x00" * 76
               + struct.pack(">II", width << 16, height << 16))
    return (box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + box(b"moov", mvhd + box(b"trak", tkhd)))


def _decode_jpeg(payload: bytes, meta: dict) -> dict:
    """Real JPEG decode for baseline streams: the stdlib Huffman+IDCT
    codec (functions/jpegcodec.py) produces actual pixels, so the
    reported dims/channels are decode-true.  Non-baseline processes
    (progressive SOF2, arithmetic) fall back to the SOF dimension
    probe — the GDAL-style metadata path — and full pixel decode for
    those stays behind the PIL guard."""
    try:
        from geohub_data_pipeline_spark.functions.jpegcodec import (
            decode_baseline_jpeg,
        )
        arr = decode_baseline_jpeg(payload)
        meta.update(ok=True, width=int(arr.shape[1]),
                    height=int(arr.shape[0]),
                    n_channels=1 if arr.ndim == 2 else int(arr.shape[2]))
        return meta
    except Exception:
        pass                               # fall through to SOF probe
    try:
        if payload[:2] != b"\xff\xd8":
            raise ValueError("bad JPEG SOI")
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("marker desync")
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2                   # standalone markers
                continue
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            if marker in (0xC0, 0xC1, 0xC2):
                _prec, h, w, ncomp = struct.unpack_from(
                    ">BHHB", payload, pos + 4)
                meta.update(ok=True, width=w, height=h, n_channels=ncomp)
                return meta
            if marker == 0xD9:             # EOI before any SOF
                break
            pos += 2 + seglen
        raise ValueError("no SOF frame header")
    except Exception as ex:
        meta["error"] = f"decode-error: {ex}"
    return meta


def _decode_gif(payload: bytes, meta: dict) -> dict:
    """Real GIF decode: stdlib LZW + palette codec
    (functions/gifcodec.py) yields actual first-frame pixels, so the
    reported dims are decode-true; malformed streams fall back to the
    logical-screen header probe."""
    try:
        from geohub_data_pipeline_spark.functions.gifcodec import (
            decode_gif_rgb,
        )
        arr = decode_gif_rgb(payload)
        meta.update(ok=True, width=int(arr.shape[1]),
                    height=int(arr.shape[0]), n_channels=3)
        return meta
    except Exception:
        pass                               # fall through to header probe
    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
            raise ValueError("bad GIF header")
        w, h = struct.unpack_from("<HH", payload, 6)
        packed = payload[10]
        # palette-indexed: report palette channel count (3 = RGB table)
        meta.update(ok=True, width=w, height=h,
                    n_channels=3 if packed & 0x80 else 1)
    except Exception as ex:
        meta["error"] = f"decode-error: {ex}"
    return meta


def _decode_mp4(payload: bytes, meta: dict) -> dict:
    """ISO-BMFF (MP4/MOV) probe: box walk to moov/mvhd for duration
    (exposed as n_samples ticks + sample_rate timescale) and trak/tkhd
    for display width/height (16.16 fixed point)."""
    try:
        def walk(lo: int, hi: int):
            pos = lo
            while pos + 8 <= hi:
                (size,), btype = struct.unpack_from(">I", payload, pos), \
                    payload[pos + 4:pos + 8]
                if size == 1:              # 64-bit largesize
                    (size,) = struct.unpack_from(">Q", payload, pos + 8)
                    body = pos + 16
                elif size == 0:            # to end of enclosing box
                    size = hi - pos
                    body = pos + 8
                else:
                    body = pos + 8
                if size < 8 or pos + size > hi:
                    raise ValueError("bad box size")
                yield btype, body, pos + size
                pos += size

        found = False
        for btype, body, end in walk(0, len(payload)):
            if btype != b"moov":
                continue
            for b2, body2, end2 in walk(body, end):
                if b2 == b"mvhd":
                    ver = payload[body2]
                    if ver == 1:
                        ts, dur = struct.unpack_from(
                            ">IQ", payload, body2 + 20)
                    else:
                        ts, dur = struct.unpack_from(
                            ">II", payload, body2 + 12)
                    meta.update(ok=True, sample_rate=ts, n_samples=dur)
                    found = True
                elif b2 == b"trak":
                    for b3, body3, _e3 in walk(body2, end2):
                        if b3 == b"tkhd":
                            # width/height (16.16 fixed) follow
                            # ver/flags + times + track_id + reserved
                            # + duration + reserved[8] + layer/alt/
                            # volume/reserved + matrix[36]
                            ver = payload[body3]
                            off = body3 + (88 if ver == 1 else 76)
                            w16, h16 = struct.unpack_from(
                                ">II", payload, off)
                            if w16 and h16:
                                meta.update(width=w16 >> 16,
                                            height=h16 >> 16)
        if not found:
            raise ValueError("no moov/mvhd box")
    except Exception as ex:
        meta["error"] = f"decode-error: {ex}"
    return meta


def _decode_wav(payload: bytes, meta: dict) -> dict:
    """Real WAV decode via the stdlib ``wave`` reader."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            meta.update(ok=True, n_channels=w.getnchannels(),
                        n_samples=w.getnframes(),
                        sample_rate=w.getframerate())
    except Exception as ex:
        meta["error"] = f"decode-error: {ex}"
    return meta


def _decode_one(media_type: str, payload: bytes) -> dict:
    meta = {"ok": False, "width": None, "height": None, "n_channels": None,
            "n_samples": None, "sample_rate": None, "error": None}
    # real stdlib codecs FIRST: genuine bytes take the genuine path
    if payload[:4] == PNG_MAGIC[:4]:
        return _decode_png(payload, meta)
    if payload[:3] == b"\xff\xd8\xff":
        return _decode_jpeg(payload, meta)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload, meta)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload, meta)
    if payload[4:8] == b"ftyp":
        return _decode_mp4(payload, meta)
    if payload[:4] == FAKE_MAGIC:
        t, w, h, c, n, sr = struct.unpack_from("<BIIIQI", payload, 4)
        meta.update(ok=True, width=w or None, height=h or None,
                    n_channels=c or None, n_samples=n or None,
                    sample_rate=sr or None)
        return meta
    if media_type == "image":
        try:
            from PIL import Image  # noqa: PLC0415
            import io  # noqa: PLC0415
            with Image.open(io.BytesIO(payload)) as im:
                meta.update(ok=True, width=im.width, height=im.height,
                            n_channels=len(im.getbands()))
            return meta
        except ImportError:
            meta["error"] = "decoder-unavailable: PIL not installed"
            return meta
        except Exception as ex:  # corrupt payload
            meta["error"] = f"decode-error: {ex}"
            return meta
    meta["error"] = f"decoder-unavailable: no {media_type} codec installed"
    return meta


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/probe every payload into typed metadata (quarantine-style:
    failures become rows with ok=false + error, never task failures).

    Scale: mapInPandas over Arrow batches; payloads stay in columnar
    buffers; no shuffle.
    """
    from geohub_data_pipeline_spark.session import ship_package
    ship_package(media.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(payload)
                m = _decode_one(mtype, payload)
                rows.append({
                    "media_id": int(mid),
                    "media_type": mtype,
                    "ok": m["ok"],
                    "width": m["width"],
                    "height": m["height"],
                    "n_channels": m["n_channels"],
                    "n_samples": m["n_samples"],
                    "sample_rate": m["sample_rate"],
                    "payload_bytes": len(payload),
                    "content_hash": hashlib.md5(payload).hexdigest(),
                    "error": m["error"],
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per kept frame
    index (the decode of actual frames needs an av codec — the plan
    plus batch shapes are the Spark-side contract)."""
    from pyspark.sql import functions as F

    vids = decoded.filter((decoded.media_type == "video") & decoded.ok)
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest((F.col("n_samples") - 1).cast("long"),
                                  F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )


def decode_png_gray8(payload: bytes) -> "np.ndarray":
    """Full 8-bit grayscale PNG decode (chunk walk + IHDR + IDAT
    collect + spec-§9 defilter) — the ONE shared implementation
    behind the thumbnail kernel and the MBTiles raster tile decode.
    Raises ValueError on anything that is not a non-interlaced 8-bit
    gray PNG."""
    import zlib as _zlib

    pos, width = 8, None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ct = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if ct == b"IHDR":
            (width, height, depth, color, _c, _f,
             inter) = struct.unpack(">IIBBBBB", data)
        elif ct == b"IDAT":
            idat.append(data)
        elif ct == b"IEND":
            break
        pos += 12 + ln
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if depth != 8 or color != 0 or inter:
        raise ValueError("only non-interlaced 8-bit gray PNG")
    return _defilter_gray8(
        _zlib.decompress(b"".join(idat)), width, height)


def _defilter_gray8(raw: bytes, width: int, height: int) -> "np.ndarray":
    """PNG scanline defilter (spec §9, filters 0-4) for 8-bit
    grayscale — returns the (height, width) pixel array."""
    import numpy as np

    stride = width + 1
    out = np.zeros((height, width), np.uint8)
    prev = np.zeros(width, np.int32)
    for y in range(height):
        line = raw[y * stride:(y + 1) * stride]
        ft = line[0]
        cur = np.frombuffer(line[1:], np.uint8).astype(np.int32)
        if ft == 0:
            rec = cur
        elif ft == 2:                      # Up
            rec = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):              # Sub / Average / Paeth
            rec = np.zeros(width, np.int32)
            a = 0
            for x in range(width):
                b = int(prev[x])
                if ft == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif ft == 3:
                    rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[x - 1]) if x else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                    rec[x] = (cur[x] + pr) & 0xFF
                a = int(rec[x])
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def thumbnail_media(media: DataFrame, max_side: int = 8) -> DataFrame:
    """Multimodal RESIZE: decode each 8-bit grayscale PNG payload to
    pixels (full spec §9 defilter, all five filter types), nearest-
    resample so the longest side is ``max_side`` (integer dim and
    source mapping rules — ``side * ms // max(w, h)`` and
    ``src = (dst * n) // m`` — deterministic, no float rounding
    ambiguity), and re-encode a real PNG thumbnail.

    Output per image row: original + thumb dims, the thumbnail PNG
    bytes, and the thumbnail's exact pixel mean (sum of uint8 over
    count — a rational the gate oracle states in closed form from
    the generator formula).  Non-image or undecodable payloads pass
    through with ``ok=false`` and the error string — quarantine,
    never a dropped row.

    Map-side Arrow batches only; payload bytes never shuffle.
    """
    import numpy as np

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(media.sparkSession)
    ms = int(max_side)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]):
                # null id still quarantines (never a dead task)
                mid = None if pd.isna(mid) else int(mid)
                err = None
                try:
                    if mtype != "image":
                        raise ValueError(f"not an image: {mtype}")
                    payload = bytes(payload)
                    if payload[:8] != PNG_MAGIC:
                        raise ValueError("not a PNG")
                    px = decode_png_gray8(payload)
                    height, width = px.shape
                    # integer dim rule (exactly mirrorable in SQL):
                    # side * ms // max_side, floored, at least 1
                    mx = max(width, height)
                    tw = max(1, (width * ms) // mx)
                    th = max(1, (height * ms) // mx)
                    ys = (np.arange(th) * height) // th
                    xs = (np.arange(tw) * width) // tw
                    thumb = px[np.ix_(ys, xs)]
                    buf = encode_png_gray(
                        tw, th,
                        pixel_fn=lambda x, y: int(thumb[y, x]))
                    rows.append((mid, True, None, int(width),
                                 int(height), int(tw), int(th),
                                 buf,
                                 float(int(thumb.sum())
                                       / (tw * th))))
                    continue
                except Exception as ex:
                    err = str(ex)
                rows.append((mid, False, err, None, None, None,
                             None, None, None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "ok", "error", "width", "height",
                "thumb_w", "thumb_h", "thumb_png", "pixel_mean"])

    return media.mapInPandas(
        kernel,
        "media_id long, ok boolean, error string, width int, "
        "height int, thumb_w int, thumb_h int, thumb_png binary, "
        "pixel_mean double")


def audio_frame_features(media: "DataFrame", frame: int,
                         id_col: str = "doc_id") -> "DataFrame":
    """Per-frame audio features over real PCM16 WAV payloads — the
    feature-extraction stage of an audio training-data pipeline
    (VAD/quality gating runs on exactly these): fixed-length frames,
    per-frame RMS and zero-crossing count.  Stdlib ``wave`` decode +
    one vectorized numpy pass per payload, map-side (Arrow batches,
    no shuffle); a trailing partial frame is dropped (the standard
    frame-aligned convention).  Undecodable payloads are skipped —
    the quarantine convention, never a stage failure.

    Output: ``doc_id, frame_idx, rms (double), crossings (int)``.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from geohub_data_pipeline_spark.session import ship_package
    ship_package(media.sparkSession)
    fl = int(frame)
    if fl < 2:
        raise ValueError("frame must be >= 2")

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, rms, zc = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(bytes(payload)),
                                   "rb") as w:
                        if w.getsampwidth() != 2 \
                                or w.getnchannels() != 1:
                            continue
                        raw = w.readframes(w.getnframes())
                except Exception:
                    continue               # quarantine, don't crash
                s = np.frombuffer(raw, "<i2").astype(np.float64)
                n = (s.size // fl) * fl
                if n == 0:
                    continue
                fr = s[:n].reshape(-1, fl)
                r = np.sqrt(np.mean(fr * fr, axis=1))
                flips = np.sum(fr[:, :-1] * fr[:, 1:] < 0, axis=1)
                k = fr.shape[0]
                ids += [int(did)] * k
                fidx += list(range(k))
                rms += r.tolist()
                zc += [int(v) for v in flips]
            yield pd.DataFrame({"doc_id": ids, "frame_idx": fidx,
                                "rms": rms, "crossings": zc})

    return media.select(id_col, "payload").mapInPandas(
        kernel, "doc_id long, frame_idx int, rms double, "
                "crossings int")


def video_sample_frames(media: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload",
                        every_n: int = 2) -> DataFrame:
    """Sample every ``every_n``-th frame of AVI/MJPEG videos and
    report per-frame pixel statistics — the frame-sampling primitive
    a multimodal training pipeline runs before captioning/embedding
    (nobody embeds all 30 fps).

    The container walk (functions/avicodec.py parse_avi) locates the
    '00dc' chunks WITHOUT decoding them; only the sampled frames go
    through the baseline JPEG decoder (functions/jpegcodec.py), so
    the per-row cost is proportional to frames KEPT, not frames
    stored.  Malformed containers are skipped (quarantine
    semantics), matching the audio kernel above.

    Quarantine is all-or-nothing per row: a payload whose container
    parses but whose sampled frames fail JPEG decode contributes
    NO rows (not a prefix of them).

    Scale: stateless Arrow-batched kernel over the binary column —
    a scan, no shuffle; output is one row per SAMPLED frame
    ``(id, frame_idx, n_frames, width, height, px_mean, px_min,
    px_max)``.
    """
    from geohub_data_pipeline_spark.functions import avicodec as A
    from geohub_data_pipeline_spark.functions import jpegcodec as J
    from geohub_data_pipeline_spark.session import ship_package

    ship_package(media.sparkSession)
    step = int(every_n)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    meta = A.parse_avi(bytes(payload))
                    doc_rows = []
                    for fi in range(0, meta["n_frames"], step):
                        px = J.decode_baseline_jpeg(meta["frames"][fi])
                        doc_rows.append((
                            int(did), fi, meta["n_frames"],
                            int(px.shape[1]), int(px.shape[0]),
                            round(float(px.mean()), 4) + 0.0,
                            int(px.min()), int(px.max())))
                except (ValueError, struct.error, IndexError,
                        KeyError, zlib.error):
                    # quarantine: bad container OR bad frame — the
                    # codecs' full failure surface on adversarial
                    # bytes (truncated struct fields, out-of-range
                    # chunk indices, corrupt DEFLATE), not just the
                    # ValueErrors they raise deliberately
                    continue
                rows.extend(doc_rows)
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "n_frames", "width", "height",
                "px_mean", "px_min", "px_max"])

    return media.select(id_col, payload_col).mapInPandas(
        kernel, "doc_id long, frame_idx int, n_frames int, "
                "width int, height int, px_mean double, "
                "px_min int, px_max int")
