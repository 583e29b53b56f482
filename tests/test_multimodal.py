"""Multimodal column plumbing tests (north star)."""

from __future__ import annotations

import hashlib

from geohub_data_pipeline_spark.operators import multimodal as M


def _media(spark):
    rows = [
        (1, "image", M.fake_media_payload("image", width=640, height=480,
                                          n_channels=3, body=b"im1"), "s1"),
        (2, "audio", M.fake_media_payload("audio", n_channels=2,
                                          n_samples=44100 * 3,
                                          sample_rate=44100), "s1"),
        (3, "video", M.fake_media_payload("video", width=1920, height=1080,
                                          n_samples=900), "s2"),
        (4, "image", b"\x89PNG-not-really", "s2"),     # corrupt PNG
        # REAL media bytes, decoded by the stdlib codecs
        (5, "image", M.encode_png_gray(17, 9), "s3"),
        (6, "audio", M.encode_wav_pcm16(480, 16000, n_channels=2), "s3"),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_decode_media(spark):
    out = {r.media_id: r for r in M.decode_media(_media(spark)).collect()}
    assert out[1].ok and (out[1].width, out[1].height) == (640, 480)
    assert out[2].ok and out[2].sample_rate == 44100
    assert out[3].ok and out[3].n_samples == 900
    # failure is a quarantine row, not a task failure
    assert out[4].ok is False and "decode-error" in out[4].error
    # payload bytes + content hash always present (typed metadata)
    payload = M.fake_media_payload("image", width=640, height=480,
                                   n_channels=3, body=b"im1")
    assert out[1].payload_bytes == len(payload)
    assert out[1].content_hash == hashlib.md5(payload).hexdigest()
    # REAL PNG: width/height/channels come from actual IHDR + inflate
    assert out[5].ok and (out[5].width, out[5].height,
                          out[5].n_channels) == (17, 9, 1)
    # REAL WAV: frames/rate/channels come from the actual RIFF header
    assert out[6].ok and (out[6].n_samples, out[6].sample_rate,
                          out[6].n_channels) == (480, 16000, 2)


def test_stdlib_codecs_roundtrip():
    """Encoder/decoder pair on genuine bytes, no Spark involved."""
    png = M.encode_png_gray(5, 3)
    meta = M._decode_one("image", png)
    assert meta["ok"] and (meta["width"], meta["height"]) == (5, 3)
    # corrupt the IDAT length field -> decode-error, never an exception
    bad = png[:40] + b"\xff" + png[41:]
    assert "decode-error" in M._decode_one("image", bad)["error"]

    wav = M.encode_wav_pcm16(100, 8000)
    meta = M._decode_one("audio", wav)
    assert meta["ok"] and meta["n_samples"] == 100 \
        and meta["sample_rate"] == 8000
    assert "decode-error" in M._decode_one(
        "audio", wav[:20])["error"]


def test_jpeg_and_gif_probes():
    """JPEG SOF marker-walk and GIF header probes on crafted real
    marker streams (pixel payload irrelevant to the probe)."""
    import struct
    # SOI + APP0(JFIF) + SOF0(8-bit, 31x17, 3 comp) + EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02" + b"\x00" * 7
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 31, 17, 3) + b"\x00\x00"
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    m = M._decode_one("image", jpeg)
    assert m["ok"] and (m["width"], m["height"], m["n_channels"]) == (17, 31, 3)
    # progressive SOF2 also matches
    jpeg2 = jpeg.replace(b"\xff\xc0", b"\xff\xc2")
    m = M._decode_one("image", jpeg2)
    assert m["ok"] and m["width"] == 17
    # truncated before SOF: decode-error quarantine
    assert "decode-error" in M._decode_one("image", b"\xff\xd8\xff\xe0")["error"]

    gif = b"GIF89a" + struct.pack("<HH", 12, 7) + bytes([0x80, 0, 0])
    m = M._decode_one("image", gif)
    assert m["ok"] and (m["width"], m["height"], m["n_channels"]) == (12, 7, 3)
    assert "decode-error" in M._decode_one("image", b"GIF89a\x01")["error"]


def test_mp4_probe():
    """ISO-BMFF box walk on a crafted moov/mvhd/trak/tkhd stream."""
    import struct

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    # spec layouts: mvhd v0 has timescale/duration at body+12; tkhd
    # v0 has width/height (16.16) at body+76
    mvhd = box(b"mvhd", b"\x00" * 12
               + struct.pack(">II", 90000, 90000 * 7) + b"\x00" * 80)
    tkhd = box(b"tkhd", b"\x00" * 76
               + struct.pack(">II", 640 << 16, 360 << 16))
    trak = box(b"trak", tkhd)
    blob = (box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + box(b"moov", mvhd + trak))
    m = M._decode_one("video", blob)
    assert m["ok"]
    assert (m["sample_rate"], m["n_samples"]) == (90000, 630000)
    assert (m["width"], m["height"]) == (640, 360)
    # garbage after ftyp: quarantine, not a crash
    assert "decode-error" in M._decode_one(
        "video", box(b"ftyp", b"isom") + b"\x00\x01garbage")["error"]


def test_frame_sample_plan(spark):
    decoded = M.decode_media(_media(spark))
    plan = M.frame_sample_plan(decoded, every_n=300).collect()
    # 900 frames sampled every 300 -> 0, 300, 600 (+ frame 899 boundary)
    idx = sorted(r.frame_idx for r in plan if r.media_id == 3)
    assert idx == [0, 300, 600]
    # only video rows produce frames
    assert {r.media_id for r in plan} == {3}


def test_gif_full_lzw_decode_paths():
    """Real GIF pixel decode (functions/gifcodec.py): roundtrip with
    global palette, local palette override, interlace, multi-frame
    count, and the decode-true metadata in _decode_one."""
    import numpy as np

    from geohub_data_pipeline_spark.functions.gifcodec import (
        decode_gif,
        decode_gif_rgb,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    idx = rng.integers(0, 6, size=(21, 13)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(6, 3)).astype(np.uint8)
    for interlace in (False, True):
        blob = encode_gif(idx, pal, interlace=interlace)
        got, gpal, nf = decode_gif(blob)
        assert np.array_equal(got, idx) and nf == 1
        assert np.array_equal(gpal[:6], pal)
        rgb = decode_gif_rgb(blob)
        assert np.array_equal(rgb, pal[idx])
        meta = M._decode_one("image", blob)
        assert meta["ok"] and (meta["width"], meta["height"]) == (13, 21)
        assert meta["n_channels"] == 3

    # truncated LZW stream: decoder stops clean, probe path reports
    # the header dims
    blob = encode_gif(idx, pal)
    meta = M._decode_one("image", blob[:20])
    assert meta["ok"] and (meta["width"], meta["height"]) == (13, 21)


def test_thumbnail_roundtrip_and_filters(spark):
    """Thumbnail: decode (all-filter defilter) -> nearest resize ->
    re-encoded PNG decodes back to the exact sampled pixels; non-
    image rows quarantine with ok=false."""
    import zlib as _z
    import struct as _s

    import numpy as np

    from geohub_data_pipeline_spark.operators import multimodal as MM

    big = MM.encode_png_gray(20, 10)        # formula pixels
    # a PNG using Sub/Up/Average/Paeth filters on a gradient
    w, h = 6, 5
    px = np.arange(w * h, dtype=np.uint8).reshape(h, w) * 3
    raw = bytearray()
    prev = np.zeros(w, np.int32)
    for y in range(h):
        ft = [0, 1, 2, 3, 4][y]
        cur = px[y].astype(np.int32)
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur.copy()
            enc[1:] = (cur[1:] - cur[:-1]) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            enc = cur.copy()
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                enc[x] = (cur[x] - (a + int(prev[x])) // 2) & 0xFF
        else:
            enc = cur.copy()
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (
                    b if pb <= pc else c)
                enc[x] = (cur[x] - pr) & 0xFF
        raw += b"%c" % ft + bytes(int(v) for v in enc)
        prev = cur

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data)))

    filt_png = (MM.PNG_MAGIC
                + chunk(b"IHDR", _s.pack(">IIBBBBB", w, h, 8, 0,
                                         0, 0, 0))
                + chunk(b"IDAT", _z.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    media = spark.createDataFrame(
        [(0, "image", big, "t"), (1, "image", filt_png, "t"),
         (2, "audio", MM.encode_wav_pcm16(10, 8000), "t")],
        MM.MEDIA_SCHEMA)
    got = {r.media_id: r
           for r in MM.thumbnail_media(media, max_side=5).collect()}
    assert got[0].ok and (got[0].thumb_w, got[0].thumb_h) == (5, 2)
    assert not got[2].ok and "not an image" in got[2].error

    # decode the thumbnail of the FILTERED png and compare with a
    # direct nearest-resample of the known pixels
    r = got[1]
    assert r.ok and (r.thumb_w, r.thumb_h) == (5, 4)
    tp = bytes(r.thumb_png)
    # defilter via the operator's own path (filter 0 output)
    pos = 8
    idat = b""
    while pos + 8 <= len(tp):
        (ln,) = _s.unpack_from(">I", tp, pos)
        ct = tp[pos + 4:pos + 8]
        if ct == b"IDAT":
            idat += tp[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    out = MM._defilter_gray8(_z.decompress(idat), 5, 4)
    ys = (np.arange(4) * h) // 4
    xs = (np.arange(5) * w) // 5
    assert (out == px[np.ix_(ys, xs)]).all()
    assert r.pixel_mean == px[np.ix_(ys, xs)].sum() / 20


def test_audio_frame_features_quarantine_and_framing(spark):
    """Stereo and truncated payloads quarantine (skipped, never a
    stage failure); a trailing partial frame drops; frame < 2
    rejects up front."""
    import struct

    import pytest as _pytest

    from geohub_data_pipeline_spark.operators import multimodal as MM

    mono = MM.encode_wav_pcm16(10, 8000,
                               sample_fn=lambda i: 100)
    stereo = MM.encode_wav_pcm16(8, 8000, n_channels=2,
                                 sample_fn=lambda i: 100)
    rows = [(1, mono), (2, stereo), (3, b"RIFFgarbage"),
            (4, mono[:20])]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = MM.audio_frame_features(media, frame=4).collect()
    # only the mono payload survives: 10 samples -> 2 full frames
    assert {r.doc_id for r in got} == {1}
    assert sorted(r.frame_idx for r in got) == [0, 1]
    assert all(abs(r.rms - 100.0) < 1e-12 and r.crossings == 0
               for r in got)
    with _pytest.raises(ValueError):
        MM.audio_frame_features(media, frame=1)


def test_avi_codec_roundtrip_and_validation():
    """RIFF walk: frames round-trip bit-exactly (odd-size padding
    honored), malformed containers raise."""
    import numpy as np
    import pytest

    from geohub_data_pipeline_spark.functions import avicodec as A
    from geohub_data_pipeline_spark.functions import jpegcodec as J

    frames = []
    for f in range(5):
        img = np.full((16, 24), (f * 40 + 10) % 256, dtype=np.uint8)
        img[:, :8] = (f * 40 + 60) % 256
        frames.append(J.encode_baseline_jpeg(img & 0xFE))
    avi = A.encode_mjpeg_avi(frames, 24, 16, fps=25)
    m = A.parse_avi(avi)
    assert (m["width"], m["height"], m["fps"], m["n_frames"]) \
        == (24, 16, 25, 5)
    assert m["frames"] == frames            # exact bytes back
    assert any(len(f) % 2 for f in frames)  # padding path exercised

    with pytest.raises(ValueError):
        A.parse_avi(avi[:40])               # truncated
    with pytest.raises(ValueError):
        A.parse_avi(b"JUNK" + avi[4:])      # bad magic
    # frame-count mismatch: clip one frame chunk out of movi
    bad = bytearray(avi)
    i = bad.find(b"00dc")
    import struct as _s
    sz = _s.unpack_from("<I", bad, i + 4)[0]
    del bad[i:i + 8 + sz + (sz % 2)]
    _s.pack_into("<I", bad, 4, len(bad) - 8)
    with pytest.raises(ValueError):
        A.parse_avi(bytes(bad))


def test_video_sample_frames_sampling_and_quarantine(spark):
    """Every-Nth sampling keeps exactly the right frames; a corrupt
    payload is skipped, not fatal."""
    import numpy as np

    from geohub_data_pipeline_spark.functions import avicodec as A
    from geohub_data_pipeline_spark.functions import jpegcodec as J
    from geohub_data_pipeline_spark.operators.multimodal import (
        video_sample_frames,
    )

    def make(n, base):
        fr = [J.encode_baseline_jpeg(
            np.full((8, 8), (base + i * 20) % 250 & 0xFE,
                    dtype=np.uint8)) for i in range(n)]
        return A.encode_mjpeg_avi(fr, 8, 8)

    rows = [(1, bytearray(make(7, 10))), (2, bytearray(make(4, 100))),
            (3, bytearray(b"not an avi at all, sorry"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = video_sample_frames(df, every_n=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert by_doc == {1: [0, 3, 6], 2: [0, 3]}   # doc 3 quarantined
    means = {(r.doc_id, r.frame_idx): r.px_mean for r in got}
    assert means[(1, 3)] == float((10 + 60) % 250 & 0xFE)
    assert all(r.n_frames in (7, 4) for r in got)


def test_video_quarantine_covers_bad_frames(spark):
    """A container that parses but holds undecodable frame bytes is
    quarantined whole (no rows, no crash), and undersized header
    chunks raise ValueError (not struct.error)."""
    import pytest as _pytest
    import struct as _s

    from geohub_data_pipeline_spark.functions import avicodec as A
    from geohub_data_pipeline_spark.operators.multimodal import (
        video_sample_frames,
    )

    bad_frames = A.encode_mjpeg_avi([b"not a jpeg at all"], 8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(bad_frames))], "doc_id long, payload binary")
    assert video_sample_frames(df, every_n=1).count() == 0

    # undersized avih chunk: ValueError, not struct.error
    avih_small = (b"RIFF" + _s.pack("<I", 24) + b"AVI "
                  + b"LIST" + _s.pack("<I", 12) + b"hdrl"
                  + b"avih" + _s.pack("<I", 4) + b"\x00" * 4)
    with _pytest.raises(ValueError):
        A.parse_avi(avih_small)
