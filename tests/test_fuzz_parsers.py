"""Adversarial-input fuzzing for the round-4 binary parsers.

Quarantine contract (same as sources/netcdf3.py after the r3 ADVICE
fix): a corrupt or hostile payload must raise ValueError (or be
skipped cleanly) — never an uncaught KeyError/IndexError/OverflowError
that fails the Spark task, and never an allocation-bomb OOM.
"""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geohub_data_pipeline_spark.functions import gifcodec as GIF
from geohub_data_pipeline_spark.operators import crs_wkt as W
from geohub_data_pipeline_spark.sources import flatgeobuf as FGB
from geohub_data_pipeline_spark.sources import geotiff as GT

_OK = (ValueError, struct.error, IndexError, KeyError,
       NotImplementedError, OverflowError, MemoryError,
       EOFError, ZeroDivisionError)
# the kernels catch exactly these; anything else would kill the task
_KERNEL_CAUGHT = (ValueError, struct.error, IndexError)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_fgb(data):
    try:
        list(FGB.read_fgb_bytes(data, "x"))
    except _KERNEL_CAUGHT:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_fgb_with_magic(data):
    try:
        list(FGB.read_fgb_bytes(FGB.MAGIC + data, "x"))
    except _KERNEL_CAUGHT:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_geotiff(data):
    for payload in (data, b"II\x2a\x00" + data, b"MM\x00\x2a" + data):
        try:
            GT.read_geotiff(payload)
        except _KERNEL_CAUGHT + (struct.error,):
            pass
        except Exception as ex:            # zlib etc. also caught
            import zlib
            assert isinstance(ex, zlib.error), type(ex)


def test_geotiff_allocation_bomb():
    """4-billion-pixel header must raise, not OOM."""
    # craft: II, magic, one IFD with huge dims, stripped
    ifd = struct.pack("<H", 4)
    ifd += struct.pack("<HHII", 256, 4, 1, 2 ** 31)     # width
    ifd += struct.pack("<HHII", 257, 4, 1, 2 ** 31)     # height
    ifd += struct.pack("<HHII", 273, 4, 1, 8)           # strip offset
    ifd += struct.pack("<HHII", 279, 4, 1, 4)           # strip count
    ifd += struct.pack("<I", 0)
    blob = struct.pack("<2sHI", b"II", 42, 8) + ifd
    try:
        GT.read_geotiff(blob)
        raise AssertionError("should have raised")
    except ValueError as ex:
        assert "implausible" in str(ex)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_gif(data):
    for payload in (data, b"GIF89a" + data):
        try:
            GIF.decode_gif(payload)
        except _OK:
            pass


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_fuzz_wkt_text(text):
    """to/from_lonlat_wkt must return a callable or None — they gate
    every parse failure themselves."""
    assert W.to_lonlat_wkt(text) is None or callable(
        W.to_lonlat_wkt(text))


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_fuzz_lzw(data):
    """LZW decode of arbitrary bytes stops cleanly."""
    out = GT.tiff_lzw_decode(data, 4096)
    assert len(out) <= 4096 + 4096         # bounded by expected+entry


def test_fgb_header_declared_count_mismatch():
    """A header claiming more features than the file holds (with an
    index) still reads what exists and stops."""
    feats = [(i, None) for i in range(3)]
    from geohub_data_pipeline_spark.operators.geometry import wkb_point
    feats = [(i, wkb_point(float(i), 0.0)) for i in range(3)]
    blob = bytearray(FGB.write_fgb_bytes(feats, index_node_size=0))
    rows = list(FGB.read_fgb_bytes(bytes(blob), "x"))
    assert len(rows) == 3
    # truncate mid-frame: reader stops without raising
    rows = list(FGB.read_fgb_bytes(bytes(blob[:-7]), "x"))
    assert len(rows) == 2
