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


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_hfa(data):
    from geohub_data_pipeline_spark.sources import hfa as HFA

    for payload in (data, HFA._MAGIC + data):
        try:
            parsed = HFA.parse_hfa(payload)
            for layer in parsed["layers"]:
                HFA._layer_array(parsed, layer)
                HFA._layer_mapinfo(parsed, layer)
        except _KERNEL_CAUGHT + (struct.error, KeyError):
            pass


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=13, max_size=200))
def test_fuzz_hfa_rle(data):
    """Crafted RLE blocks must raise cleanly (count bombs guarded),
    never allocate unboundedly or loop."""
    from geohub_data_pipeline_spark.sources import hfa as HFA

    try:
        out = HFA._rle_decode(data, 64)
        assert len(out) == 64
    except _KERNEL_CAUGHT + (struct.error,):
        pass


def test_hfa_mutation_robustness(tmp_path):
    """Byte-flip a VALID file at every 7th offset: the reader either
    parses or raises the quarantine classes, never crashes or hangs."""
    import numpy as np

    from geohub_data_pipeline_spark.sources import hfa as HFA
    from geohub_data_pipeline_spark.sources.fixtures import (
        hfa_file_bytes,
    )

    base = bytearray(hfa_file_bytes(
        [("L1", (np.arange(12, dtype=np.float32) % 7)
          .reshape(3, 4), 4, 3, "f32")]))
    for i in range(0, len(base), 7):
        mut = bytearray(base)
        mut[i] ^= 0xFF
        try:
            parsed = HFA.parse_hfa(bytes(mut))
            for layer in parsed["layers"]:
                HFA._layer_array(parsed, layer)
                HFA._layer_mapinfo(parsed, layer)
        except (ValueError, struct.error, IndexError, KeyError):
            pass


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=0, max_size=300))
def test_fuzz_wkt2_projjson_text(text):
    """The WKT2/PROJJSON grammars gate like WKT1: truncated or
    mutated CRS text returns None, never an uncaught exception."""
    for wrapped in (
            '{"type":"ProjectedCRS",' + text,
            'PROJCRS["x",' + text,
            'BOUNDCRS[SOURCECRS[' + text,
            '{"type":"GeographicCRS","datum":' + text + '}'):
        got = W.to_lonlat_wkt(wrapped)
        assert got is None or callable(got)
