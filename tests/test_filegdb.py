"""OpenFileGDB (.gdb) source tests: spec-built tables through the
parser, geometry codec symmetry, catalog walk, Spark + archive routes."""

from __future__ import annotations

import io
import os
import zipfile

import pytest

from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.sources import filegdb as FG


def test_varint_codecs():
    for v in [0, 1, 63, 64, 127, 128, 300, 2 ** 21, 2 ** 45 + 17]:
        buf = FG.vu_bytes(v)
        got, pos = FG.vu_read(buf, 0)
        assert (got, pos) == (v, len(buf))
    for v in [0, 1, -1, 63, -63, 64, -64, 8191, -8192, 2 ** 40,
              -(2 ** 40) - 5]:
        buf = FG.vs_bytes(v)
        got, pos = FG.vs_read(buf, 0)
        assert (got, pos) == (v, len(buf))


def test_shape_codec_roundtrip():
    gi = dict(FG._DEFAULT_GI)
    cases = [
        G.wkb_point(12.25, 41.5),
        G.wkb_linestring([(0.0, 0.0), (1.5, 2.5), (3.0, 1.0)]),
        G.wkb_polygon([[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0),
                        (0.0, 4.0), (0.0, 0.0)],
                       [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0),
                        (1.0, 1.0)]]),
    ]
    for wkb in cases:
        shape = FG.wkb_to_shape(wkb, gi)
        back = FG.shape_to_wkb(shape, gi)
        a, b = G.parse_wkb(wkb), G.parse_wkb(back)
        assert a["type"] == b["type"]
        assert a["coords"] == pytest.approx(b["coords"], abs=1e-8)
    # empty + unsupported
    assert FG.shape_to_wkb(FG.vu_bytes(0), gi) is None
    with pytest.raises(ValueError):
        FG.shape_to_wkb(FG.vu_bytes(3 | FG._CURVE_FLAG), gi)


def _sample_layers():
    return {
        "roads": [
            (1, G.wkb_linestring([(0.0, 0.0), (2.0, 2.0)])),
            (2, None),                                   # null geometry
        ],
        "parcels": [
            (1, G.wkb_polygon([[(10.0, 10.0), (11.0, 10.0),
                                (11.0, 11.0), (10.0, 10.0)]])),
        ],
    }


def test_write_read_filegdb(tmp_path):
    gdb = tmp_path / "sample.gdb"
    FG.write_filegdb(str(gdb), _sample_layers())
    files = {n: open(gdb / n, "rb").read() for n in os.listdir(gdb)}
    rows = list(FG.read_filegdb(files, "sample.gdb"))
    by_layer = {}
    for ds, layer, fid, wkb, srid, crs_wkt, _props in rows:
        assert ds == "sample.gdb" and srid == 4326 and crs_wkt is None
        by_layer.setdefault(layer, []).append((fid, wkb))
    assert set(by_layer) == {"roads", "parcels"}
    assert [f for f, _ in by_layer["roads"]] == [1, 2]
    assert by_layer["roads"][1][1] is None
    g = G.parse_wkb(by_layer["roads"][0][1])
    assert g["type"] == G.LINESTRING
    assert g["coords"] == pytest.approx([0.0, 0.0, 2.0, 2.0], abs=1e-8)
    p = G.parse_wkb(by_layer["parcels"][0][1])
    assert p["type"] == G.POLYGON

    # corrupt catalog quarantines the whole dataset
    with pytest.raises(ValueError):
        list(FG.read_filegdb({"a00000001.gdbtable": b"junk"}, "x"))
    # missing catalog
    with pytest.raises(ValueError):
        list(FG.read_filegdb({}, "x"))


def test_filegdb_deleted_rows(tmp_path):
    """A zeroed .gdbtablx entry (deleted row) is skipped, and ids
    stay stable for the surviving rows."""
    gdb = tmp_path / "d.gdb"
    FG.write_filegdb(str(gdb), {"pts": [
        (1, G.wkb_point(1.0, 1.0)), (2, G.wkb_point(2.0, 2.0)),
        (3, G.wkb_point(3.0, 3.0))]})
    tbx_path = gdb / "a00000009.gdbtablx"
    tbx = bytearray(tbx_path.read_bytes())
    # zero the 5-byte entry of row 2 (entries start at byte 16)
    tbx[16 + 5:16 + 10] = b"\x00" * 5
    tbx_path.write_bytes(bytes(tbx))
    files = {n: open(gdb / n, "rb").read() for n in os.listdir(gdb)}
    rows = list(FG.read_filegdb(files, "d.gdb"))
    assert [(r[2], G.parse_wkb(r[3])["coords"][0]) for r in rows] == \
        [(1, 1.0), (3, 3.0)]


def test_features_from_gdb_spark(spark, tmp_path):
    FG.write_filegdb(str(tmp_path / "a.gdb"), _sample_layers())
    FG.write_filegdb(str(tmp_path / "b.gdb"),
                     {"pois": [(1, G.wkb_point(5.0, 5.0))]})
    df = FG.features_from_gdb(spark, str(tmp_path))
    rows = df.collect()
    assert {(r.dataset, r.layer) for r in rows} == {
        ("a.gdb", "roads"), ("a.gdb", "parcels"), ("b.gdb", "pois")}
    assert all(r.srid == 4326 for r in rows)


def test_filegdb_zip_members(spark, tmp_path):
    """.gdb arrives zipped: archive members route through
    filegdb_feature_rows (ref ingest/utils.py:23-32)."""
    from geohub_data_pipeline_spark.sources.archive import read_archives

    gdb = tmp_path / "upload.gdb"
    FG.write_filegdb(str(gdb), _sample_layers())
    zpath = tmp_path / "upload.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for n in os.listdir(gdb):
            zf.write(gdb / n, f"upload.gdb/{n}")
        zf.writestr("readme.txt", "not gdb")
    members = read_archives(spark, str(zpath))
    rows = FG.filegdb_feature_rows(members).collect()
    assert {r.layer for r in rows} == {"roads", "parcels"}
    assert all(r.dataset == "upload.gdb" for r in rows)


def test_filegdb_through_normalize(spark, tmp_path):
    """FileGDB features flow through the SAME normalize path as every
    other vector source."""
    FG.write_filegdb(str(tmp_path / "n.gdb"), _sample_layers())
    feats = FG.features_from_gdb(spark, str(tmp_path / "n.gdb"))
    norm = G.normalize_features(feats)
    got = norm.collect()
    # null-geometry road 2 dropped by -skipfailures; 2 features remain
    assert len(got) == 2


def _zip_bytes(gdb_dir: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n in os.listdir(gdb_dir):
            zf.write(os.path.join(gdb_dir, n),
                     f"{os.path.basename(gdb_dir)}/{n}")
    return buf.getvalue()
