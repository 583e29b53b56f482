"""Erdas Imagine Raw (.raw/.bl) source tests + AAIGrid sibling
extensions (.aig/.sgr)."""

from __future__ import annotations

import numpy as np
import pytest

from geohub_data_pipeline_spark.operators import raster as R
from geohub_data_pipeline_spark.sources import erdasraw as ER


def test_parse_eir_header():
    h = ER.parse_eir_header(
        "IMAGINE_RAW_FILE d.bl\nWIDTH 4\nHEIGHT 3\nNUM_LAYERS 2\n"
        "FORMAT S16\nBYTE_ORDER MSB\nINTERLEAVING BIL\n# comment\n")
    assert (h["width"], h["height"], h["num_layers"]) == (4, 3, 2)
    assert h["format"] == "S16" and h["byte_order"] == "MSB"
    with pytest.raises(ValueError):
        ER.parse_eir_header("FORMAT U8\n")           # no dims
    with pytest.raises(ValueError):
        ER.parse_eir_header("WIDTH 2\nHEIGHT 2\nFORMAT X9\n")
    with pytest.raises(ValueError):
        ER.parse_eir_header("WIDTH 2\nHEIGHT 2\nINTERLEAVING ZZZ\n")


@pytest.mark.parametrize("fmt,order", [("U8", "LSB"), ("S16", "MSB"),
                                       ("F32", "LSB"), ("F64", "MSB")])
@pytest.mark.parametrize("il", ["BSQ", "BIL", "BIP"])
def test_decode_all_layouts(tmp_path, fmt, order, il):
    cube = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.float64)
    ER.write_erdas_raw(str(tmp_path), "d", cube, fmt=fmt,
                       byte_order=order, interleaving=il)
    text = (tmp_path / "d.raw").read_text()
    data = (tmp_path / "d.bl").read_bytes()
    out = ER.decode_erdas_raw(ER.parse_eir_header(text), data)
    np.testing.assert_array_equal(out, cube)


def test_decode_short_blob_quarantines():
    h = ER.parse_eir_header("WIDTH 4\nHEIGHT 4\nFORMAT F64\n")
    with pytest.raises(ValueError):
        ER.decode_erdas_raw(h, b"\x00" * 16)


def test_blocks_from_erdas_spark(spark, tmp_path):
    cube = (np.arange(2 * 300 * 270).reshape(2, 300, 270) % 97) \
        .astype(np.float64)
    ER.write_erdas_raw(str(tmp_path), "scene", cube, fmt="F32",
                       interleaving="BIL", nodata=-5.0)
    # corrupt pair: header without companion
    (tmp_path / "orphan.raw").write_text(
        "IMAGINE_RAW_FILE missing.bl\nWIDTH 2\nHEIGHT 2\n")
    blocks = ER.blocks_from_erdas(spark, str(tmp_path))
    rows = blocks.collect()
    assert {r.dataset for r in rows} == {"scene.raw"}
    assert {r.band for r in rows} == {1, 2}
    b1 = [r for r in rows if r.band == 1
          and (r.block_x, r.block_y) == (0, 0)][0]
    assert b1.pixels[0] == cube[0, 0, 0]
    assert b1.nodata == -5.0
    # 300x270 -> 2x2 block grid per band
    assert len(rows) == 8

    audit = {(r.band, r.level): r.n_blocks for r in R.block_audit(
        R.overview_cascade(blocks, levels=1)).collect()}
    assert audit[(1, 0)] == 4 and audit[(1, 1)] == 1


def test_aig_sgr_extensions(spark, tmp_path):
    """.aig/.sgr are AAIGrid siblings (ref config groups them under
    'Arc/Info ASCII Grid File')."""
    from geohub_data_pipeline_spark.sources import aaigrid as AG

    text = ("ncols 5\nnrows 4\nxllcorner 0.0\nyllcorner 0.0\n"
            "cellsize 1.0\n" + " ".join(
                str(v) for v in range(20)))
    (tmp_path / "a.aig").write_text(text)
    (tmp_path / "b.sgr").write_text(text)
    rows = AG.blocks_from_aaigrid(spark, str(tmp_path / "*.aig")) \
        .collect()
    assert {r.dataset for r in rows} == {"a.aig"}
    rows = AG.blocks_from_aaigrid(spark, str(tmp_path / "*.sgr")) \
        .collect()
    assert {r.dataset for r in rows} == {"b.sgr"}


def test_cli_raster_erdas(spark, tmp_path, capsys):
    """Erdas pair -> cascade -> COG via the CLI."""
    from geohub_data_pipeline_spark import cli

    cube = (np.arange(280 * 260).reshape(1, 280, 260) % 60) \
        .astype(np.float64)
    src = tmp_path / "in"
    ER.write_erdas_raw(str(src), "dem", cube, fmt="F32")
    rc = cli.main(["--raster", str(src / "dem.raw"),
                   "--dst", str(tmp_path / "out"),
                   "--overview-levels", "1"])
    assert rc == 0
    assert "wrote 1 COGs" in capsys.readouterr().out
