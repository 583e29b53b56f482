"""DataSource V2 PMTiles reader: ``spark.read.format("pmtiles")``.

Covers SURVEY §4's "pushdown of tile-range predicates into a PMTiles
reader" extension: schema, multi-archive partitioning, dataset-level
partition pruning, and z/x/y pushdown (including leaf-directory skip).
"""

from __future__ import annotations

import pytest

from geohub_data_pipeline_spark.operators import pmtiles as P
from geohub_data_pipeline_spark.sources import pmtiles_source as DS


@pytest.fixture(scope="module")
def archives(tmp_path_factory):
    d = tmp_path_factory.mktemp("pmtiles_ds")
    P.write_pmtiles(
        str(d / "d1.pmtiles"),
        [(z, x, y, f"d1:{z}/{x}/{y}".encode())
         for z in (0, 1, 2) for x in range(2 ** z) for y in range(2 ** z)],
        {"name": "d1"})
    P.write_pmtiles(
        str(d / "d2.pmtiles"),
        [(5, x, y, f"d2:5/{x}/{y}".encode())
         for x in range(4) for y in range(4)],
        {"name": "d2"})
    return str(d)


def _load(spark, path):
    DS.register(spark)
    return spark.read.format("pmtiles").load(path)


def test_schema_and_full_scan(spark, archives):
    df = _load(spark, archives)
    assert [f.name for f in df.schema.fields] == \
        ["dataset", "z", "x", "y", "payload"]
    rows = df.collect()
    assert len(rows) == (1 + 4 + 16) + 16
    assert {r.dataset for r in rows} == {"d1", "d2"}


def test_payload_roundtrip(spark, archives):
    r = (_load(spark, archives)
         .filter("dataset = 'd1' AND z = 2 AND x = 3 AND y = 1")
         .collect())
    assert len(r) == 1
    assert bytes(r[0].payload) == b"d1:2/3/1"


def test_dataset_partition_pruning(spark, archives):
    reader = DS.PMTilesReader({"path": archives})
    from pyspark.sql.datasource import EqualTo
    leftover = list(reader.pushFilters([EqualTo(("dataset",), "d2")]))
    assert leftover == []
    parts = reader.partitions()
    assert [p.dataset for p in parts] == ["d2"]


def test_zoom_pushdown_counts(spark, archives):
    df = _load(spark, archives)
    assert df.filter("z = 1").count() == 4
    assert df.filter("z >= 1 AND z < 3").count() == 20
    assert df.filter("z IN (0, 5)").count() == 17
    assert df.filter("x = 0 AND y = 0").count() == 4


def test_pushdown_reaches_reader(spark, archives):
    """The z filter must be absorbed by pushFilters (exact pushdown),
    leaving no Spark-side Filter for it in the plan."""
    df = _load(spark, archives).filter("z = 5")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the equality predicate is absorbed by the reader; only the
    # residual isnotnull remains Spark-side
    assert "= 5" not in plan, plan
    assert df.count() == 16


def test_leaf_archive_through_source(spark, tmp_path):
    """A >16 KiB-root archive (leaf directories) reads back through the
    data source, and zoom pushdown still returns the right subset."""
    tiles = [(8, x, y, f"{x}/{y}".encode())
             for x in range(0, 256, 2) for y in range(0, 256, 2)]
    tiles += [(3, x, y, b"z3") for x in range(8) for y in range(8)]
    P.write_pmtiles(str(tmp_path / "big.pmtiles"), tiles, {"name": "big"})
    df = _load(spark, str(tmp_path / "big.pmtiles"))
    assert df.count() == len(tiles)
    assert df.filter("z = 3").count() == 64
    got = df.filter("z = 8 AND x = 10 AND y = 20").collect()
    assert len(got) == 1 and bytes(got[0].payload) == b"10/20"
