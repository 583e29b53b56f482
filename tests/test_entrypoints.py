"""EP2 (CLI) and EP3 (backfill) entry-point tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.backfill import backfill_plan, backfill_user_ids
from geohub_data_pipeline_spark.operators import geometry as G


def test_backfill_plan(spark):
    datasets = spark.createDataFrame(
        [("u1/datasets/a/a.pmtiles",),   # missing fgb, raw present -> work
         ("u1/datasets/b/b.pmtiles",),   # fgb exists -> skip
         ("u2/datasets/c/c.pmtiles",),   # raw missing -> skip
         ("test/datasets/d/d.pmtiles",), # excluded user -> skip
         ("u2/datasets/e/e.fgb",)],      # not a pmtiles dataset
        "path string")
    existing = spark.createDataFrame(
        [("u1/datasets/b/b.fgb",)], "path string")
    raw = spark.createDataFrame(
        [("u1/raw/a/a.gpkg",), ("u1/raw/b/b.gpkg",),
         ("test/raw/d/d.gpkg",)], "path string")
    plan = backfill_plan(datasets, existing, raw).collect()
    assert [(r.user, r.dataset_path) for r in plan] == \
        [("u1", "u1/datasets/a/a.pmtiles")]
    r = plan[0]
    assert r.fgb_path == "u1/datasets/a/a.fgb"
    assert r.raw_path == "u1/raw/a/a"


def test_backfill_user_ids(spark):
    datasets = spark.createDataFrame(
        [("u1/datasets/a.pmtiles",), ("u1/datasets/b.pmtiles",),
         ("u2/datasets/c.pmtiles",), ("test/datasets/d.pmtiles",)],
        "path string")
    users = {r.user: r.user_hash
             for r in backfill_user_ids(datasets).collect()}
    assert set(users) == {"u1", "u2"}
    assert len(users["u1"]) == 32    # md5 hex


def test_cli_pipeline(spark, tmp_path):
    """EP2: feature parquet in -> tile pyramid + audits out (driven via
    the same functions the CLI wires; the argv surface is exercised in
    scripts, not here, to reuse the session fixture)."""
    from geohub_data_pipeline_spark.operators import tiling as TLG

    src = f"{tmp_path}/feats"
    spark.createDataFrame(
        [("d", "l", i, G.wkb_point(i * 3.0 - 60, i * 2.0 - 30), 4326)
         for i in range(20)],
        "dataset string, layer string, fid long, geometry binary, srid int"
    ).write.parquet(src)

    feats = spark.read.parquet(src)
    norm = G.normalize_features(feats)
    tiles = TLG.build_tiles(norm, maxzoom=3)
    out = f"{tmp_path}/out"
    tiles.write.partitionBy("z").parquet(f"{out}/tiles")
    got = spark.read.parquet(f"{out}/tiles")
    assert got.count() > 0
    assert got.filter("z = 0").agg(F.sum("n_features")).first()[0] == 20
