"""FIXTURES.md §B golden-output checks, end-to-end over the fixture
generators (the checks promised by SURVEY §5 / FIXTURES.md)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.sources import fixtures as FX
from geohub_data_pipeline_spark.operators import geometry as G
from geohub_data_pipeline_spark.operators import raster as R
from geohub_data_pipeline_spark.operators import tiling as TLG
from geohub_data_pipeline_spark.streaming.service import (
    parse_messages,
    route_messages,
)


def test_message_route_distribution(spark):
    """Non-raw completed untouched; pmtiles passthrough; malformed
    dead-lettered (FIXTURES §B ingest_messages mix)."""
    msgs = FX.ingest_messages(spark, 200)
    routes = dict(
        route_messages(parse_messages(msgs))
        .groupBy("route").count().collect()
    )
    assert routes["dead_letter"] == 4            # every 50th (~2%)
    assert routes["complete_untouched"] == 20    # staging (~10%)
    assert routes["passthrough"] == 10           # raw pmtiles (~5%)
    assert routes["vector"] + routes["raster"] == 166


def test_fgb_stage_golden(spark):
    """FGB-stage golden checks: same rows as valid input per layer,
    zero rows for the NULL-srid layer, all geometries Multi*."""
    feats = FX.vector_features(spark)
    norm = G.normalize_features(feats)
    out_layers = dict(
        norm.groupBy("layer").count().collect())

    # NULL-srid layer skipped entirely
    assert "nosrid" not in out_layers
    # unsupported CRS (29101 Brazil Polyconic, no pyproj) dropped +
    # auditable; UTM 32633 is a native closed-form transform and SURVIVES
    assert "unsupp" not in out_layers
    assert "utm" in out_layers

    in_valid = dict(
        feats.filter(F.col("geometry").isNotNull()
                     & F.col("srid").isin(4326, 3857, 32633))
        .groupBy("layer").count().collect())
    assert out_layers == in_valid

    # reprojected UTM rows land inside the zone-33 lon band
    utm_bbox = norm.filter("layer = 'utm'").agg(
        F.min("bbox_minx"), F.max("bbox_maxx")).collect()[0]
    assert 11.9 <= utm_bbox[0] and utm_bbox[1] <= 18.1

    # everything Multi*
    assert set(r.geom_type for r in norm.select("geom_type")
               .distinct().collect()) <= {G.MULTIPOINT, G.MULTILINESTRING,
                                          G.MULTIPOLYGON}
    # bowties are REPAIRED by makevalid-lite: nothing stays flagged,
    # and every repaired polys row decodes as simple loops
    assert norm.filter("needs_makevalid").count() == 0
    split = norm.filter(
        (F.col("geom_type") == G.MULTIPOLYGON)).collect()
    assert all(
        G._first_self_crossing(G._pairs(p)) is None
        for r in split for p in G.parse_wkb(bytes(r.geometry))["parts"])

    # audit marks lossy layers 'warning' and dead layers 'error'
    audit = {r.layer: r.audit_status
             for r in G.feature_count_audit(
                 feats, norm, ["layer"]).collect()}
    assert audit["nosrid"] == "error" and audit["unsupp"] == "error"
    assert audit["points"] in ("ok", "warning")


def test_tiling_golden_from_fixtures(spark):
    """Every feature's bbox intersects its tiles; per-layer counts
    nonzero at every zoom (the tilestats audit invariant)."""
    feats = FX.vector_features(spark).filter("layer = 'points'")
    norm = G.normalize_features(feats)
    tiles = TLG.build_tiles(norm, maxzoom=4)
    audit = TLG.tile_audit(tiles).collect()
    assert {r.z for r in audit} == {0, 1, 2, 3, 4}
    assert all(r.min_features_per_tile >= 1 for r in audit)
    n_feats = norm.count()
    z0 = [r for r in audit if r.z == 0][0]
    assert z0.n_features == n_feats


def test_raster_golden_from_fixtures(spark):
    """COG-stage golden checks: block counts = ceil(dim/256)^2; RGB
    dataset -> one multiband output; overview counts halve per axis."""
    blocks = FX.raster_blocks(spark)

    counts = {(r.dataset, r.band): r["count"] for r in
              blocks.groupBy("dataset", "band").count().collect()}
    assert counts[("rgb.tif", 1)] == math.ceil((2 * R.BLOCK - 32) / R.BLOCK) \
        * math.ceil((2 * R.BLOCK - 64) / R.BLOCK)

    bands = blocks.select("dataset", "subdataset", "band", "colorinterp") \
        .distinct().withColumn("photometric", F.lit(None).cast("string"))
    modes = {(r.dataset, r.band): r.cog_mode
             for r in R.rgb_dispatch(bands).collect()}
    assert modes[("rgb.tif", 1)] == "rgb_composite"
    assert modes[("grey.tif", 1)] == "per_band"
    assert modes[("climate.nc", 1)] == "per_band"

    pyramid = R.overview_cascade(
        blocks.filter("dataset = 'rgb.tif' AND band = 1"), levels=1)
    audit = {r.level: r for r in R.block_audit(pyramid).collect()}
    assert audit[0].n_blocks == 4
    assert audit[1].n_blocks == 1
    assert audit[1].grid_w == math.ceil(audit[0].grid_w / 2)


def test_cancel_messages_match_targets(spark):
    msgs = FX.ingest_messages(spark, 200)
    cancels = FX.cancel_messages(spark, msgs)
    rows = cancels.collect()
    assert len(rows) >= 4
    assert all(r.cancel and "/raw/" in r.url and r.user.startswith("user")
               for r in rows)
