"""General (irregular-interval) range join operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from geohub_data_pipeline_spark.operators.rangejoin import range_join_general


def test_irregular_intervals_match_naive(spark):
    points = spark.range(0, 500).select(
        (F.col("id") * 0.37).alias("v"), "id")
    intervals = spark.createDataFrame(
        [(0, 0.0, 1.0), (1, 0.5, 30.0), (2, 29.9, 30.1), (3, 100.0, 101.0),
         (4, 150.0, 200.0)],
        "iv_id int, lo double, hi double")
    fast = range_join_general(points, intervals, "v", granularity=5.0)
    naive = points.join(
        intervals,
        (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
    assert fast.count() == naive.count()
    assert (fast.select("id", "iv_id")
            .exceptAll(naive.select("id", "iv_id")).count()) == 0


def test_left_join_keeps_unmatched(spark):
    points = spark.createDataFrame(
        [(0.5,), (99.0,)], "v double")
    intervals = spark.createDataFrame(
        [(0, 0.0, 1.0)], "iv_id int, lo double, hi double")
    out = range_join_general(points, intervals, "v", granularity=1.0,
                             how="inner")
    assert out.count() == 1   # 99.0 has no interval
