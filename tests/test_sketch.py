"""Mergeable KLL quantile sketch (operators/sketch.py)."""

from __future__ import annotations


def test_kll_sketch_rank_error_and_merge(spark):
    """KLL quantiles: rank error bounded under merge across
    partition layouts, exact n carried, and a skewed lognormal
    distribution handled (the case uniform histograms miss)."""
    import numpy as np

    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators import sketch as SK

    rng = np.random.RandomState(0)
    vals = rng.lognormal(3.0, 2.0, 50000)
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double")
    qs = [0.01, 0.5, 0.99]
    for parts in (1, 7, 32):
        est, n = SK.kll_quantiles(df.repartition(parts), "x", qs,
                                  k=256)
        assert n == 50000
        sv = np.sort(vals)
        for q in qs:
            true_rank = np.searchsorted(sv, est[q], side="right")
            assert abs(true_rank - q * 50000) <= 0.02 * 50000, (
                parts, q, est[q], true_rank)
    # NaN/null values are ignored, not counted
    df2 = df.withColumn(
        "x", F.when(F.col("x") > 1e12, None).otherwise(F.col("x")))
    est2, n2 = SK.kll_quantiles(
        df2.limit(1000), "x", [0.5], k=64)
    assert n2 <= 1000 and est2[0.5] == est2[0.5]  # not NaN
