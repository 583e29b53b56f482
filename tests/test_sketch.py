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


def test_kll_grouped_matches_per_group_reference(spark):
    """r9: grouped KLL — every group's estimates land within the
    rank bound of that group's EXACT quantiles, no cross-group
    contamination (groups have disjoint value ranges, so one leaked
    sketch row would blow the bound), exact per-group n."""
    import random

    from geohub_data_pipeline_spark.operators.sketch import (
        kll_quantiles_grouped,
    )

    rng = random.Random(63)
    rows = []
    sizes = {"a": 3000, "b": 800, "c": 40}
    for g, (lo, hi) in zip(sizes, ((0, 100), (1000, 1100), (5000, 5010))):
        for _ in range(sizes[g]):
            rows.append((g, rng.uniform(lo, hi)))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g string, v double").repartition(6)
    out = kll_quantiles_grouped(df, "g", "v", [0.1, 0.5, 0.9], k=128)
    got = {(r.g, r.q): (r.est, r.n) for r in out.collect()}
    assert len(got) == 9
    import numpy as np
    vals = {}
    for g, v in rows:
        vals.setdefault(g, []).append(v)
    for g, vs in vals.items():
        a = np.sort(np.asarray(vs))
        n = len(a)
        for q in (0.1, 0.5, 0.9):
            est, n_got = got[(g, q)]
            assert n_got == n
            true_rank = int(np.searchsorted(a, est, side="right"))
            assert abs(true_rank - q * n) <= max(2, 0.02 * n), (g, q)
            # disjoint ranges: the estimate must be INSIDE its
            # group's range — a leaked row would land outside
            assert a[0] <= est <= a[-1]


def test_kmv_exact_below_k(spark):
    """With fewer than k distinct values on both sides, every
    set-operation estimate is EXACT, at any partition layout."""
    from geohub_data_pipeline_spark.operators import sketch as SK

    a_vals = list(range(0, 600))            # A = {0..599}
    b_vals = list(range(400, 900))          # B = {400..899}
    dfa = spark.createDataFrame(
        [(v,) for v in a_vals * 3], "key long")   # duplicates: ignored
    dfb = spark.createDataFrame([(v,) for v in b_vals], "key long")
    for parts in (1, 5, 16):
        est = SK.kmv_setop_estimates(
            dfa.repartition(parts), dfb.repartition(parts),
            "key", k=1024)
        assert est["est_a"] == 600.0
        assert est["est_b"] == 500.0
        assert est["est_union"] == 900.0
        assert est["est_intersect"] == 200.0
        assert est["est_diff"] == 400.0


def test_kmv_error_bound_above_k(spark):
    """Estimation regime (50k distinct >> k=512): every estimate
    lands within 5 relative standard errors, and the layout does
    not change the result (the merge is associative and the hash is
    deterministic)."""
    from geohub_data_pipeline_spark.operators import sketch as SK

    n = 50_000
    dfa = spark.range(0, n).withColumnRenamed("id", "key")
    dfb = spark.range(n // 2, n + n // 2).withColumnRenamed("id", "key")
    k = 512
    rse = 1.0 / (k - 1) ** 0.5
    ests = []
    for parts in (4, 32):
        est = SK.kmv_setop_estimates(
            dfa.repartition(parts), dfb.repartition(parts),
            "key", k=k)
        ests.append(est)
        for op, exact in [("est_a", n), ("est_b", n),
                          ("est_union", int(1.5 * n)),
                          ("est_intersect", n // 2),
                          ("est_diff", n // 2)]:
            assert abs(est[op] - exact) <= 5 * rse * 1.5 * n, (
                parts, op, est[op], exact)
    assert ests[0] == ests[1]          # layout-independent


def test_join_cardinality_exact_below_k_and_bounded_above(spark):
    """Join-size estimate: exact when the union key domain fits the
    sketch; within 5 RSE on a skewed 20k-key domain above it."""
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators import sketch as SK

    # small domain: exact.  A has key i twice, B once -> |A><B| = 2n
    n = 300
    dfa = spark.range(0, n).select(
        F.explode(F.array(F.col("id"), F.col("id"))).alias("k"))
    dfb = spark.range(0, n).withColumnRenamed("id", "k")
    r = SK.join_cardinality_estimate(dfa, "k", dfb, "k", k=1024)
    assert r["estimate"] == float(2 * n)
    assert r["theta_frac"] == 1.0

    # big skewed domain: key i appears (i % 7) + 1 times on each side
    big = spark.range(0, 20_000).select(
        F.col("id").alias("k"), ((F.col("id") % 7) + 1).alias("m"))
    rep = big.select(F.explode(F.expr(
        "transform(sequence(1, m), x -> k)")).alias("k"))
    r = SK.join_cardinality_estimate(rep, "k", rep, "k", k=1024)
    exact = sum(((i % 7) + 1) ** 2 for i in range(20_000))
    assert abs(r["estimate"] - exact) <= 5 * exact / (1024 - 1) ** 0.5
