"""End-to-end correctness: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 gate (CORRECTNESS_r{N}.json): row count +
schema + order-insensitive value match at a small scale factor.
"""

from __future__ import annotations

import pytest

from geohub_data_pipeline_spark.plans import all_queries
from geohub_data_pipeline_spark.testing import compare_frames

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.sql is None:
        # rows-only check (non-SQL-expressible op)
        assert len(sdf) >= 0
        return
    ddf = duck.execute(spec.sql).df()
    problems = compare_frames(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names


def test_hll_estimate_accuracy(spark, sf_dir):
    """The hand-rolled HLL (p=8 => ~6.5% typical error) must land
    within 20% of the exact distinct count."""
    row = SPECS["agg_hll_manual"].fn(spark, sf_dir).collect()[0]
    assert row.n_exact > 0
    rel = abs(row.hll_estimate - row.n_exact) / row.n_exact
    assert rel <= 0.20, (row.n_exact, row.hll_estimate)


def test_histogram_quantile_brackets_exact(spark, sf_dir):
    """Each histogram-quantile upper edge must sit within one bin
    width (100) above the exact percentile."""
    from geohub_data_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    row = SPECS["agg_histogram_quantile"].fn(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    ).collect()[0]
    for est, ex in [(row.p50_upper, exact.p50), (row.p90_upper, exact.p90),
                    (row.p99_upper, exact.p99)]:
        assert ex <= est <= ex + 100.0, (est, ex)
