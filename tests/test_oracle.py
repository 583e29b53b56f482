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


def test_hll_registers_merge(spark, sf_dir):
    """Mergeability — the property that makes sketches the 100 TB
    answer: registers built on two disjoint halves, merged with
    element-wise max, must equal the registers built on the union."""
    from geohub_data_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, sf_dir, "events")

    def registers(df):
        h = df.select(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                               1, 15), 16, 10).cast("long").alias("hv"))
        w = F.col("hv").bitwiseAND(F.lit(4503599627370495))
        r = h.select(
            F.shiftright("hv", 52).alias("bucket"),
            F.when(w == 0, 53).otherwise(53 - F.length(F.bin(w)))
            .alias("rho"))
        return {row.bucket: row.maxrho for row in
                r.groupBy("bucket").agg(F.max("rho").alias("maxrho"))
                .collect()}

    full = registers(ev)
    a = registers(ev.filter(F.col("event_id") % 2 == 0))
    b = registers(ev.filter(F.col("event_id") % 2 == 1))
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == full


def test_countmin_never_undercounts(spark, sf_dir):
    """CMS invariant: every estimate >= exact count, and with only
    ~25 brands in 256 columns, most estimates are exactly right."""
    rows = SPECS["agg_countmin_heavyhitters"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.cms_count >= r.exact_count for r in rows)
    exact_hits = sum(1 for r in rows if r.cms_count == r.exact_count)
    assert exact_hits >= 0.6 * len(rows)


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """Bloom invariant: pass-set covers every exact match (no false
    negatives); false positives are the small audited remainder."""
    row = SPECS["join_bloom_prefilter"].fn(spark, sf_dir).collect()[0]
    assert row.n_exact_match > 0
    assert row.n_bloom_pass == row.n_exact_match + row.n_false_positives
    # 4096 bits / ~tens of keys => tiny FP rate at harness scale
    assert row.n_false_positives <= 0.05 * row.n_bloom_pass + 5
