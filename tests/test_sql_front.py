"""SQL front parity: the SAME SQL text through spark.sql and DuckDB.

`spark.sql` IS this engine's parser/optimizer (SURVEY §7: 'we never
write one').  These queries are written in the dialect intersection,
registered over identical views, and must agree value-for-value —
demonstrating that a user can bring plain ANSI SQL to either engine.
"""

from __future__ import annotations

import pytest

from geohub_data_pipeline_spark.sources.tables import register_views
from geohub_data_pipeline_spark.testing import compare_frames

DIALECT_NEUTRAL_QUERIES = {
    "revenue_by_nation": """
        SELECT n.n_name,
               count(*) AS n_customers,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
                 AS total_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "order_priority_counts": """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        GROUP BY o_orderpriority, o_orderstatus
    """,
    "parts_never_shipped": """
        SELECT p_partkey, p_brand FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    """,
    "top_spenders": """
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                 AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12
    """,
}


@pytest.mark.parametrize("name", sorted(DIALECT_NEUTRAL_QUERIES))
def test_same_sql_both_engines(name, spark, duck, sf_dir):
    sql = DIALECT_NEUTRAL_QUERIES[name]
    register_views(spark, sf_dir)
    got = spark.sql(sql).toPandas()
    want = duck.execute(sql).df()
    problems = compare_frames(got, want)
    assert not problems, f"{name}: " + "; ".join(problems)
