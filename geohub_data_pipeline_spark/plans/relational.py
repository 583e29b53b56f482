"""Relational operator closure (SURVEY.md §2.5).

The reference implements no relational algebra of its own (its only
join-shaped logic is the backfill anti-join, ``/root/reference/ingest/
fgb_upload/main.py:117-138``, and its only aggregates are audit counts,
``ingest/processing.py:160-181``).  The harness requires the full
surface anyway; everything here is a Catalyst built-in — the engine
adds zero custom execution code for this module.

Scale notes are per-query; the common ones:
  * joins to small dims are explicitly ``broadcast()`` (no shuffle of
    the fact table);
  * aggregations are expressed so map-side partial aggregation applies
    (plain ``groupBy().agg()``);
  * every LIMIT has a total order (deterministic top-k), implemented as
    order+limit which Spark executes as TakeOrderedAndProject (no
    global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geohub_data_pipeline_spark.plans.registry import query
from geohub_data_pipeline_spark.localdata import local_df
from geohub_data_pipeline_spark.plans._util import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    load_tables,
)

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan + filter + hash agg + sort)
# ---------------------------------------------------------------------------

_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount')} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", "relational", "§2.5 agg/sort; audit-count analog T16", _Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter -> hash agg -> sort.

    Scale: filter + column pruning push into the parquet scan; the agg
    is partial+final (map-side combine), so the shuffle carries only
    6 groups x partial states, not 100 TB of rows.
    """
    t = load_tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        t.lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

_JOIN_INNER_SQL = f"""
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       {dsum_sql('o.o_totalprice')} AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@query("join_inner", "relational", "§2.5 joins (equi inner)", _JOIN_INNER_SQL)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact->dim, dim broadcast (no fact shuffle)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer),
                      t.orders.o_custkey == t.customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice")).alias("total_price"))
    )


_JOIN_LEFT_SQL = """
SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY c.c_custkey
"""


@query("join_left_outer", "relational", "§2.5 joins (left outer)", _JOIN_LEFT_SQL)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count = 0)."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.orders.o_custkey == t.customer.c_custkey,
                        "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


_JOIN_FULL_SQL = """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(c.n_cust, 0) AS n_cust,
       coalesce(s.n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
ORDER BY nationkey
"""


@query("join_full_outer", "relational", "§2.5 joins (full outer)", _JOIN_FULL_SQL)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (agg-before-join:
    shuffles carry one row per nation, not raw tables)."""
    t = load_tables(spark, sf_dir)
    c = t.customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust"))
    s = t.supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp"))
    return (
        c.join(s, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


_JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
ORDER BY c_custkey
"""


@query("join_semi", "relational", "§2.5 joins (left semi)", _JOIN_SEMI_SQL)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one open order."""
    t = load_tables(spark, sf_dir)
    open_orders = t.orders.filter(F.col("o_orderstatus") == "O")
    return (
        t.customer.join(open_orders,
                        t.customer.c_custkey == open_orders.o_custkey,
                        "left_semi")
        .select("c_custkey", "c_name")
    )


_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
ORDER BY c_custkey
"""


@query("join_anti", "relational",
       "§2.5 joins (left anti); backfill skip T20 "
       "(ref ingest/fgb_upload/main.py:117-138)", _JOIN_ANTI_SQL)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the reference's backfill 'skip if output exists'
    pattern (ingest/fgb_upload/main.py:121-125) as a relational op."""
    t = load_tables(spark, sf_dir)
    pending = t.orders.filter(F.col("o_orderstatus") == "P")
    return (
        t.customer.join(pending, t.customer.c_custkey == pending.o_custkey,
                        "left_anti")
        .select("c_custkey", "c_name")
    )


_JOIN_Q5_SQL = f"""
SELECT n.n_name,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""


@query("join_multiway_broadcast", "relational",
       "§2.5 joins (multiway + broadcast)", _JOIN_Q5_SQL)
def join_multiway_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join, local-supplier revenue by nation.

    Plan shape: the selective dimension chain is applied first —
    region(ASIA) -> nation -> customer (all broadcast) filters
    ``orders`` to ~1/5 *before* the fact table joins it, so the big
    side (lineitem, the 100 TB table) joins an already-reduced build
    side and is never shuffled.  Spark without CBO keeps the written
    join order, so the filter-first ordering is stated explicitly
    (DuckDB's optimizer derives the same shape itself).

    Scale: the broadcast of the filtered orders holds while
    selectivity x |orders| fits the broadcast threshold; beyond that,
    drop the hint and AQE picks shuffle-hash on orderkey — with
    lineitem and orders bucketed by orderkey the shuffle disappears
    entirely.
    """
    t = load_tables(spark, sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # every broadcast side is projected to exactly the key/output
    # columns BEFORE the hint: the broadcast relation materializes
    # pre-pruned (measured ~20% off the query at sf1 vs relying on
    # post-hoc column pruning through the hint)
    asia_cust = (
        t.customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(t.nation.select("n_nationkey", "n_regionkey",
                                          "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")
                          .select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders_asia = (
        t.orders.select("o_orderkey", "o_custkey")
        .join(F.broadcast(asia_cust),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey", "n_name")
    )
    return (
        t.lineitem
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(orders_asia),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(dsum(revenue, 6).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


_RANGE_JOIN_SQL = f"""
SELECT v.bucket_id, v.lo, v.hi,
       count(*) AS n_items,
       {dsum_sql('l.l_extendedprice')} AS bucket_price
FROM lineitem l
JOIN (VALUES {', '.join(f'({i}, {i * 5}.0, {(i + 1) * 5}.0)' for i in range(10))})
     v(bucket_id, lo, hi)
  ON l.l_quantity >= v.lo AND l.l_quantity < v.hi
GROUP BY v.bucket_id, v.lo, v.hi
ORDER BY v.bucket_id
"""


@query("join_range_theta", "relational", "§2.5 joins (theta/range via broadcast)",
       _RANGE_JOIN_SQL)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join of quantity against an interval dimension.

    Scale: these intervals are uniform-width, so the range condition
    is *rewritten to an equi-join on the derived bucket key* — a
    broadcast hash join with whole-stage codegen instead of a
    row-at-a-time broadcast-nested-loop (~3x faster even at sf0.1; the
    gap widens with data).  Irregular intervals use the general
    BNLJ operator: ``operators/rangejoin.range_join_general``.
    """
    t = load_tables(spark, sf_dir)
    buckets = local_df(spark, 
        [(i, float(i * 5), float((i + 1) * 5)) for i in range(10)],
        "bucket_id INT, lo DOUBLE, hi DOUBLE",
    )
    keyed = t.lineitem.withColumn(
        "bucket_id", F.floor(F.col("l_quantity") / 5).cast("int"))
    return (
        keyed.join(F.broadcast(buckets), "bucket_id")
        # derived key is a superset map: re-check the exact bounds
        .filter((F.col("l_quantity") >= F.col("lo"))
                & (F.col("l_quantity") < F.col("hi")))
        .groupBy("bucket_id", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum(F.col("l_extendedprice")).alias("bucket_price"))
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

_AGG_STATS_SQL = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       {dsum_sql('l_quantity')} AS sum_qty,
       CAST(min(l_quantity) AS DOUBLE) AS min_qty,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty,
       {davg_sql('l_quantity')} AS avg_qty,
       round(stddev_samp(l_quantity), 4) AS std_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_stats", "relational", "§2.5 aggregation (stats)", _AGG_STATS_SQL)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full stats pack per group (count/sum/min/max/avg/stddev)."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        )
    )


_AGG_DISTINCT_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("agg_distinct", "relational", "§2.5 aggregation (count distinct)",
       _AGG_DISTINCT_SQL)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count-distincts in one agg (Catalyst expands)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


_AGG_CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("agg_cube", "relational", "§2.5 aggregation (cube)", _AGG_CUBE_SQL)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets).

    r11: pre-aggregate to the base (flag, status) group, then CUBE the
    tiny aggregate — Spark's native cube Expands every input row x4
    BEFORE the partial aggregate (plans/r11/agg_cube_before.txt), so
    the 100 TB side pays 4x the hash-agg probes and decimal casts for
    states that merge to the same 4 x |groups| rows anyway (guide
    §2.3: aggregate before you shuffle).  count/sum are associative,
    so re-aggregating the base partials is exact: sum of decimal
    partials is the same decimal, count rolls up as a long sum —
    bit-identical output.  The second exchange this adds carries
    |groups| rows (6 here), nothing at any scale.
    """
    t = load_tables(spark, sf_dir)
    base = (
        t.lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("__s"))
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(F.sum("__n").alias("n_rows"),
             F.sum("__s").cast("double").alias("sum_qty"))
    )


_AGG_ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


_AGG_PIVOT_SQL = f"""
SELECT o_orderpriority,
       {dsum_sql('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'F'")}
         AS total_f,
       {dsum_sql('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'O'")}
         AS total_o,
       {dsum_sql('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'P'")}
         AS total_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("agg_pivot_status", "relational",
       "§2.5 aggregation (pivot: long -> wide reshaping)",
       _AGG_PIVOT_SQL)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value pivoted wide by status (one column per status),
    the long->wide reshaping query.  Pivot values are enumerated
    explicitly — at scale that skips the extra distinct-values scan
    Spark otherwise runs, and makes the output schema static.  The
    oracle expresses the identical computation as conditional
    aggregation (the portable form).
    """
    t = load_tables(spark, sf_dir)
    piv = (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice")))
    )
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("total_f"),
        F.col("O").alias("total_o"),
        F.col("P").alias("total_p"),
    )


_AGG_GSETS_DF_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query("agg_grouping_sets_df", "relational",
       "§2.5 aggregation (grouping sets via the native DataFrame "
       "groupingSets API, vs the SQL-front twin agg_grouping_sets)",
       _AGG_GSETS_DF_SQL)
def agg_grouping_sets_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status), (priority)) — both marginals in ONE
    scan and one shuffle (the expand operator tags each row per set),
    where two separate groupBys would scan and shuffle twice.

    r11: base-aggregate to (status, priority) first, run the grouping
    sets over the tiny partial (guide §2.3; see agg_cube) — the Expand
    x2 then multiplies |groups| rows, not |orders| rows.
    """
    t = load_tables(spark, sf_dir)
    base = (
        t.orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("__s"))
    )
    return (
        base.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus", "o_orderpriority")
        .agg(F.sum("__n").alias("n_orders"),
             F.sum("__s").cast("double").alias("total_price"))
    )


@query("agg_rollup", "relational", "§2.5 aggregation (rollup)", _AGG_ROLLUP_SQL)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy status -> priority -> grand total.

    r11: base-aggregate first, ROLLUP the tiny partial (same move as
    agg_cube, guide §2.3) — the native rollup Expands every input row
    x3 before its partial aggregate; count/decimal-sum re-aggregate
    exactly.
    """
    t = load_tables(spark, sf_dir)
    base = (
        t.orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("__s"))
    )
    return (
        base.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.sum("__n").alias("n_orders"),
             F.sum("__s").cast("double").alias("total_price"))
    )


_AGG_GSETS_SQL = f"""
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       {dsum_sql('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("agg_grouping_sets", "relational", "§2.5 aggregation (grouping sets)",
       _AGG_GSETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL front (spark.sql)."""
    load_tables(spark, sf_dir).lineitem.createOrReplaceTempView("lineitem")
    # same text as the oracle minus the (decorative) global sort
    return spark.sql(_AGG_GSETS_SQL.rsplit("ORDER BY", 1)[0])


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

_WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number()  OVER w AS rn,
         rank()         OVER w AS rnk,
         dense_rank()   OVER w AS drnk,
         ntile(4)       OVER w AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
) WHERE rn <= 5
ORDER BY c_nationkey, rn
"""


@query("window_rank", "relational", "§2.5 windows (ranking)", _WINDOW_RANK_SQL)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a deterministic (tie-broken) order."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t.customer.select(
            "c_nationkey", "c_custkey", "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
        .filter(F.col("rn") <= 5)
    )


_WINDOW_ANALYTIC_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS first_price,
       last_value(o_totalprice)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


@query("window_analytic", "relational", "§2.5 windows (lag/lead/first/last)",
       _WINDOW_ANALYTIC_SQL)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family with explicit frames."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t.orders.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.first("o_totalprice").over(wf).alias("first_price"),
            F.last("o_totalprice").over(wf).alias("last_price"),
        )
    )


_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend,
       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS orders_in_3
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@query("window_running", "relational", "§2.5 windows (frames/running agg); "
       "progress model T15 analog (ref ingest/utils.py:79-123)",
       _WINDOW_RUNNING_SQL)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + sliding frames (decimal-exact running sum)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t.orders.select(
            "o_custkey", "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").alias("running_spend"),
            F.count(F.lit(1)).over(w.rowsBetween(-2, Window.currentRow))
            .cast("bigint").alias("orders_in_3"),
        )
    )


_TOPK_SQL = """
SELECT * FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3
ORDER BY p_brand, rn
"""


@query("topk_per_group", "relational", "§2.5 sort/limit (top-k per group)",
       _TOPK_SQL)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest parts per brand via row_number (scales: rank is
    computed within partitions after one shuffle on the group key)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        t.part.select("p_brand", "p_partkey", "p_retailprice",
                      F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


_SORT_LIMIT_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("sort_limit", "relational", "§2.5 sort/limit (global top-k)",
       _SORT_LIMIT_SQL)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full global sort."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

_SET_UNION_SQL = """
SELECT k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
  UNION
  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
) ORDER BY k
"""


@query("set_union", "relational", "§2.5 set ops (union distinct)", _SET_UNION_SQL)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k"))
    b = t.customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("k"))
    return a.union(b).distinct()


_SET_INTERSECT_SQL = """
SELECT k FROM (
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
) ORDER BY k
"""


@query("set_intersect", "relational", "§2.5 set ops (intersect)",
       _SET_INTERSECT_SQL)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having both fulfilled and open orders.

    INTERSECT rewritten as one scan + one keyed aggregation: both
    branches read the same table, so ``a.intersect(b)`` (two scans,
    build+broadcast of every 'O' custkey, semi-join, then a distinct)
    collapses to ``groupBy(custkey)`` with two boolean flags — the
    map-side partial aggregation reduces the exchange to distinct
    custkeys and there is no broadcast build at all (guide §2.4: two
    operations keyed the same way share one exchange; §3.1: the
    build side here grows with the data, so broadcasting it is the
    wrong strategy at scale).  Measured at bench sf3: 4.7 s -> the
    agg form, one Exchange, no BroadcastExchange.  NULL custkeys
    group together, matching INTERSECT's null-equality semantics.
    """
    t = load_tables(spark, sf_dir)
    st = F.col("o_orderstatus")
    return (
        t.orders.filter(st.isin("F", "O"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.max(st == "F").alias("__f"), F.max(st == "O").alias("__o"))
        .filter(F.col("__f") & F.col("__o"))
        .select("k")
    )


_SET_EXCEPT_SQL = """
SELECT k FROM (
  SELECT l_partkey AS k FROM lineitem
  EXCEPT
  SELECT l_partkey AS k FROM lineitem
  WHERE l_returnflag = 'R' AND l_quantity > 40
) ORDER BY k
"""


@query("set_except", "relational", "§2.5 set ops (except)", _SET_EXCEPT_SQL)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never returned in bulk (EXCEPT DISTINCT semantics).

    r11: both EXCEPT branches read the SAME table, so the
    ``a.subtract(b)`` plan (two full scans of lineitem + a left-anti
    join over two exchanges) collapses to one scan + one keyed
    aggregation (guide §2.4, the set_intersect move): a partkey
    survives EXCEPT iff no row of it matches the bulk-return filter.
    Map-side partial aggregation reduces the exchange to distinct
    partkeys; NULL partkeys group together, matching EXCEPT's
    null-equality.  The coalesce guards the all-NULL-condition group
    (max of an empty/NULL vote is NULL, which must read as "never
    returned", not "drop the key").
    """
    t = load_tables(spark, sf_dir)
    bulk = (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 40)
    return (
        t.lineitem.groupBy(F.col("l_partkey").alias("k"))
        .agg(F.coalesce(F.max(bulk), F.lit(False)).alias("__bulk"))
        .filter(~F.col("__bulk"))
        .select("k")
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------

_SCALAR_STRING_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_uc,
       substr(p_name, 1, 12) AS name_prefix,
       length(p_name) AS name_len,
       regexp_replace(p_type, ' ', '_') AS type_slug,
       concat(p_brand, ':', p_type) AS brand_type,
       md5(p_name) AS name_md5
FROM part
ORDER BY p_partkey
"""


@query("scalar_string", "relational",
       "§2.5 scalar fns (string; md5 = user-id hash T18, "
       "ref ingest/fgb_upload/main.py:36-41)", _SCALAR_STRING_SQL)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_uc"),
            F.substring("p_name", 1, 12).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.regexp_replace("p_type", " ", "_").alias("type_slug"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.md5("p_name").alias("name_md5"),
        )
    )


_SCALAR_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_disc,
       round(l_extendedprice, 1) AS price_r1,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       sqrt(l_extendedprice) AS price_sqrt,
       power(l_tax, 2) AS tax_sq,
       CAST(l_partkey % 7 AS BIGINT) AS pk_mod7
FROM lineitem
WHERE l_linenumber = 1
ORDER BY l_orderkey
"""


@query("scalar_math", "relational", "§2.5 scalar fns (math)", _SCALAR_MATH_SQL)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-exact math functions (abs/round/floor/ceil/sqrt/pow/mod)."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey", "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
            F.round("l_extendedprice", 1).alias("price_r1"),
            F.floor("l_quantity").alias("qty_floor"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.sqrt("l_extendedprice").alias("price_sqrt"),
            F.pow("l_tax", F.lit(2)).alias("tax_sq"),
            (F.col("l_partkey") % 7).cast("bigint").alias("pk_mod7"),
        )
    )


_SCALAR_DATETIME_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
FROM orders
ORDER BY o_orderkey
"""


@query("scalar_datetime", "relational", "§2.5 scalar fns (date/time)",
       _SCALAR_DATETIME_SQL)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.orders.select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
            F.quarter("o_orderdate").cast("int").alias("order_quarter"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("timestamp_ntz").alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
            .cast("timestamp_ntz").alias("due_date"),
        )
    )


_CASE_SQL = f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS size_class,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY 1
ORDER BY size_class
"""


@query("conditional_case", "relational",
       "§2.5 scalar fns (CASE); dispatch predicate analog T12 "
       "(ref ingest/processing.py:730-739)", _CASE_SQL)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    size_class = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        t.orders.groupBy(size_class.alias("size_class"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice")).alias("total_price"))
    )


_DISTINCT_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


@query("distinct_projection", "relational", "§2.5 aggregation (distinct); "
       "user distinct T21 (ref ingest/fgb_upload/main.py:224-227)",
       _DISTINCT_SQL)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.select("l_returnflag", "l_linestatus").distinct()
    )


# ---------------------------------------------------------------------------
# Pivot, subqueries, percentiles, sketches, array aggregation
# ---------------------------------------------------------------------------

_PIVOT_SQL = """
SELECT c.c_mktsegment,
       count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
       count(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS n_open,
       count(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@query("pivot_status_by_segment", "relational", "§2.5 aggregation (pivot)",
       _PIVOT_SQL)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status across market segments (explicit value list —
    at scale never let pivot infer values with an extra pass)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer),
                      t.orders.o_custkey == t.customer.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
        .select(
            "c_mktsegment",
            F.col("F").alias("n_fulfilled"),
            F.col("O").alias("n_open"),
            F.col("P").alias("n_pending"),
        )
    )


_ABOVE_AVG_SQL = """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey) AS DOUBLE) / 100.0)
           / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM w
WHERE o_totalprice > 1.5 * cust_avg
"""


@query("subquery_above_avg", "relational",
       "§2.5 correlated-aggregate predicate", _ABOVE_AVG_SQL)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders 50% above their customer's average — the correlated
    scalar-subquery pattern, planned as hash-aggregate + equi-join on
    the correlation key rather than a window: the aggregate combines
    map-side (partial+final, whole-stage codegen) and the join-back
    shuffles only the ~|customers| aggregate rows, where a window
    would sort the full orders table per partition.  At small SF AQE
    turns the join-back into a broadcast."""
    t = load_tables(spark, sf_dir)
    # exact-sum arithmetic in integer CENTS: o_totalprice is a
    # 2-decimal money column, so sum(round(p*100)::long) is exact and
    # order-independent like the previous decimal(30,6) sum, but the
    # LONG partial aggregate stays in fast whole-stage codegen —
    # measured 1.55 s -> 0.67 s at sf1 (PERF.md round-6).  Safe here
    # because the sum is PER CUSTOMER (bounded group: ~10-100 orders
    # x <1e9 cents never nears the int64 range); global/mega-group
    # money sums keep the decimal path (_util.dsum) for overflow
    # headroom at 100 TB.
    avgs = t.orders.groupBy("o_custkey").agg(
        ((F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
          .cast("double") / 100.0) / F.count(F.lit(1)))
        .alias("cust_avg"))
    # NB: cust_avg is emitted unrounded — both engines compute the
    # identical double ((cents/100.0)/count, same op order), while
    # round() itself diverges on exact half-way values.
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(avgs, "o_custkey")
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


_IN_SUBQ_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""


@query("subquery_in", "relational", "§2.5 IN-subquery (semi-join plan)",
       _IN_SUBQ_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery == left-semi join against the filtered dim."""
    t = load_tables(spark, sf_dir)
    debtors = t.customer.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        t.orders.filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(debtors),
              F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS q25,
       round(quantile_cont(l_quantity, 0.50), 6) AS q50,
       round(quantile_cont(l_quantity, 0.75), 6) AS q75,
       round(quantile_cont(l_extendedprice, 0.90), 6) AS price_p90
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_percentile", "relational", "§2.5 aggregation (percentiles)",
       _PERCENTILE_SQL)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (matches quantile_cont).

    Scale note: exact percentile needs a per-group sort; for 100 TB
    interactive use, swap to approx_percentile (t-digest sketch,
    one pass, mergeable) — see agg_approx_distinct for the
    sketch-family pattern.
    """
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
            F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("q50"),
            F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
            F.round(F.expr("percentile(l_extendedprice, 0.90)"), 6)
            .alias("price_p90"),
        )
    )


_HIST_QUANTILE_SQL = """
WITH b AS (
  SELECT CAST(floor(l_extendedprice / 100) AS BIGINT) AS bin,
         count(*) AS c
  FROM lineitem GROUP BY bin
),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM b),
cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cc FROM b)
SELECT CAST(min(CASE WHEN cc >= 0.50 * n THEN bin END) * 100 + 100
            AS DOUBLE) AS p50_upper,
       CAST(min(CASE WHEN cc >= 0.90 * n THEN bin END) * 100 + 100
            AS DOUBLE) AS p90_upper,
       CAST(min(CASE WHEN cc >= 0.99 * n THEN bin END) * 100 + 100
            AS DOUBLE) AS p99_upper
FROM cum, t
"""


@query("agg_histogram_quantile", "relational",
       "§2.5 aggregation: mergeable equi-width-histogram quantile "
       "sketch — integer-exact, full oracle (the cross-engine-safe "
       "approximate-percentile)", _HIST_QUANTILE_SQL)
def agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles from a 100-unit equi-width histogram:
    bin counts (one groupBy — mergeable, bounded memory), cumulative
    counts over the ~1k bins, and the first bin whose cumulative
    count crosses q*n; reported as the bin's upper edge, so every
    value is integer-derived and bit-exact across engines (contrast
    ``approx_percentile``'s engine-specific t-digest).

    Scale: the corpus-sized work is ONE aggregation keyed by bin; the
    window runs over the tiny bin table (single partition by design —
    ~1k rows regardless of corpus size).  Error is bounded by the bin
    width; tested against exact percentile.
    """
    t = load_tables(spark, sf_dir)
    b = (t.lineitem
         .groupBy(F.floor(F.col("l_extendedprice") / 100).cast("long")
                  .alias("bin"))
         .agg(F.count(F.lit(1)).alias("c")))
    cum = b.select(
        "bin", F.sum("c").over(Window.orderBy("bin")).alias("cc"))
    n = b.agg(F.sum("c").cast("long").alias("n"))
    out = cum.crossJoin(n)

    def edge(q: float, name: str):
        return (F.min(F.when(F.col("cc") >= q * F.col("n"),
                             F.col("bin"))) * 100 + 100) \
            .cast("double").alias(name)

    return out.agg(edge(0.50, "p50_upper"), edge(0.90, "p90_upper"),
                   edge(0.99, "p99_upper"))


_BLOOM_SQL = """
WITH keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 10 = 3
),
bits AS (
  SELECT CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':'
                                 || CAST(k AS VARCHAR)), 1, 15)
              AS BIGINT) % 4096 AS pos
  FROM keys, (SELECT unnest(range(2)) AS d) d
),
words AS (
  SELECT pos // 32 AS w,
         CAST(bit_or(CAST(power(2.0, pos % 32) AS BIGINT)) AS BIGINT)
           AS bits
  FROM bits GROUP BY pos // 32
),
probe AS (
  SELECT o_orderkey,
         CAST('0x' || substr(md5('0:' || CAST(o_custkey AS VARCHAR)),
                             1, 15) AS BIGINT) % 4096 AS p0,
         CAST('0x' || substr(md5('1:' || CAST(o_custkey AS VARCHAR)),
                             1, 15) AS BIGINT) % 4096 AS p1,
         o_custkey
  FROM orders
),
passed AS (
  SELECT p.o_orderkey, p.o_custkey
  FROM probe p
  LEFT JOIN words w0 ON w0.w = p.p0 // 32
  LEFT JOIN words w1 ON w1.w = p.p1 // 32
  WHERE CAST(floor(COALESCE(w0.bits, 0) / power(2.0, p.p0 % 32))
             AS BIGINT) % 2 = 1
    AND CAST(floor(COALESCE(w1.bits, 0) / power(2.0, p.p1 % 32))
             AS BIGINT) % 2 = 1
)
SELECT (SELECT count(*) FROM passed) AS n_bloom_pass,
       (SELECT count(*) FROM orders o JOIN keys ON o.o_custkey = keys.k)
         AS n_exact_match,
       (SELECT count(*) FROM passed pp
        WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = pp.o_custkey))
         AS n_false_positives
"""


@query("join_bloom_prefilter", "relational",
       "§2.5 joins: bloom-filter runtime pruning of the fact side "
       "(4096-bit, 2 md5 hashes) — integer-exact, full oracle",
       _BLOOM_SQL)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB join optimization: build a bloom filter over the
    selective dimension's join keys (here ~1/10 of customers) and
    prune the fact table BEFORE its shuffle — rows failing the bloom
    can't join, rows passing are exact matches or audited false
    positives (never a false negative).

    Hand-rolled 4096-bit blocked bloom: 2 md5-salted hashes set bits
    collected into 128 32-bit words by one aggregation; the probe is
    two broadcast joins against the word table plus integer bit
    tests (floor-divide by 2^b — cross-engine-exact, no shift ops).
    At scale the word table is a byte-sized broadcast and the probe
    is map-side, so the fact shuffle moves only surviving rows —
    Spark's own runtime filters do exactly this, opaquely; this one
    is deterministic and oracle-checkable.
    """
    t = load_tables(spark, sf_dir)
    keys = (t.customer.filter(F.col("c_custkey") % 10 == 3)
            .select(F.col("c_custkey").alias("k")).distinct())
    d = spark.range(2).select(F.col("id").alias("d"))

    def h(salt: Column, key: Column) -> Column:
        return F.pmod(
            F.conv(F.substring(
                F.md5(F.concat(salt.cast("string"), F.lit(":"),
                               key.cast("string"))), 1, 15),
                16, 10).cast("long"),
            F.lit(4096))

    bits = keys.crossJoin(F.broadcast(d)).select(
        h(F.col("d"), F.col("k")).alias("pos"))
    words = (bits.groupBy(F.floor(F.col("pos") / 32).cast("long")
                          .alias("w"))
             .agg(F.bit_or(F.pow(F.lit(2.0), F.col("pos") % 32)
                           .cast("long")).alias("bits")))
    probe = t.orders.select(
        "o_orderkey", "o_custkey",
        h(F.lit(0), F.col("o_custkey")).alias("p0"),
        h(F.lit(1), F.col("o_custkey")).alias("p1"))

    def bit_set(bits_col: Column, pos: Column) -> Column:
        return (F.floor(F.coalesce(bits_col, F.lit(0))
                        / F.pow(F.lit(2.0), pos % 32))
                .cast("long") % 2) == 1

    w0 = words.select(F.col("w").alias("w0"), F.col("bits").alias("b0"))
    w1 = words.select(F.col("w").alias("w1"), F.col("bits").alias("b1"))
    passed = (
        probe
        .join(F.broadcast(w0),
              F.floor(F.col("p0") / 32).cast("long") == F.col("w0"),
              "left")
        .join(F.broadcast(w1),
              F.floor(F.col("p1") / 32).cast("long") == F.col("w1"),
              "left")
        .filter(bit_set(F.col("b0"), F.col("p0"))
                & bit_set(F.col("b1"), F.col("p1")))
        .select("o_orderkey", "o_custkey"))
    n_pass = passed.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    n_exact = (t.orders.join(keys, F.col("o_custkey") == F.col("k"))
               .agg(F.count(F.lit(1)).alias("n_exact_match")))
    n_fp = (passed.join(keys, F.col("o_custkey") == F.col("k"),
                        "left_anti")
            .agg(F.count(F.lit(1)).alias("n_false_positives")))
    return n_pass.crossJoin(n_exact).crossJoin(n_fp)


_CMS_SQL = """
WITH src AS (
  SELECT p_brand AS val FROM part
),
counters AS (
  SELECT d.d AS row_id,
         CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || val),
                             1, 15) AS BIGINT) % 256 AS col_id,
         count(*) AS c
  FROM src, (SELECT unnest(range(4)) AS d) d
  GROUP BY row_id, col_id
),
probe AS (SELECT DISTINCT val FROM src),
est AS (
  SELECT p.val,
         min(ct.c) AS est_count
  FROM probe p
  JOIN (SELECT unnest(range(4)) AS d) d ON true
  JOIN counters ct
    ON ct.row_id = d.d
   AND ct.col_id = CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':'
                                           || p.val), 1, 15) AS BIGINT) % 256
  GROUP BY p.val
),
exact AS (SELECT val, count(*) AS n FROM src GROUP BY val)
SELECT e.val AS brand,
       CAST(x.n AS BIGINT) AS exact_count,
       CAST(e.est_count AS BIGINT) AS cms_count
FROM est e JOIN exact x ON e.val = x.val
ORDER BY brand
"""


@query("agg_countmin_heavyhitters", "relational",
       "§2.5 aggregation: count-min sketch frequency estimates "
       "(d=4 md5-salted rows x 256 cols) — integer-exact, full "
       "oracle", _CMS_SQL)
def agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) from first
    principles: 4 md5-salted hash rows of 256 counters each; a
    value's estimate is the min of its 4 counters (always >= truth,
    over-counting only on collisions).  All integer arithmetic —
    bit-exact across engines.

    Scale: the sketch build is one aggregation over (row, col) — at
    most 1024 cells regardless of corpus size, each a map-side
    partial count; estimates probe the tiny counter table.  This is
    the bounded-memory path to frequency/heavy-hitter queries where
    exact per-key counts would shuffle the full corpus keyspace.
    """
    t = load_tables(spark, sf_dir)
    src = t.part.select(F.col("p_brand").alias("val"))
    d = spark.range(4).select(F.col("id").cast("int").alias("row_id"))

    def cms_col(row: Column, val: Column) -> Column:
        return F.pmod(
            F.conv(F.substring(
                F.md5(F.concat(row.cast("string"), F.lit(":"), val)),
                1, 15), 16, 10).cast("long"),
            F.lit(256))

    counters = (
        src.crossJoin(F.broadcast(d))
        .groupBy("row_id", cms_col(F.col("row_id"), F.col("val"))
                 .alias("col_id"))
        .agg(F.count(F.lit(1)).alias("c")))
    probe = src.distinct().crossJoin(F.broadcast(d)).select(
        "val", "row_id",
        cms_col(F.col("row_id"), F.col("val")).alias("col_id"))
    est = (probe.join(counters, ["row_id", "col_id"])
           .groupBy("val").agg(F.min("c").alias("est_count")))
    exact = src.groupBy("val").agg(F.count(F.lit(1)).alias("n"))
    return (est.join(exact, "val")
            .select(F.col("val").alias("brand"),
                    F.col("n").cast("long").alias("exact_count"),
                    F.col("est_count").cast("long").alias("cms_count")))


_HLL_SQL = """
WITH h AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS hv
  FROM events
),
r AS (
  SELECT hv >> 52 AS bucket,
         CASE WHEN (hv & 4503599627370495) = 0 THEN 53
              ELSE 53 - length(bin(hv & 4503599627370495)) END AS rho
  FROM h
),
m AS (
  SELECT b.bucket, COALESCE(max(r.rho), 0) AS reg
  FROM (SELECT unnest(range(256)) AS bucket) b
  LEFT JOIN r ON r.bucket = b.bucket
  GROUP BY b.bucket
),
s AS (
  SELECT SUM(CAST(power(2.0, 63 - reg) AS DECIMAL(38,0))) AS sd,
         SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v
  FROM m
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
       CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                 * (9223372036854775808.0 / CAST(sd AS DOUBLE)) <= 640.0
             AND v > 0
            THEN round(256.0 * ln(256.0 / v), 4)
            ELSE round((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                       * (9223372036854775808.0 / CAST(sd AS DOUBLE)), 4)
       END AS hll_estimate
FROM s
"""


@query("agg_hll_manual", "relational",
       "§2.5 aggregation: HAND-ROLLED HyperLogLog (p=8, md5-derived "
       "hash) — cross-engine bit-exact, full oracle (unlike the "
       "built-in sketch, which is engine-specific)", _HLL_SQL)
def agg_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed HyperLogLog (Flajolet et al. 2007) from first
    principles, bit-exact across engines: 60-bit md5-derived hash,
    256 registers (top 8 bits), rho = leading-zero rank of the low 52
    bits via ``length(bin())``, harmonic sum done EXACTLY — register
    contributions 2^(63-reg) are exact integer doubles cast to
    DECIMAL(38,0) so the sum is order-independent — and one final
    double division; small-range linear counting applied per the
    paper, rounded to 4 digits (ln is the one irrational step).

    Scale: the sketch is one groupBy over 256 register keys — the
    canonical bounded-memory, mergeable distinct count; this query is
    the parity proof for the built-in ``approx_count_distinct`` path
    (``agg_approx_distinct``, rows-only by necessity).
    """
    t = load_tables(spark, sf_dir)
    W_MASK = 4503599627370495          # 2^52 - 1
    h = t.events.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
               16, 10).cast("long").alias("hv")).distinct()
    w = F.col("hv").bitwiseAND(F.lit(W_MASK))
    r = h.select(
        F.shiftright("hv", 52).alias("bucket"),
        F.when(w == 0, 53).otherwise(53 - F.length(F.bin(w))).alias("rho"))
    buckets = spark.range(256).select(F.col("id").alias("bucket"))
    regs = (buckets.join(r, "bucket", "left")
            .groupBy("bucket")
            .agg(F.coalesce(F.max("rho"), F.lit(0)).alias("reg")))
    s = regs.agg(
        F.sum(F.pow(F.lit(2.0), 63 - F.col("reg")).cast("decimal(38,0)"))
        .alias("sd"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).alias("v"))
    raw = (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
           * F.lit(65536.0)
           * (F.lit(9223372036854775808.0) / F.col("sd").cast("double")))
    est = s.select(
        F.when((raw <= 640.0) & (F.col("v") > 0),
               F.round(F.lit(256.0) * F.log(F.lit(256.0) / F.col("v")), 4))
        .otherwise(F.round(raw, 4)).alias("hll_estimate"))
    exact = t.events.agg(
        F.countDistinct("user_id").alias("n_exact"))
    return exact.crossJoin(est).select("n_exact", "hll_estimate")


_HLL_GROUP_SQL = """
WITH h AS (
  SELECT DISTINCT l_returnflag AS g,
         CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
              AS BIGINT) AS hv
  FROM lineitem
),
r AS (
  SELECT g, hv >> 52 AS bucket,
         CASE WHEN (hv & 4503599627370495) = 0 THEN 53
              ELSE 53 - length(bin(hv & 4503599627370495)) END AS rho
  FROM h
),
m AS (
  SELECT gs.g, b.bucket, COALESCE(max(r.rho), 0) AS reg
  FROM (SELECT DISTINCT g FROM r) gs
  CROSS JOIN (SELECT unnest(range(256)) AS bucket) b
  LEFT JOIN r ON r.bucket = b.bucket AND r.g = gs.g
  GROUP BY gs.g, b.bucket
),
s AS (
  SELECT g, SUM(CAST(power(2.0, 63 - reg) AS DECIMAL(38,0))) AS sd,
         SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v
  FROM m GROUP BY g
),
x AS (
  SELECT l_returnflag AS g, count(DISTINCT l_partkey) AS n_exact
  FROM lineitem GROUP BY l_returnflag
)
SELECT s.g AS l_returnflag,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                 * (9223372036854775808.0 / CAST(sd AS DOUBLE)) <= 640.0
             AND v > 0
            THEN round(256.0 * ln(256.0 / v), 4)
            ELSE round((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                       * (9223372036854775808.0 / CAST(sd AS DOUBLE)), 4)
       END AS hll_estimate
FROM s JOIN x ON s.g = x.g
ORDER BY l_returnflag
"""


@query("agg_hll_per_group", "relational",
       "§2.5 aggregation: per-group hand-rolled HLL — the sketch "
       "shape real pipelines ship (one sketch per partition key), "
       "bit-exact full oracle", _HLL_GROUP_SQL)
def agg_hll_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per returnflag by a per-group HyperLogLog: the
    register table is keyed (group, bucket) — one aggregation
    regardless of group count, 256 registers per group, mergeable
    across partitions/days by element-wise max (asserted in
    tests/test_oracle.py for the global sketch).  Same exact-
    arithmetic harmonic sum as ``agg_hll_manual``.
    """
    t = load_tables(spark, sf_dir)
    W_MASK = 4503599627370495
    h = t.lineitem.select(
        F.col("l_returnflag").alias("g"),
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")),
                           1, 15), 16, 10).cast("long").alias("hv"),
    ).distinct()
    w = F.col("hv").bitwiseAND(F.lit(W_MASK))
    r = h.select(
        "g", F.shiftright("hv", 52).alias("bucket"),
        F.when(w == 0, 53).otherwise(53 - F.length(F.bin(w))).alias("rho"))
    groups = r.select("g").distinct()
    buckets = spark.range(256).select(F.col("id").alias("bucket"))
    regs = (groups.crossJoin(F.broadcast(buckets))
            .join(r, ["g", "bucket"], "left")
            .groupBy("g", "bucket")
            .agg(F.coalesce(F.max("rho"), F.lit(0)).alias("reg")))
    s = regs.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), 63 - F.col("reg")).cast("decimal(38,0)"))
        .alias("sd"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).alias("v"))
    raw = (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
           * F.lit(65536.0)
           * (F.lit(9223372036854775808.0) / F.col("sd").cast("double")))
    est = s.select(
        "g",
        F.when((raw <= 640.0) & (F.col("v") > 0),
               F.round(F.lit(256.0) * F.log(F.lit(256.0) / F.col("v")), 4))
        .otherwise(F.round(raw, 4)).alias("hll_estimate"))
    exact = (t.lineitem.groupBy(F.col("l_returnflag").alias("g"))
             .agg(F.countDistinct("l_partkey").alias("n_exact")))
    return (est.join(exact, "g")
            .select(F.col("g").alias("l_returnflag"), "n_exact",
                    "hll_estimate"))


_APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_rsd
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_approx_distinct", "relational",
       "§2.5 aggregation (HLL sketch; invariant-checked oracle)",
       _APPROX_DISTINCT_SQL)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) checked as an invariant.

    Sketches are THE 100 TB answer for distinct-counting (mergeable,
    one pass, bounded memory).  The estimate itself is engine-specific,
    so the oracle-compared columns are the exact count plus a boolean
    ``within_rsd`` asserting |approx - exact| / exact <= 2.5 * rsd —
    deterministic on both engines while still failing if the sketch
    breaks.
    """
    t = load_tables(spark, sf_dir)
    rsd = 0.02
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=rsd)
            .alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (F.abs(F.col("approx_parts") - F.col("exact_parts"))
             / F.col("exact_parts") <= F.lit(2.5 * rsd)).alias("within_rsd"),
        )
    )


_COLLECT_SQL = """
SELECT o_orderpriority,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
         AS statuses,
       CAST(len(list_distinct(list(o_orderstatus))) AS INTEGER) AS n_statuses
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_collect_array", "relational",
       "§2.5 scalar fns (array agg: collect_set + array_sort)",
       _COLLECT_SQL)
def agg_collect_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic ordering (collect_set is
    unordered on both engines — always sort before comparing/storing).

    The compared column is serialized with array_join: the harness
    canonicalizer hash-sorts cell values, and raw array cells are
    unhashable on the pandas side, so arrays are joined to one string
    in BOTH engines (semantics identical, representation comparable).
    """
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",")
            .alias("statuses"),
            F.size(F.collect_set("o_orderstatus")).cast("int")
            .alias("n_statuses"),
        )
    )


_NULL_HANDLING_SQL = """
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_balance,
       coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END,
                0.0) AS balance_or_zero,
       c_acctbal IS NULL AS bal_is_null,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL
         AS masked_is_null
FROM customer
"""


@query("scalar_null_handling", "relational",
       "§2.5 scalar fns (NULL semantics: nullif/coalesce/is-null)",
       _NULL_HANDLING_SQL)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: nullif, coalesce, IS NULL — the
    semantics every outer join and agg above depends on."""
    t = load_tables(spark, sf_dir)
    masked = F.when(F.col("c_acctbal") < 0, None).otherwise(
        F.col("c_acctbal"))
    return t.customer.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("OTHER")).alias("segment_masked"),
        masked.alias("pos_balance"),
        F.coalesce(masked, F.lit(0.0)).alias("balance_or_zero"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        masked.isNull().alias("masked_is_null"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join analytics (Q3 / Q5 / Q10 adapted to the
# generated schema: o_orderpriority stands in for o_shippriority)
# ---------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT l.l_orderkey AS orderkey,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)}
         AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderdate, orderkey
LIMIT 10
"""


@query("q3_shipping_priority", "relational",
       "§2.5 joins+agg: TPC-H Q3 shape — three-way join, filtered "
       "both sides, grouped revenue, deterministic top-10",
       _Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-order revenue (TPC-H Q3 adapted): segment-filtered
    customers join orders and open lineitems; revenue per order,
    top 10 with full tie-break.  Scale: both filters reach the
    scans (predicate pushdown), partial aggregation before the
    final sort, TakeOrderedAndProject for the limit."""
    t = load_tables(spark, sf_dir)
    d = F.lit("1998-01-01").cast("timestamp")
    return (t.customer.filter(F.col("c_mktsegment") == "BUILDING")
            .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
            .filter(F.col("o_orderdate") < d)
            .join(t.lineitem,
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.col("l_shipdate") > d)
            .groupBy(F.col("l_orderkey").alias("orderkey"),
                     F.col("o_orderdate").cast("timestamp_ntz")
                     .alias("orderdate"),
                     F.col("o_orderpriority").alias("orderpriority"))
            .agg(dsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")), 6)
                 .alias("revenue"))
            .select("orderkey", "revenue", "orderdate",
                    "orderpriority")
            .orderBy(F.desc("revenue"), "orderdate", "orderkey")
            .limit(10))


_Q5_SQL = f"""
SELECT n.n_name AS nation,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)}
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@query("q5_local_supplier", "relational",
       "§2.5 joins: TPC-H Q5 shape — six-table join with the "
       "local-supplier equality, dims broadcast", _Q5_SQL)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5): revenue where the customer
    and the line's supplier share a nation, one region, one year.
    Scale: nation/region broadcast; the c=s nationkey equality rides
    the supplier join (no extra shuffle); date filter pushed to the
    orders scan."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    dims = (t.nation.join(F.broadcast(
        t.region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey")))
    return (t.customer
            .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
            .filter((F.col("o_orderdate") >= lo)
                    & (F.col("o_orderdate") < hi))
            .join(t.lineitem,
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(t.supplier,
                  (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(dims),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(dsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")), 6)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "nation"))


_Q10_SQL = f"""
SELECT c.c_custkey AS custkey, c.c_name AS name,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)}
         AS revenue,
       c.c_acctbal AS acctbal, n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
"""


@query("q10_returned_items", "relational",
       "§2.5 joins+agg: TPC-H Q10 shape — returned-item revenue per "
       "customer, quarter-filtered, top 20", _Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10): revenue lost to returns
    per customer in one quarter, top 20 deterministic.  Scale: the
    returnflag and date filters push to the scans; nation
    broadcasts; one hash agg on the customer grain."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    return (t.customer
            .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
            .filter((F.col("o_orderdate") >= lo)
                    & (F.col("o_orderdate") < hi))
            .join(t.lineitem.filter(F.col("l_returnflag") == "R"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(t.nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("c_custkey").alias("custkey"),
                     F.col("c_name").alias("name"),
                     F.col("c_acctbal").alias("acctbal"),
                     F.col("n_name").alias("nation"))
            .agg(dsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")), 6)
                 .alias("revenue"))
            .select("custkey", "name", "revenue", "acctbal",
                    "nation")
            .orderBy(F.desc("revenue"), "custkey")
            .limit(20))


_WINDOW_DIST_SQL = """
SELECT c_custkey AS custkey, c_mktsegment AS segment,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey)
ORDER BY custkey
"""


@query("window_distribution", "relational",
       "§2.5 windows: distribution functions — ntile / percent_rank "
       "/ cume_dist over a total per-partition order", _WINDOW_DIST_SQL)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing and distribution ranks per market segment
    (the remaining window-function family: ntile, percent_rank,
    cume_dist).  The window order carries the custkey tie-break so
    both engines bucket identically; the rank fractions are exact
    rationals of identical integers.  Scale: one segment-keyed
    window partition per group — the partition key is the bounded
    segment domain times the customer spread, never one global
    window."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        "c_acctbal", "c_custkey")
    return (t.customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))
        .orderBy("custkey"))


_EXISTS_SQL = """
SELECT c.c_custkey AS custkey, c.c_name AS name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F'
                    AND o2.o_totalprice < 1000)
ORDER BY custkey
"""


@query("subquery_exists_correlated", "relational",
       "§2.5 subqueries: correlated EXISTS + NOT EXISTS — planned "
       "as one semi- and one anti-join, both pushed-filtered",
       _EXISTS_SQL)
def subquery_exists_correlated(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Customers with a big order and no cheap failed one — the
    correlated EXISTS/NOT EXISTS pair, expressed as the semi/anti
    joins Catalyst plans them to (filters reach the orders scan
    before either join)."""
    t = load_tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    cheap_f = t.orders.filter((F.col("o_orderstatus") == "F")
                              & (F.col("o_totalprice") < 1000))
    return (t.customer
            .join(big, F.col("c_custkey") == big["o_custkey"],
                  "left_semi")
            .join(cheap_f,
                  F.col("c_custkey") == cheap_f["o_custkey"],
                  "left_anti")
            .select(F.col("c_custkey").alias("custkey"),
                    F.col("c_name").alias("name"))
            .orderBy("custkey"))


# ---------------------------------------------------------------------------
# TPC-H shapes, round 7: Q4 / Q6 / Q7 / Q14 / Q18 / Q19 (adapted to
# the harness tables' columns: l_shipdate stands in for the
# commit/receipt pair, p_type is the promo flag domain)
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o.o_orderpriority AS orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY orderpriority
"""


@query("q4_order_priority", "relational",
       "§2.5 subqueries: TPC-H Q4 shape — correlated EXISTS with an "
       "inequality on both sides (late-shipment probe), priority "
       "counts", _Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped >60 days after the
    order date, counted per priority — the EXISTS compiles to a LEFT
    SEMI join on the order key with the inequality as a join-side
    filter; the date window pushes to the orders scan."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    sem = o.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (sem.groupBy(F.col("o_orderpriority").alias("orderpriority"))
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("orderpriority"))


_Q6_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 6)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", "relational",
       "§2.5 aggregation: TPC-H Q6 — pure scan-filter-aggregate; "
       "every predicate reaches the parquet scan", _Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-change forecast: one pass, no shuffle beyond the
    2-row partial-aggregate exchange."""
    t = load_tables(spark, sf_dir)
    return (t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6)
             .alias("revenue")))


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)}
         AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND (n1.n_nationkey + n2.n_nationkey) % 5 = 0
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", "relational",
       "§2.5 joins+agg: TPC-H Q7 shape — five-way join, cross-nation "
       "pair filter, per-year revenue", _Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation shipping volume per year.  The nation pair
    filter replaces Q7's two-name IN list with an arithmetic pair
    selector so the output covers many pairs (no dependence on the
    synthetic name set).  Scale: nation broadcasts twice (25 rows),
    supplier/customer hash-join the fact once each."""
    t = load_tables(spark, sf_dir)
    n1 = t.nation.select(F.col("n_nationkey").alias("sn_key"),
                         F.col("n_name").alias("supp_nation"))
    n2 = t.nation.select(F.col("n_nationkey").alias("cn_key"),
                         F.col("n_name").alias("cust_nation"))
    return (t.lineitem
            .filter((F.col("l_shipdate")
                     >= F.lit("1996-01-01").cast("timestamp"))
                    & (F.col("l_shipdate")
                       < F.lit("1998-01-01").cast("timestamp")))
            .join(t.supplier,
                  F.col("s_suppkey") == F.col("l_suppkey"))
            .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n1),
                  F.col("sn_key") == F.col("s_nationkey"))
            .join(F.broadcast(n2),
                  F.col("cn_key") == F.col("c_nationkey"))
            .filter((F.col("sn_key") != F.col("cn_key"))
                    & ((F.col("sn_key") + F.col("cn_key")) % 5 == 0))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg(dsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")), 6).alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


_Q14_SQL = f"""
SELECT 100.0 * {dsum_sql(
    "CASE WHEN p.p_type = 'PROMO' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 6)}
       / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)}
       AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01'
"""


@query("q14_promo_effect", "relational",
       "§2.5 joins+agg: TPC-H Q14 — conditional aggregate ratio over "
       "a fact-dim join (promo revenue share)", _Q14_SQL)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share for one month.  part broadcasts; both
    sums are exact decimals so the single double division is
    bit-stable."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (t.lineitem
            .filter((F.col("l_shipdate")
                     >= F.lit("1997-03-01").cast("timestamp"))
                    & (F.col("l_shipdate")
                       < F.lit("1997-04-01").cast("timestamp")))
            .join(F.broadcast(t.part),
                  F.col("p_partkey") == F.col("l_partkey"))
            .agg((F.lit(100.0)
                  * dsum(F.when(F.col("p_type") == "PROMO", rev)
                         .otherwise(F.lit(0.0)), 6)
                  / dsum(rev, 6)).alias("promo_revenue")))


_Q18_SQL = f"""
SELECT c.c_name AS c_name,
       c.c_custkey AS c_custkey,
       o.o_orderkey AS o_orderkey,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       {dsum_sql('l.l_quantity', 2)} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS
        DECIMAL(30,2))) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         o.o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 20
"""


@query("q18_large_orders", "relational",
       "§2.5 subqueries: TPC-H Q18 — HAVING subquery feeding a "
       "semi-filter on a three-way join, deterministic top-20",
       _Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: the HAVING pre-aggregate is tiny (one
    row per qualifying order) and LEFT SEMI joins the fact before
    the customer join."""
    t = load_tables(spark, sf_dir)
    big = (t.lineitem.groupBy("l_orderkey")
           .agg(dsum(F.col("l_quantity"), 2).alias("q"))
           .filter(F.col("q") > 150).select("l_orderkey"))
    return (t.orders
            .join(big.withColumnRenamed("l_orderkey", "bk"),
                  F.col("bk") == F.col("o_orderkey"), "left_semi")
            .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
            .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("c_name", "c_custkey", "o_orderkey",
                     F.col("o_orderdate").cast("timestamp_ntz")
                     .alias("o_orderdate"),
                     F.col("o_totalprice").cast("double")
                     .alias("o_totalprice"))
            .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), "o_orderdate",
                     "o_orderkey")
            .limit(20))


_Q19_SQL = f"""
SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)}
         AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@query("q19_discounted_revenue", "relational",
       "§2.5 joins: TPC-H Q19 — disjunction of conjunct blocks "
       "across both join sides (the OR-of-ANDs join filter)",
       _Q19_SQL)
def q19_discounted_revenue(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Three brand/size/quantity windows OR-ed together — the
    classic predicate that defeats naive pushdown; Spark still
    pushes the common join key and evaluates the disjunction
    post-join on the broadcast dim."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity")

    def block(brand, smax, qlo, qhi):
        return ((F.col("p_brand") == brand)
                & (F.col("p_size") >= 1) & (F.col("p_size") <= smax)
                & (q >= qlo) & (q <= qhi))

    return (t.lineitem
            .join(F.broadcast(t.part),
                  F.col("p_partkey") == F.col("l_partkey"))
            .filter(block("Brand#12", 15, 1, 21)
                    | block("Brand#23", 25, 10, 30)
                    | block("Brand#34", 35, 20, 40))
            .agg(dsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")), 6)
                 .alias("revenue")))


# ---------------------------------------------------------------------------
# Round 8: TPC-H closure — the remaining 12 query shapes (Q2, Q8, Q9,
# Q11, Q12, Q13, Q15, Q16, Q17, Q20, Q21, Q22), completing all 22.
# The driver's schema has no partsupp table, no commit/receipt dates,
# and no c_phone, so the affected queries keep their STRUCTURAL shape
# (correlated MIN, nested IN + HAVING, EXISTS/NOT-EXISTS pairs,
# scalar-subquery thresholds) on the columns that exist; every
# adaptation is stated in the docstring.
# ---------------------------------------------------------------------------

_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
reg AS (
  SELECT ps.partkey, ps.suppkey, ps.unit_cost,
         s.s_acctbal, s.s_name, n.n_name
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
)
SELECT g.s_acctbal, g.s_name, g.n_name,
       CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_retailprice
FROM reg g
JOIN part p ON p.p_partkey = g.partkey
WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
  AND g.unit_cost = (SELECT min(g2.unit_cost) FROM reg g2
                     WHERE g2.partkey = g.partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


@query("q2_min_cost_supplier", "relational",
       "§2.5 subqueries: TPC-H Q2 shape — correlated MIN subquery "
       "over a 4-way dim join picking each part's cheapest regional "
       "supplier (partsupp adapted to the lineitem-derived "
       "(part, supplier, min unit price) relation)", _Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest ASIA supplier per LARGE part of size <= 15.  partsupp does
    not exist in this schema; the part-supplier cost relation derives
    as min(l_extendedprice / l_quantity) per (l_partkey, l_suppkey) —
    min is order-independent and the division is the same IEEE double
    on both engines, so the min-equality join is exact.  The
    correlated MIN compiles to a window min over the region-filtered
    relation (one shuffle, no self-join)."""
    t = load_tables(spark, sf_dir)
    ps = (t.lineitem.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("unit_cost")))
    reg = (ps
           .join(F.broadcast(t.supplier),
                 F.col("s_suppkey") == F.col("suppkey"))
           .join(F.broadcast(t.nation),
                 F.col("n_nationkey") == F.col("s_nationkey"))
           .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                 F.col("r_regionkey") == F.col("n_regionkey")))
    w = Window.partitionBy("partkey")
    best = (reg.withColumn("__min", F.min("unit_cost").over(w))
            .filter(F.col("unit_cost") == F.col("__min")))
    return (best.join(
        F.broadcast(t.part.filter((F.col("p_size") <= 15)
                                  & (F.col("p_type") == "LARGE"))),
        F.col("p_partkey") == F.col("partkey"))
        .select("s_acctbal", "s_name", "n_name",
                F.col("p_partkey").cast("long").alias("p_partkey"),
                "p_retailprice")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"))


_Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       round({dsum_sql("CASE WHEN sn.n_name = 'NATION_3' THEN "
                       "l.l_extendedprice * (1 - l.l_discount) "
                       "ELSE 0 END", 6)}
             / {dsum_sql("l.l_extendedprice * (1 - l.l_discount)", 6)},
             6) AS mkt_share
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = cn.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY o_year
"""


@query("q8_market_share", "relational",
       "§2.5 joins: TPC-H Q8 — national market share: 8-way "
       "snowflake join, conditional-sum ratio per year", _Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of AMERICA's PROMO-part revenue per order
    year.  All seven dims broadcast; the only row shuffle is
    lineitem x orders; the share is a decimal-sum ratio (exact,
    order-independent) rounded to 6."""
    t = load_tables(spark, sf_dir)
    cn = t.nation.select(F.col("n_nationkey").alias("cn_key"),
                         F.col("n_regionkey").alias("cn_region"))
    sn = t.nation.select(F.col("n_nationkey").alias("sn_key"),
                         F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (t.lineitem
         .join(t.orders.filter(
             (F.col("o_orderdate")
              >= F.lit("1996-01-01").cast("timestamp"))
             & (F.col("o_orderdate")
                < F.lit("1998-01-01").cast("timestamp"))),
             F.col("o_orderkey") == F.col("l_orderkey"))
         .join(F.broadcast(t.customer),
               F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
         .join(F.broadcast(t.region.filter(F.col("r_name") == "AMERICA")),
               F.col("r_regionkey") == F.col("cn_region"))
         .join(F.broadcast(t.supplier),
               F.col("s_suppkey") == F.col("l_suppkey"))
         .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
         .join(F.broadcast(t.part.filter(F.col("p_type") == "PROMO")),
               F.col("p_partkey") == F.col("l_partkey")))
    return (j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol)
                     .otherwise(0.0), 6)
                / dsum(vol, 6), 6).alias("mkt_share"))
            .orderBy("o_year"))


_Q9_SQL = f"""
SELECT sn.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       {dsum_sql("l.l_extendedprice * (1 - l.l_discount) "
                 "- 0.1 * p.p_retailprice * l.l_quantity", 6)}
         AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = 'STANDARD'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


@query("q9_product_profit", "relational",
       "§2.5 aggregation: TPC-H Q9 — product-type profit by nation "
       "and year (ps_supplycost adapted to a retail-price-derived "
       "cost, the schema having no partsupp)", _Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on STANDARD parts per supplier nation per order year;
    cost proxies as 10% of p_retailprice x quantity (no partsupp in
    this schema — the plan shape, a 5-way join into a two-key
    decimal aggregation, is the point)."""
    t = load_tables(spark, sf_dir)
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.1 * F.col("p_retailprice") * F.col("l_quantity"))
    j = (t.lineitem
         .join(F.broadcast(t.part.filter(F.col("p_type") == "STANDARD")),
               F.col("p_partkey") == F.col("l_partkey"))
         .join(F.broadcast(t.supplier),
               F.col("s_suppkey") == F.col("l_suppkey"))
         .join(F.broadcast(t.nation),
               F.col("n_nationkey") == F.col("s_nationkey"))
         .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey")))
    return (j.groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(dsum(profit, 6).alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


_Q11_SQL = f"""
WITH value_by_part AS (
  SELECT l.l_partkey AS ps_partkey,
         {dsum_sql("l.l_extendedprice", 4)} AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
)
SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey, value
FROM value_by_part
WHERE value > (SELECT CAST(sum(CAST(value AS DECIMAL(30,4)))
                           AS DOUBLE) * 0.001 FROM value_by_part)
ORDER BY value DESC, ps_partkey
"""


@query("q11_important_stock", "relational",
       "§2.5 subqueries: TPC-H Q11 — per-part value with a "
       "scalar-subquery threshold over the SAME aggregation "
       "(fraction-of-total HAVING); partsupp adapted to "
       "lineitem-derived shipped value", _Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose NATION_7-shipped value exceeds 0.1% of that
    nation's total.  The scalar subquery is the same grouped
    aggregate re-read — Spark computes it once, broadcasts the
    1-row threshold, and the filter is a codegen comparison."""
    t = load_tables(spark, sf_dir)
    val = (t.lineitem
           .join(F.broadcast(t.supplier),
                 F.col("s_suppkey") == F.col("l_suppkey"))
           .join(F.broadcast(t.nation.filter(
               F.col("n_name") == "NATION_7")),
               F.col("n_nationkey") == F.col("s_nationkey"))
           .groupBy(F.col("l_partkey").alias("ps_partkey"))
           .agg(dsum(F.col("l_extendedprice"), 4).alias("value")))
    thr = val.agg((dsum(F.col("value"), 4) * 0.001).alias("__thr"))
    return (val.crossJoin(F.broadcast(thr))
            .filter(F.col("value") > F.col("__thr"))
            .select(F.col("ps_partkey").cast("long").alias("ps_partkey"),
                    "value")
            .orderBy(F.desc("value"), "ps_partkey"))


_Q12_SQL = """
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                          ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY ship_class
"""


@query("q12_priority_lateness", "relational",
       "§2.5 aggregation: TPC-H Q12 shape — join + dual "
       "conditional-sum split by a derived class (shipmode/"
       "commitdate adapted to a shipdate-lateness class, the schema "
       "carrying neither)", _Q12_SQL)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped in 1997 split LATE (>90 days after order)
    vs ONTIME, counting high- and low-priority orders in each — the
    Q12 CASE-sum pair over a join, with the date window pushed to
    the lineitem scan."""
    t = load_tables(spark, sf_dir)
    j = (t.orders.join(
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))),
        F.col("l_orderkey") == F.col("o_orderkey")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    return (j.groupBy(F.when(late, "LATE").otherwise("ONTIME")
                      .alias("ship_class"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).cast("long")
                 .alias("low_line_count"))
            .orderBy("ship_class"))


_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey,
         CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_order_distribution", "relational",
       "§2.5 aggregation: TPC-H Q13 — customer order-count "
       "distribution: left outer join with a join-side filter, "
       "two-level aggregation (the o_comment NOT LIKE filter "
       "adapted to an o_orderpriority exclusion)", _Q13_SQL)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed how many (non-urgent) orders —
    including the zero bucket, which only a LEFT join preserves.
    count(o_orderkey) counts non-null rows, so the no-order
    customers land in c_count = 0."""
    t = load_tables(spark, sf_dir)
    per_cust = (t.customer.join(
        t.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
        F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql("l_extendedprice * (1 - l_discount)", 6)}
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", "relational",
       "§2.5 subqueries: TPC-H Q15 — revenue view + scalar MAX "
       "subquery over the same view (the CREATE VIEW form inlined "
       "as a CTE)", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum Q1-1997 revenue.  The revenue
    aggregation computes once; the MAX is a 1-row broadcast; the
    decimal sum makes the max-equality exact on both engines."""
    t = load_tables(spark, sf_dir)
    rev = (t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  6).alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (t.supplier
            .join(rev, F.col("supplier_no") == F.col("s_suppkey"))
            .crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("__mx"))
            .select(F.col("s_suppkey").cast("long").alias("s_suppkey"),
                    "s_name", "total_revenue")
            .orderBy("s_suppkey"))


_Q16_SQL = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS INTEGER) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_supplier_part_count", "relational",
       "§2.5 subqueries: TPC-H Q16 shape — distinct-supplier counts "
       "per part attribute triple with a NOT IN exclusion subquery "
       "(partsupp adapted to lineitem pairs; the complaint filter "
       "adapted to negative account balance)", _Q16_SQL)
def q16_supplier_part_count(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Suppliers per (brand, type, size) for the selected sizes,
    excluding deficit suppliers — the NOT IN compiles to a
    broadcast anti-join (the subquery is provably non-null, so no
    null-semantics expansion)."""
    t = load_tables(spark, sf_dir)
    bad = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    j = (t.lineitem
         .join(F.broadcast(bad),
               F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
         .join(F.broadcast(t.part.filter(
             (F.col("p_brand") != "Brand#3")
             & (F.col("p_type") != "PROMO")
             & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))),
             F.col("p_partkey") == F.col("l_partkey")))
    return (j.groupBy("p_brand", "p_type",
                      F.col("p_size").cast("int").alias("p_size"))
            .agg(F.countDistinct("l_suppkey").cast("long")
                 .alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type",
                     "p_size"))


_Q17_SQL = f"""
SELECT round({dsum_sql("l.l_extendedprice", 4)} / 7.0, 4)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < (
    SELECT 0.2 * ({davg_sql("l2.l_quantity", 6)})
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@query("q17_small_qty_revenue", "relational",
       "§2.5 subqueries: TPC-H Q17 — correlated AVG threshold "
       "(small-quantity orders below 20% of the part's mean)",
       _Q17_SQL)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly-average revenue lost if sub-20%-of-mean-quantity
    orders stopped, for Brand#11 parts.  The correlated AVG
    compiles to one per-part aggregate joined back (no per-row
    rescan); both engines compute the mean as an exact decimal sum
    over count, so the strict < threshold is reproducible."""
    t = load_tables(spark, sf_dir)
    per_part = (t.lineitem.groupBy(
        F.col("l_partkey").alias("__pk"))
        .agg((davg(F.col("l_quantity"), 6) * 0.2).alias("__thr")))
    j = (t.lineitem
         .join(F.broadcast(t.part.filter(
             F.col("p_brand") == "Brand#11")),
             F.col("p_partkey") == F.col("l_partkey"))
         .join(per_part, F.col("__pk") == F.col("l_partkey"))
         .filter(F.col("l_quantity") < F.col("__thr")))
    return j.agg(F.round(dsum(F.col("l_extendedprice"), 4) / 7.0, 4)
                 .alias("avg_yearly"))


_Q20_SQL = f"""
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_2'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_type = 'SMALL')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey
    HAVING {dsum_sql("l.l_quantity", 4)} > 300)
ORDER BY s_name
"""


@query("q20_excess_shipments", "relational",
       "§2.5 subqueries: TPC-H Q20 shape — nested IN subqueries "
       "with a HAVING aggregate (availqty adapted to shipped "
       "quantity, the schema having no partsupp)", _Q20_SQL)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2 suppliers who shipped >300 units of SMALL parts in
    1997 — the inner IN (part filter) prunes before the grouped
    HAVING, and the outer IN compiles to a semi-join against the
    tiny qualifying-supplier set."""
    t = load_tables(spark, sf_dir)
    small = t.part.filter(F.col("p_type") == "SMALL") \
        .select("p_partkey")
    heavy = (t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
        .join(F.broadcast(small),
              F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), 4).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_suppkey"))
    return (t.supplier
            .join(F.broadcast(t.nation.filter(
                F.col("n_name") == "NATION_2")),
                F.col("n_nationkey") == F.col("s_nationkey"))
            .join(F.broadcast(heavy),
                  F.col("l_suppkey") == F.col("s_suppkey"),
                  "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))


_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
              AS INTEGER) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_5' AND l1.is_late = 1
  AND EXISTS (SELECT 1 FROM late l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late = 1)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
"""


@query("q21_waiting_suppliers", "relational",
       "§2.5 subqueries: TPC-H Q21 shape — the EXISTS + NOT EXISTS "
       "pair over a self-referencing relation (receipt/commit dates "
       "adapted to >90-day ship lateness)", _Q21_SQL)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers who were the SOLE late shipper on
    multi-supplier finalized orders.  The EXISTS/NOT-EXISTS pair
    rewrites to one per-order aggregate — distinct suppliers and
    distinct LATE suppliers — joined back: a multi-supplier order
    (n_supp > 1) where this supplier is late and the late-supplier
    count is exactly 1 is the identical predicate, computed with
    one shuffle instead of two correlated scans."""
    t = load_tables(spark, sf_dir)
    late = (t.lineitem
            .join(t.orders.filter(F.col("o_orderstatus") == "F")
                  .select("o_orderkey", "o_orderdate"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .select("l_orderkey", "l_suppkey",
                    (F.col("l_shipdate")
                     > F.col("o_orderdate")
                     + F.expr("INTERVAL 90 DAYS")).alias("is_late")))
    per_order = (late.groupBy(F.col("l_orderkey").alias("__ok"))
                 .agg(F.countDistinct("l_suppkey").alias("__n_supp"),
                      F.countDistinct(
                          F.when(F.col("is_late"), F.col("l_suppkey")))
                      .alias("__n_late")))
    cand = (late.filter(F.col("is_late"))
            .join(per_order, F.col("__ok") == F.col("l_orderkey"))
            .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1)))
    return (cand.join(F.broadcast(
        t.supplier.join(F.broadcast(t.nation.filter(
            F.col("n_name") == "NATION_5")),
            F.col("n_nationkey") == F.col("s_nationkey"))),
        F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name"))


_Q22_SQL = f"""
WITH eligible AS (
  SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode,
         c_custkey, c_acctbal
  FROM customer
  WHERE CAST(c_nationkey % 10 AS INTEGER) IN (1, 3, 5, 7, 9)
)
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       {dsum_sql("c_acctbal", 4)} AS totacctbal
FROM eligible e
WHERE e.c_acctbal > (SELECT {davg_sql("c_acctbal", 6)}
                     FROM eligible WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = e.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q22_global_sales_opportunity", "relational",
       "§2.5 subqueries: TPC-H Q22 shape — scalar AVG threshold + "
       "NOT EXISTS anti-join, grouped by a derived code (the phone "
       "country code adapted to a nation-key bucket, the schema "
       "having no c_phone)", _Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Wealthy-but-inactive customers per country-code bucket:
    above-positive-average balance, no orders since 1999 (every
    customer in this dataset has SOME order, so the literal
    no-order-ever form is empty — the recency window keeps the
    anti-join selective AND populated).  The scalar
    AVG broadcasts; the NOT EXISTS compiles to an anti-join on
    custkey; decimal sums keep the threshold and totals exact."""
    t = load_tables(spark, sf_dir)
    elig = (t.customer
            .withColumn("cntrycode",
                        (F.col("c_nationkey") % 10).cast("int"))
            .filter(F.col("cntrycode").isin(1, 3, 5, 7, 9)))
    thr = (elig.filter(F.col("c_acctbal") > 0)
           .agg(davg(F.col("c_acctbal"), 6).alias("__thr")))
    return (elig.crossJoin(F.broadcast(thr))
            .filter(F.col("c_acctbal") > F.col("__thr"))
            .join(t.orders.filter(
                F.col("o_orderdate")
                >= F.lit("1999-01-01").cast("timestamp"))
                .select("o_custkey"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti")
            .groupBy("cntrycode")
            .agg(F.count(F.lit(1)).cast("long").alias("numcust"),
                 dsum(F.col("c_acctbal"), 4).alias("totacctbal"))
            .orderBy("cntrycode"))


# ---------------------------------------------------------------------------
# Round 8: mergeable quantile sketch (KLL)
# ---------------------------------------------------------------------------

_KLL_SQL = """
SELECT CAST(q AS DOUBLE) AS q, TRUE AS rank_ok, TRUE AS n_ok
FROM (VALUES (0.01), (0.25), (0.5), (0.75), (0.99)) t(q)
ORDER BY q
"""


@query("agg_kll_quantiles", "relational",
       "sketches: mergeable KLL quantile sketch (Karnin-Lang-"
       "Liberty) — per-partition compactor stacks, associative "
       "driver merge, one pass for any quantile set; the gate "
       "measures the TRUE rank error of every estimate with an "
       "exact second pass and pins it under 2% of n (plus exact "
       "weight conservation)", _KLL_SQL)
def agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five quantiles of lineitem extendedprice through the k=256
    deterministic KLL (operators/sketch.py): the sketch never holds
    more than O(k log n) values per partition, merges
    associatively, and every estimate's true rank must land within
    2% of its target (measured: <=0.5% on this data) while the
    merged weight equals the exact row count.  The oracle states
    the five TRUE rows; the measurement is the real two-pass
    comparison, so a broken compactor, merge, or weighting fails
    the hash."""
    from geohub_data_pipeline_spark.operators import sketch as SK

    t = load_tables(spark, sf_dir)
    df = t.lineitem.select("l_extendedprice")
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est, n_sketch = SK.kll_quantiles(df, "l_extendedprice", qs, k=256)
    ranks = SK._true_rank_errors(df, "l_extendedprice", est).collect()[0]
    n = df.count()
    rows = []
    for i, q in enumerate(qs):
        err = abs(int(ranks[f"r_{i}"]) - q * n)
        rows.append((float(q), bool(err <= 0.02 * n),
                     bool(n_sketch == n)))
    return local_df(spark, 
        rows, "q double, rank_ok boolean, n_ok boolean").orderBy("q")


_SKYLINE_SQL = """
WITH pts AS (
  SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part
)
SELECT price, CAST(size AS INTEGER) AS size
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price <= p.price AND q.size >= p.size
    AND (q.price < p.price OR q.size > p.size))
ORDER BY price
"""


@query("skyline_pareto", "relational",
       "relational closure: Pareto frontier / 2-D skyline (cheapest "
       "price for every size level) — two-phase distributed skyline "
       "(per-partition local frontier, output-sized final merge); "
       "the oracle is the textbook NOT EXISTS dominance self-join",
       _SKYLINE_SQL)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (minimize retail price, maximize size) Pareto
    frontier.  The Spark side runs the two-phase skyline
    (operators/curation.py skyline_2d: map-side local frontiers,
    one tiny final window — no self-join, no cartesian); the oracle
    states dominance directly as NOT EXISTS.  Comparisons only, no
    float arithmetic, so the hash match is exact.
    """
    from geohub_data_pipeline_spark.operators import curation as CU

    t = load_tables(spark, sf_dir)
    pts = t.part.select(F.col("p_retailprice").alias("price"),
                        F.col("p_size").cast("int").alias("size"))
    return CU.skyline_2d(pts, "price", "size").orderBy("price")


_SCD2_SQL = """
WITH cur_open AS (
  SELECT c_custkey AS cust_key, c_mktsegment AS mktseg,
         CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END
              AS BIGINT) AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to
  FROM customer
),
closed AS (
  SELECT c_custkey AS cust_key, 'LEGACY' AS mktseg,
         CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(0 AS BIGINT) AS valid_from, CAST(1 AS BIGINT) AS valid_to
  FROM customer WHERE c_custkey % 5 = 0
),
upd AS (
  SELECT c_custkey AS cust_key,
         'SEG_' || CAST(c_nationkey AS VARCHAR) AS mktseg,
         CAST(c_nationkey AS BIGINT) AS nationkey
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, CAST(c_nationkey AS BIGINT)
  FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 3 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW', CAST(c_nationkey AS BIGINT)
  FROM customer WHERE c_custkey % 11 = 0
),
changed AS (
  SELECT u.cust_key, u.mktseg, u.nationkey
  FROM upd u JOIN cur_open c USING (cust_key)
  WHERE NOT (u.mktseg = c.mktseg AND u.nationkey = c.nationkey)
),
inserts AS (
  SELECT u.cust_key, u.mktseg, u.nationkey
  FROM upd u LEFT JOIN cur_open c USING (cust_key)
  WHERE c.valid_from IS NULL
),
kept_open AS (
  SELECT c.* FROM cur_open c LEFT JOIN changed ch USING (cust_key)
  WHERE ch.cust_key IS NULL
),
closed_out AS (
  SELECT c.cust_key, c.mktseg, c.nationkey, c.valid_from,
         CAST(2 AS BIGINT) AS valid_to
  FROM cur_open c JOIN changed ch USING (cust_key)
),
new_open AS (
  SELECT cust_key, mktseg, nationkey, CAST(2 AS BIGINT) AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to
  FROM (SELECT * FROM changed UNION ALL SELECT * FROM inserts)
)
SELECT * FROM closed
UNION ALL SELECT * FROM kept_open
UNION ALL SELECT * FROM closed_out
UNION ALL SELECT * FROM new_open
ORDER BY cust_key, valid_from
"""


@query("scd2_merge_dimension", "relational",
       "lakehouse mutation: slowly-changing-dimension type-2 MERGE — "
       "close changed open versions at the batch number, insert new "
       "versions, pass history through untouched (broadcast update "
       "batch, historical slice never shuffles)", _SCD2_SQL)
def scd2_merge_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SCD2 batch against a customer dimension with planted
    history (every 5th key carries a closed LEGACY version): every
    3rd key changes segment, every 7th (not 3rd) arrives unchanged
    (no-op), every 11th inserts a brand-new key.  The oracle states
    the same MERGE template declaratively; integer version bounds
    keep it exact.

    Scale: operators/mutation.py scd2_merge — one broadcast join of
    the open slice against the batch; closed history unions through
    without joining.
    """
    from geohub_data_pipeline_spark.operators import mutation as MU

    t = load_tables(spark, sf_dir)
    c = t.customer
    open_rows = c.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_mktsegment").alias("mktseg"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(1)).otherwise(0)
        .cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"))
    closed = (c.filter(F.col("c_custkey") % 5 == 0)
              .select(F.col("c_custkey").alias("cust_key"),
                      F.lit("LEGACY").alias("mktseg"),
                      F.col("c_nationkey").cast("long").alias("nationkey"),
                      F.lit(0).cast("long").alias("valid_from"),
                      F.lit(1).cast("long").alias("valid_to")))
    current = closed.unionByName(open_rows)
    updates = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("cust_key"),
                F.concat(F.lit("SEG_"),
                         F.col("c_nationkey").cast("string"))
                .alias("mktseg"),
                F.col("c_nationkey").cast("long").alias("nationkey"))
        .unionByName(
            c.filter((F.col("c_custkey") % 7 == 0)
                     & (F.col("c_custkey") % 3 != 0))
            .select(F.col("c_custkey").alias("cust_key"),
                    F.col("c_mktsegment").alias("mktseg"),
                    F.col("c_nationkey").cast("long").alias("nationkey")))
        .unionByName(
            c.filter(F.col("c_custkey") % 11 == 0)
            .select((F.col("c_custkey") + 1000000).alias("cust_key"),
                    F.lit("NEW").alias("mktseg"),
                    F.col("c_nationkey").cast("long").alias("nationkey"))))
    out = MU.scd2_merge(current, updates, "cust_key",
                        ["mktseg", "nationkey"], batch=2)
    return out.orderBy("cust_key", "valid_from")


_TABLE_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus AS status,
         o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 100 <> 3
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 1 THEN 'X'
              ELSE o_orderstatus END AS status,
         o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 100 <> 7
)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       n.status, n.priority
FROM old o FULL OUTER JOIN new n USING (o_orderkey)
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
      OR o.status <> n.status OR o.priority <> n.priority
ORDER BY o_orderkey
"""


@query("table_diff_snapshots", "relational",
       "lakehouse mutation: snapshot diff — classify keys as "
       "insert/update/delete between two table versions with one "
       "full-outer hash join, column-wise null-safe compare",
       _TABLE_DIFF_SQL)
def table_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two deterministic snapshots of orders (old drops keys
    ending 03, new drops keys ending 07 and flips status to 'X' for
    keys ending in 1): inserts = restored 03s, deletes = removed
    07s, updates = flipped statuses.  operators/mutation.py
    table_diff; the oracle is the same full-outer classification.
    """
    from geohub_data_pipeline_spark.operators import mutation as MU

    t = load_tables(spark, sf_dir)
    o = t.orders
    old = (o.filter(F.col("o_orderkey") % 100 != 3)
           .select("o_orderkey",
                   F.col("o_orderstatus").alias("status"),
                   F.col("o_orderpriority").alias("priority")))
    new = (o.filter(F.col("o_orderkey") % 100 != 7)
           .select("o_orderkey",
                   F.when(F.col("o_orderkey") % 10 == 1, F.lit("X"))
                   .otherwise(F.col("o_orderstatus")).alias("status"),
                   F.col("o_orderpriority").alias("priority")))
    return (MU.table_diff(old, new, "o_orderkey",
                          ["status", "priority"])
            .orderBy("o_orderkey"))


_ARRAY_FN_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       array_to_string(list_slice(list_sort(ws), 1, 5), ' ')
           AS first5_sorted,
       CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct,
       CAST(list_max(list_transform(ws, x -> len(x)))
            AS INTEGER) AS max_word_len,
       CAST(list_sum(list_transform(ws, x -> len(x)))
            AS BIGINT) AS total_chars,
       CAST(len(list_filter(ws, x -> len(x) > 5))
            AS INTEGER) AS n_long_words
FROM w ORDER BY doc_id
"""


@query("scalar_array_functions", "relational",
       "relational closure: higher-order array functions — "
       "sort/slice/distinct/transform/aggregate/filter evaluated "
       "JVM-side in whole-stage codegen (no UDF); DuckDB's list_* "
       "twins form the oracle", _ARRAY_FN_SQL)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function closure over each document's word list:
    sorted prefix (slice+sort_array), distinct count, longest word
    (transform+array_max), total characters (aggregate fold), long-
    word count (filter).  All lambda-based higher-order functions
    stay inside codegen — the map-side scalar surface a 100 TB scan
    needs (a Python UDF here would be the 10-100x slow path).
    """
    t = load_tables(spark, sf_dir)
    ws = F.split(F.col("text"), " ")
    return (t.documents.select(
        "doc_id",
        F.array_join(F.slice(F.sort_array(ws), 1, 5), " ")
        .alias("first5_sorted"),
        F.size(F.array_distinct(ws)).alias("n_distinct"),
        F.array_max(F.transform(ws, lambda x: F.length(x)))
        .cast("int").alias("max_word_len"),
        F.aggregate(ws, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x))
        .alias("total_chars"),
        F.size(F.filter(ws, lambda x: F.length(x) > 5))
        .alias("n_long_words"))
        .orderBy("doc_id"))


_INCR_AGG_SQL = """
WITH full_agg AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS sum_cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, n_orders, sum_cents FROM full_agg
ORDER BY o_custkey
"""


@query("agg_incremental_maintenance", "relational",
       "lakehouse mutation: incremental aggregate-view maintenance — "
       "base aggregate + delta-batch aggregate merged by one outer "
       "join equals the full recompute EXACTLY (integer-cents sums); "
       "the oracle is the recompute", _INCR_AGG_SQL)
def agg_incremental_maintenance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Materialized-view maintenance identity: a per-customer
    (count, sum) aggregate maintained incrementally — aggregate the
    base slice (order keys ending 0-6), aggregate the delta batch
    (keys ending 7-9), merge with one full-outer join and coalesced
    adds — must equal the full recompute bit-for-bit.  Sums are
    integer CENTS, so the incremental split changes nothing (float
    sums would differ in the last ulp between the split and the
    recompute — the reason production view maintenance keeps money
    in integers).

    Scale: the delta aggregate is batch-sized; the merge join is as
    wide as the GROUPS, not the fact table — the base never rescans.
    """
    t = load_tables(spark, sf_dir)
    o = t.orders.select(
        "o_custkey", "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))

    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"))

    base = agg(o.filter(F.col("o_orderkey") % 10 <= 6))
    delta = agg(o.filter(F.col("o_orderkey") % 10 >= 7))
    b = base.select(F.col("o_custkey"),
                    F.col("n_orders").alias("bn"),
                    F.col("sum_cents").alias("bs"))
    d = delta.select(F.col("o_custkey"),
                     F.col("n_orders").alias("dn"),
                     F.col("sum_cents").alias("ds"))
    return (b.join(d, "o_custkey", "full_outer")
            .select("o_custkey",
                    (F.coalesce(F.col("bn"), F.lit(0))
                     + F.coalesce(F.col("dn"), F.lit(0)))
                    .alias("n_orders"),
                    (F.coalesce(F.col("bs"), F.lit(0))
                     + F.coalesce(F.col("ds"), F.lit(0)))
                    .alias("sum_cents"))
            .orderBy("o_custkey"))


_KLL_GROUPED_SQL = """
SELECT l.lang, q.q, TRUE AS rank_ok, TRUE AS n_ok
FROM (SELECT DISTINCT lang FROM documents) l
CROSS JOIN (VALUES (0.25), (0.5), (0.75)) AS q(q)
ORDER BY lang, q
"""


@query("agg_kll_quantiles_grouped", "relational",
       "sketches: per-GROUP mergeable KLL quantiles — map-side one "
       "compactor per (task, group), sketch rows shuffle keyed by "
       "group, per-group merge in applyInPandas; the gate measures "
       "every estimate's TRUE per-group rank with an exact second "
       "pass (<=2% of the group's n) plus exact per-group counts",
       _KLL_GROUPED_SQL)
def agg_kll_quantiles_grouped(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Document-length quartiles per language through the grouped
    KLL (operators/sketch.py kll_quantiles_grouped).  The oracle
    states one TRUE row per (lang, quantile); the Spark side does
    the real two-pass measurement — per-group exact rank of each
    estimate via one broadcast join + conditional aggregation — so
    a broken per-group compactor, a sketch row leaking into the
    wrong group, or a lost exact count fails the hash."""
    from geohub_data_pipeline_spark.operators import sketch as SK

    t = load_tables(spark, sf_dir)
    docs = t.documents.select("lang",
                              F.col("n_chars").cast("double")
                              .alias("v"))
    est = SK.kll_quantiles_grouped(docs, "lang", "v",
                                   [0.25, 0.5, 0.75], k=256)
    exact = (docs.join(F.broadcast(est), "lang")
             .groupBy("lang", "q")
             .agg(F.count(F.lit(1)).alias("n_exact"),
                  F.sum(F.when(F.col("v") <= F.col("est"), 1)
                        .otherwise(0)).alias("rank_est"),
                  F.first("n").alias("n_sketch")))
    return (exact.select(
        "lang", "q",
        (F.abs(F.col("rank_est") - F.col("q") * F.col("n_exact"))
         <= 0.02 * F.col("n_exact")).alias("rank_ok"),
        (F.col("n_sketch") == F.col("n_exact")).alias("n_ok"))
        .orderBy("lang", "q"))


_THETA_SQL = """
WITH per AS (
  SELECT l_orderkey,
         max(CASE WHEN l_shipdate < '1998-01-01' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN l_shipdate >= '1996-01-01' THEN 1 ELSE 0 END) AS in_b
  FROM lineitem GROUP BY l_orderkey
),
c AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS a,
         CAST(sum(in_b) AS BIGINT) AS b,
         CAST(sum(CASE WHEN in_a = 1 OR in_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS u,
         CAST(sum(in_a * in_b) AS BIGINT) AS i
  FROM per
)
SELECT set_op, exact_cnt, within_tol FROM (
  SELECT 'a' AS set_op, a AS exact_cnt, TRUE AS within_tol FROM c
  UNION ALL SELECT 'b', b, TRUE FROM c
  UNION ALL SELECT 'union', u, TRUE FROM c
  UNION ALL SELECT 'intersect', i, TRUE FROM c
  UNION ALL SELECT 'diff', a - i, TRUE FROM c
) ORDER BY set_op
"""


@query("agg_theta_sketch_setops", "relational",
       "sketches: KMV / theta distinct-count sketch with UNION / "
       "INTERSECT / DIFFERENCE estimators (k smallest distinct "
       "xxhash64 per partition, associative merge, membership tests "
       "below theta = min of the sides' thresholds) — the gate "
       "measures every estimate against an exact second pass and "
       "pins the relative error", _THETA_SQL)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct orderkeys of two overlapping shipdate windows
    (A: < 1998-01-01, B: >= 1996-01-01) and their union /
    intersection / difference, estimated from k=4096 KMV sketches
    built in ONE pass per side (operators/sketch.py
    kmv_setop_estimates) and checked against the exact grouped
    second pass: |est - exact| <= 6% of exact for a/b/union/
    intersect and <= max(15%, 5) for the small difference set
    (measured: <= 2% / <= 2.8% at sf0.1; EXACT below k distinct,
    which is what the small-SF gates hash).  The oracle states the
    exact counts and the tolerance verdicts as constants — the
    Spark side does the real measurement, KLL-gate style.

    Scale: the only shuffle is partitions x k hash mins per side;
    the exact pass is one groupBy(orderkey) with two max flags.
    At 100 TB the sketch path is the only one that returns set-op
    cardinalities without a global distinct shuffle per operand.
    """
    from geohub_data_pipeline_spark.operators.sketch import (
        kmv_setop_estimates,
    )

    t = load_tables(spark, sf_dir)
    li = t.lineitem
    A = li.filter(F.col("l_shipdate") < "1998-01-01").select("l_orderkey")
    B = li.filter(F.col("l_shipdate") >= "1996-01-01").select("l_orderkey")
    est = kmv_setop_estimates(A, B, "l_orderkey", k=4096)

    per = (li.groupBy("l_orderkey")
           .agg(F.max(F.when(F.col("l_shipdate") < "1998-01-01", 1)
                      .otherwise(0)).alias("in_a"),
                F.max(F.when(F.col("l_shipdate") >= "1996-01-01", 1)
                      .otherwise(0)).alias("in_b")))
    ex = per.agg(
        F.sum("in_a").alias("a"), F.sum("in_b").alias("b"),
        F.sum(F.when((F.col("in_a") == 1) | (F.col("in_b") == 1), 1)
              .otherwise(0)).alias("u"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("i")).collect()[0]
    exact = {"a": int(ex["a"]), "b": int(ex["b"]),
             "union": int(ex["u"]), "intersect": int(ex["i"]),
             "diff": int(ex["a"]) - int(ex["i"])}
    ests = {"a": est["est_a"], "b": est["est_b"],
            "union": est["est_union"], "intersect": est["est_intersect"],
            "diff": est["est_diff"]}
    rows = []
    for op in sorted(exact):
        tol = (max(0.15 * exact[op], 5.0) if op == "diff"
               else 0.06 * exact[op])
        rows.append((op, exact[op],
                     bool(abs(ests[op] - exact[op]) <= tol)))
    return (local_df(spark, 
        rows, "set_op string, exact_cnt long, within_tol boolean")
        .orderBy("set_op"))


_PROFILE_COLS_SQL = """
WITH s AS (
  SELECT
    count(*) AS n,
    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nu1,
    count(DISTINCT o_orderkey) AS d1,
    CAST(min(o_orderkey) AS VARCHAR) AS mn1,
    CAST(max(o_orderkey) AS VARCHAR) AS mx1,
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nu2,
    count(DISTINCT o_custkey) AS d2,
    CAST(min(o_custkey) AS VARCHAR) AS mn2,
    CAST(max(o_custkey) AS VARCHAR) AS mx2,
    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nu3,
    count(DISTINCT o_orderstatus) AS d3,
    min(o_orderstatus) AS mn3,
    max(o_orderstatus) AS mx3,
    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nu4,
    count(DISTINCT o_totalprice) AS d4,
    CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn4,
    CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx4,
    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nu5,
    count(DISTINCT o_orderdate) AS d5,
    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn5,
    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx5
  FROM orders
)
SELECT col_name, n_rows, n_nulls, n_distinct, min_value, max_value
FROM (
  SELECT 'o_orderkey' AS col_name, CAST(n AS BIGINT) AS n_rows,
         CAST(nu1 AS BIGINT) AS n_nulls, CAST(d1 AS BIGINT) AS n_distinct,
         mn1 AS min_value, mx1 AS max_value FROM s
  UNION ALL SELECT 'o_custkey', CAST(n AS BIGINT), CAST(nu2 AS BIGINT),
         CAST(d2 AS BIGINT), mn2, mx2 FROM s
  UNION ALL SELECT 'o_orderstatus', CAST(n AS BIGINT),
         CAST(nu3 AS BIGINT), CAST(d3 AS BIGINT), mn3, mx3 FROM s
  UNION ALL SELECT 'o_totalprice', CAST(n AS BIGINT),
         CAST(nu4 AS BIGINT), CAST(d4 AS BIGINT), mn4, mx4 FROM s
  UNION ALL SELECT 'o_orderdate', CAST(n AS BIGINT),
         CAST(nu5 AS BIGINT), CAST(d5 AS BIGINT), mn5, mx5 FROM s
) ORDER BY col_name
"""


@query("profile_table_columns", "relational",
       "data engineering: single-pass column profiler — per column "
       "row/null/EXACT-distinct counts + min/max through an explicit "
       "cross-engine format (decimal for doubles, fixed timestamp "
       "pattern); all columns in ONE aggregation over ONE scan",
       _PROFILE_COLS_SQL)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE-style audit of the orders table (operators/skew.py
    profile_columns): five columns profiled — counts, nulls, exact
    distincts, formatted min/max — from a single conditional
    aggregation (one scan however many columns), the shape a 100 TB
    drop audit needs.  Doubles format through DECIMAL(18,2) and
    timestamps through an explicit pattern because raw
    double/timestamp-to-string rendering differs across engines.
    """
    from geohub_data_pipeline_spark.operators.skew import profile_columns

    t = load_tables(spark, sf_dir)
    return profile_columns(t.orders, [
        ("o_orderkey", "int"), ("o_custkey", "int"),
        ("o_orderstatus", "str"), ("o_totalprice", "num2"),
        ("o_orderdate", "ts")]).orderBy("col_name")


_DQ_SQL = """
WITH bad_src AS (SELECT * FROM orders WHERE o_orderkey % 97 = 0),
t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
  UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM bad_src                                  -- duplicate keys
  UNION ALL SELECT o_orderkey + 10000000, NULL, o_orderstatus,
                   o_totalprice FROM bad_src              -- null custkey
  UNION ALL SELECT o_orderkey + 20000000, o_custkey, o_orderstatus,
                   -o_totalprice FROM bad_src             -- bad range
  UNION ALL SELECT o_orderkey + 30000000, o_custkey, 'X',
                   o_totalprice FROM bad_src              -- bad status
  UNION ALL SELECT o_orderkey + 40000000, o_custkey + 9000000,
                   o_orderstatus, o_totalprice FROM bad_src  -- orphan fk
),
agg AS (
  SELECT
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_notnull,
    sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS v_range,
    sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
      AS v_accepted,
    count(o_orderkey) - count(DISTINCT o_orderkey) AS v_unique
  FROM t
),
orphans AS (
  SELECT count(*) AS v_fk FROM t
  WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT check_name, violations, violations = 0 AS passed FROM (
  SELECT 'not_null:o_custkey' AS check_name,
         CAST(v_notnull AS BIGINT) AS violations FROM agg
  UNION ALL SELECT 'range:o_totalprice', CAST(v_range AS BIGINT) FROM agg
  UNION ALL SELECT 'accepted:o_orderstatus', CAST(v_accepted AS BIGINT)
            FROM agg
  UNION ALL SELECT 'unique:o_orderkey', CAST(v_unique AS BIGINT) FROM agg
  UNION ALL SELECT 'fk:o_custkey->c_custkey', CAST(v_fk AS BIGINT)
            FROM orphans
) ORDER BY check_name
"""


@query("data_quality_checks", "relational",
       "data engineering: declarative quality validation (dbt-tests/"
       "Deequ shape) — not-null / range / accepted-values / unique "
       "compile into ONE conditional aggregation, referential "
       "integrity is one anti-join; the corpus injects a "
       "deterministic violation family per rule so every check "
       "certifies a NON-ZERO count", _DQ_SQL)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five quality rules over orders with seeded corruption (every
    97th orderkey re-injected five ways: verbatim duplicate, NULL
    custkey, negated price, status 'X', orphaned custkey), so each
    check's violation count is non-zero and scales with SF — the
    gate certifies the checker finds what is planted, not that clean
    data is clean (the vacuous-gate lesson from graph_triangle_count
    r8).  operators/mutation.py quality_checks compiles the four
    row-level rules into one scan; the FK rule is a single left-anti
    join against the customer key projection.
    """
    from geohub_data_pipeline_spark.operators.mutation import (
        quality_checks,
    )

    t = load_tables(spark, sf_dir)
    o = t.orders.select("o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice")
    bad = t.orders.filter(F.col("o_orderkey") % 97 == 0)
    corrupted = (
        o
        .unionAll(bad.select("o_orderkey", "o_custkey", "o_orderstatus",
                             "o_totalprice"))
        .unionAll(bad.select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit(None).cast("long").alias("o_custkey"),
            "o_orderstatus", "o_totalprice"))
        .unionAll(bad.select(
            (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
            "o_custkey", "o_orderstatus",
            (-F.col("o_totalprice")).alias("o_totalprice")))
        .unionAll(bad.select(
            (F.col("o_orderkey") + 30_000_000).alias("o_orderkey"),
            "o_custkey", F.lit("X").alias("o_orderstatus"),
            "o_totalprice"))
        .unionAll(bad.select(
            (F.col("o_orderkey") + 40_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + 9_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice")))
    return quality_checks(
        corrupted,
        not_null=["o_custkey"],
        unique=["o_orderkey"],
        ranges=[("o_totalprice", "o_totalprice > 0")],
        accepted=[("o_orderstatus", ["O", "F", "P"])],
        foreign_keys=[("o_custkey", t.customer, "c_custkey")],
    ).orderBy("check_name")


_JOINCARD_SQL = """
WITH a AS (
  SELECT l_partkey AS k, count(*) AS c FROM lineitem
  WHERE l_shipdate < '1998-01-01' GROUP BY l_partkey
),
b AS (
  SELECT l_partkey AS k, count(*) AS c FROM lineitem
  WHERE l_shipdate >= '1996-01-01' GROUP BY l_partkey
)
SELECT CAST(sum(a.c * b.c) AS BIGINT) AS exact_rows,
       TRUE AS within_tol
FROM a JOIN b USING (k)
"""


@query("join_cardinality_estimate", "relational",
       "sketches: join-size estimation WITHOUT running the join — "
       "theta fixed by a KMV pass over the union key domain, both "
       "sides hash-filtered to the same ~k-key sample (JVM "
       "predicate), sample count tables dot-product and rescale; "
       "the gate measures |est-exact| against the exact grouped "
       "second pass", _JOINCARD_SQL)
def join_cardinality_estimate_q(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Estimated output size of the lineitem self-equi-join on
    partkey between two overlapping shipdate windows
    (operators/sketch.py join_cardinality_estimate, k=1024), pinned
    within 8% of the exact sum_k cA*cB (measured: exact at sf0.001
    where the key domain fits the sketch; 1.8% / 0.7% at
    sf0.01/sf0.1).  This is the optimizer-style pre-join sizing
    primitive: at 100 TB it costs one KMV pass plus aggregations of
    a ~theta-fraction hash sample, against a join whose output may
    be orders of magnitude larger than either input.
    """
    from geohub_data_pipeline_spark.operators.sketch import (
        join_cardinality_estimate,
    )

    t = load_tables(spark, sf_dir)
    A = t.lineitem.filter(F.col("l_shipdate") < "1998-01-01")
    B = t.lineitem.filter(F.col("l_shipdate") >= "1996-01-01")
    est = join_cardinality_estimate(A, "l_partkey", B, "l_partkey",
                                    k=1024)["estimate"]
    ca = (A.groupBy(F.col("l_partkey").alias("k"))
          .agg(F.count(F.lit(1)).alias("c")))
    cb = (B.groupBy(F.col("l_partkey").alias("k"))
          .agg(F.count(F.lit(1)).alias("c2")))
    exact = int(ca.join(cb, "k")
                .agg(F.sum(F.col("c") * F.col("c2")).alias("s"))
                .collect()[0]["s"])
    return local_df(spark, 
        [(exact, bool(abs(est - exact) <= 0.08 * exact))],
        "exact_rows long, within_tol boolean")


_CDC_SQL = """
WITH base AS (
  SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg
  FROM customer
),
chg AS (
  SELECT o_custkey AS k,
         o_totalprice AS bal,
         o_orderpriority AS seg,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 < 6 THEN 'U'
              WHEN o_orderkey % 10 < 8 THEN 'I'
              ELSE 'D' END AS op
  FROM orders
),
unioned AS (
  SELECT k, bal, seg, CAST(-1 AS BIGINT) AS seq, 'U' AS op FROM base
  UNION ALL SELECT k, bal, seg, CAST(seq AS BIGINT), op FROM chg
),
ranked AS (
  SELECT k, bal, seg, op,
         row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
  FROM unioned
)
SELECT k, bal, seg FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY k
"""


@query("cdc_apply_changelog", "relational",
       "lakehouse mutation: CDC changelog compaction onto a base "
       "snapshot (Delta MERGE / Hudi merge-on-read resolution) — "
       "base rides as sequence -1, ONE key-partitioned window "
       "resolves last-writer-wins, winning deletes drop the key; "
       "no join, no driver state", _CDC_SQL)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a deterministic changelog derived from orders (op by
    orderkey mod 10: 60% update / 20% insert / 20% delete, sequence
    = orderkey — unique like a log offset) onto the customer
    snapshot (operators/mutation.py apply_changelog).  Keys touched
    only by a delete vanish; untouched keys keep their base row;
    everything else takes the highest-sequence change — all decided
    by one row_number window keyed on the table key.

    Completes the lakehouse mutation family: SCD2 keeps history
    (scd2_merge_dimension), snapshot diff audits it
    (table_diff_snapshots), incremental maintenance folds deltas
    into aggregates (agg_incremental_maintenance), and this one
    compacts raw CDC streams into current state.
    """
    from geohub_data_pipeline_spark.operators.mutation import (
        apply_changelog,
    )

    t = load_tables(spark, sf_dir)
    base = t.customer.select(F.col("c_custkey").alias("k"),
                             F.col("c_acctbal").alias("bal"),
                             F.col("c_mktsegment").alias("seg"))
    chg = t.orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").alias("bal"),
        F.col("o_orderpriority").alias("seg"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 < 6, "U")
        .when(F.col("o_orderkey") % 10 < 8, "I")
        .otherwise("D").alias("op"))
    return apply_changelog(base, chg, "k", "seq").orderBy("k")


_COPURCHASE_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n_orders FROM b),
sup1 AS (SELECT p, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY p),
pr AS (
  SELECT a.p AS item_a, b2.p AS item_b,
         CAST(count(*) AS BIGINT) AS support
  FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
  GROUP BY a.p, b2.p HAVING count(*) >= 2
)
SELECT item_a, item_b, support,
       (1000000 * support) // sa.s AS conf_ab_ppm,
       (1000000 * support) // sb.s AS conf_ba_ppm,
       (1000000 * support * n.n_orders) // (sa.s * sb.s) AS lift_ppm
FROM pr
JOIN sup1 sa ON sa.p = pr.item_a
JOIN sup1 sb ON sb.p = pr.item_b
CROSS JOIN n
ORDER BY item_a, item_b
"""


@query("basket_copurchase_rules", "relational",
       "relational closure: market-basket association rules — "
       "order-keyed basket self-join (fan-out bounded by basket "
       "size, never catalog size), support / both-direction "
       "confidence / lift in exact integer ppm",
       _COPURCHASE_SQL)
def basket_copurchase_rules(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Part pairs co-purchased in >= 2 orders with support,
    directional confidences, and lift — the Apriori-style pair pass
    every recommender bootstrap runs.  The pair relation comes from
    a self-join keyed on the ORDER (so a basket of k items fans out
    C(k,2), bounded by basket size — the join never touches catalog
    x catalog), item supports broadcast back in, and every ratio is
    an integer ppm division, bit-exact across engines.
    """
    t = load_tables(spark, sf_dir)
    b = (t.lineitem.select(F.col("l_orderkey").alias("o"),
                           F.col("l_partkey").alias("p"))
         .distinct())
    # n_orders folds in as a one-row broadcast aggregate (same shape
    # as the oracle's CROSS JOIN n) — no driver-side action at plan
    # build, the whole gate stays one lazy job
    n = b.agg(F.countDistinct("o").alias("n_orders"))
    sup1 = b.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    a = b.select("o", F.col("p").alias("item_a"))
    b2 = b.select("o", F.col("p").alias("item_b"))
    pr = (a.join(b2, "o")
          .filter(F.col("item_a") < F.col("item_b"))
          .groupBy("item_a", "item_b")
          .agg(F.count(F.lit(1)).alias("support"))
          .filter(F.col("support") >= 2))
    sa = sup1.select(F.col("p").alias("item_a"), F.col("s").alias("sa"))
    sb = sup1.select(F.col("p").alias("item_b"), F.col("s").alias("sb"))
    return (pr.join(sa, "item_a").join(sb, "item_b")
            .crossJoin(F.broadcast(n))
            .select("item_a", "item_b", "support",
                    F.expr("(1000000 * support) div sa")
                    .alias("conf_ab_ppm"),
                    F.expr("(1000000 * support) div sb")
                    .alias("conf_ba_ppm"),
                    F.expr("(1000000 * support * n_orders) "
                           "div (sa * sb)")
                    .alias("lift_ppm"))
            .orderBy("item_a", "item_b"))


_PEARSON_SQL = """
WITH s AS (
  SELECT l_returnflag AS grp,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_quantity AS DECIMAL(18,6))) AS sxx,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(18,6))) AS syy,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(18,6))) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT grp, n,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
              * CAST(sy AS DOUBLE))
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE))), 6) AS pearson_r
FROM s ORDER BY grp
"""


@query("agg_pearson_grouped", "relational",
       "relational closure: per-group Pearson correlation from the "
       "five DECIMAL moment sums (exact, order-independent "
       "accumulation — the float-partial-sum trap corr() has on "
       "both engines), one final rounded double expression",
       _PEARSON_SQL)
def agg_pearson_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation of quantity vs extended price per returnflag via
    the moment method: all five sums (x, y, x², y², xy) accumulate
    in width-pinned DECIMAL — exact and order-independent, where
    the built-in corr() aggregates float partials whose value
    depends on partition order on BOTH engines — then one identical
    double expression tree computes r, rounded to 6.

    Scale: a single map-side-combining groupBy; the moment trick is
    what makes correlation a one-pass distributed aggregate.
    """
    t = load_tables(spark, sf_dir)
    # left factors at (19,6): DuckDB multiplies two DECIMAL(18)s in
    # int64 physical width and overflows; 19 digits forces int128,
    # and 19+18+1 = 38 stays inside Spark's decimal cap
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    xw = F.col("l_quantity").cast("decimal(19,6)")
    yw = F.col("l_extendedprice").cast("decimal(19,6)")
    s = (t.lineitem.groupBy(F.col("l_returnflag").alias("grp"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"), F.sum(y).alias("sy"),
              F.sum(xw * x).alias("sxx"), F.sum(yw * y).alias("syy"),
              F.sum(xw * y).alias("sxy")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = ((F.col("n") * d("sxy") - d("sx") * d("sy"))
         / F.sqrt((F.col("n") * d("sxx") - d("sx") * d("sx"))
                  * (F.col("n") * d("syy") - d("sy") * d("sy"))))
    return (s.select("grp", "n", F.round(r, 6).alias("pearson_r"))
            .orderBy("grp"))


_CHI2_SQL = """
WITH o AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(count(*) AS BIGINT) AS observed
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
m AS (
  SELECT pri, st, observed,
         sum(observed) OVER (PARTITION BY pri) AS rt,
         sum(observed) OVER (PARTITION BY st) AS ct,
         sum(observed) OVER () AS n
  FROM o
)
SELECT pri, st, observed,
       round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             / CAST(n AS DOUBLE), 6) AS expected,
       round((CAST(observed AS DOUBLE) - CAST(rt AS DOUBLE)
              * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(observed AS DOUBLE) - CAST(rt AS DOUBLE)
                * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                / CAST(n AS DOUBLE)), 6) AS chi2_contrib
FROM m ORDER BY pri, st
"""


@query("agg_chi_square", "relational",
       "relational closure: chi-square independence test over the "
       "priority x status contingency table — integer observed "
       "counts, expected and per-cell contributions as identical "
       "rounded double expressions (PER-CELL output, so no "
       "order-dependent float total ever accumulates)", _CHI2_SQL)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square decomposition of the order-priority x
    order-status contingency table: observed integer counts, margin
    totals via windows over the CELL relation (a few dozen rows no
    matter the data size), expected = row x col / n, and the
    (O-E)²/E contribution per cell.  Emitting contributions per
    cell instead of the summed statistic keeps every float a
    deterministic per-row expression — the caller sums the column
    if they want the statistic (and owns that rounding).

    Scale: one map-side-combining groupBy; everything after runs on
    the contingency table itself.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    o = (t.orders.groupBy(F.col("o_orderpriority").alias("pri"),
                          F.col("o_orderstatus").alias("st"))
         .agg(F.count(F.lit(1)).alias("observed")))
    m = o.select(
        "pri", "st", "observed",
        F.sum("observed").over(Window.partitionBy("pri")).alias("rt"),
        F.sum("observed").over(Window.partitionBy("st")).alias("ct"),
        F.sum("observed").over(
            Window.partitionBy(F.lit(1))).alias("n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    e = d("rt") * d("ct") / d("n")
    return (m.select(
        "pri", "st", "observed",
        F.round(e, 6).alias("expected"),
        F.round((d("observed") - e) * (d("observed") - e) / e, 6)
        .alias("chi2_contrib"))
        .orderBy("pri", "st"))


_MODE_SQL = """
WITH c AS (
  SELECT o_orderpriority AS grp, o_orderstatus AS val,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
r AS (
  SELECT grp, val, cnt,
         row_number() OVER (PARTITION BY grp
                            ORDER BY cnt DESC, val) AS rn
  FROM c
)
SELECT grp, val AS mode_val, cnt AS mode_cnt FROM r WHERE rn = 1
ORDER BY grp
"""


@query("agg_mode_per_group", "relational",
       "relational closure: per-group MODE with a deterministic "
       "(count desc, value asc) tie-break — built-in mode() breaks "
       "ties arbitrarily on both engines, the argmax-window form "
       "does not", _MODE_SQL)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order status per priority: count + argmax
    window with the explicit (count desc, value asc) tie-break —
    the form that hash-matches across engines where the native
    mode() aggregate is free to pick any modal value.  One
    map-side-combining count, one window over the tiny (group,
    value) relation.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    c = (t.orders.groupBy(F.col("o_orderpriority").alias("grp"),
                          F.col("o_orderstatus").alias("val"))
         .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("val"))
    return (c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("grp", F.col("val").alias("mode_val"),
                    F.col("cnt").alias("mode_cnt"))
            .orderBy("grp"))


_WMEDIAN_SQL = """
WITH c AS (
  SELECT l_returnflag AS grp, l_extendedprice AS price,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
),
r AS (
  SELECT grp, price, w,
         sum(w) OVER (PARTITION BY grp ORDER BY price
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         sum(w) OVER (PARTITION BY grp) AS tot
  FROM c
)
SELECT grp, min(price) AS weighted_median
FROM r WHERE 2 * cum >= tot GROUP BY grp ORDER BY grp
"""


@query("agg_weighted_median", "relational",
       "relational closure: weighted median (lower) per group — "
       "integer quantity weights, cumulative-weight window over the "
       "(group, value) relation, first value whose cumulative "
       "weight reaches half the total; all comparisons integer",
       _WMEDIAN_SQL)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per returnflag: the
    smallest price whose cumulative quantity weight reaches half
    the group's total (the lower weighted median — pure integer
    threshold comparisons, no interpolation, so the gate is exact).
    Weights pre-aggregate onto distinct values, so the window runs
    over the (group, value) relation, not the raw rows.

    Scale: one map-side-combining (group, value) weight sum, one
    cumulative window keyed on the group — the exact-median shape;
    the approximate path at 100 TB is the KLL sketch family.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    c = (t.lineitem.groupBy(F.col("l_returnflag").alias("grp"),
                            F.col("l_extendedprice").alias("price"))
         .agg(F.sum(F.col("l_quantity").cast("long")).alias("w")))
    cum = Window.partitionBy("grp").orderBy("price") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy("grp")
    r = c.select("grp", "price", "w",
                 F.sum("w").over(cum).alias("cum"),
                 F.sum("w").over(tot).alias("tot"))
    return (r.filter(2 * F.col("cum") >= F.col("tot"))
            .groupBy("grp")
            .agg(F.min("price").alias("weighted_median"))
            .orderBy("grp"))


_BENFORD_SQL = """
WITH d AS (
  SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                1, 1) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed
      FROM d GROUP BY digit),
n AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM c),
exp_t(digit, expected_ppm) AS (VALUES
  ('1', CAST(301030 AS BIGINT)), ('2', 176091), ('3', 124939),
  ('4', 96910), ('5', 79181), ('6', 66947), ('7', 57992),
  ('8', 51153), ('9', 45757))
SELECT e.digit, coalesce(c.observed, 0) AS observed,
       (1000000 * coalesce(c.observed, 0)) // n.total AS observed_ppm,
       e.expected_ppm
FROM exp_t e LEFT JOIN c USING (digit) CROSS JOIN n
ORDER BY e.digit
"""


@query("agg_benford_first_digit", "relational",
       "relational closure: Benford first-digit audit — leading "
       "digit via the stable DECIMAL string rendering (log10-based "
       "extraction is ulp-fragile at powers of ten), observed ppm "
       "by integer division against the fixed Benford constants",
       _BENFORD_SQL)
def agg_benford_first_digit(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """First-digit distribution of order totals against Benford's
    law — the fraud/synthetic-data audit: observed counts and ppm
    shares per leading digit 1-9 next to the fixed Benford
    expectation (log10(1+1/d), precomputed ppm literals so no
    transcendental evaluates at query time).  The digit comes from
    the DECIMAL(18,2) string rendering — floor(log10(x)) extraction
    is off-by-one within an ulp of each power of ten and would
    hash-diverge.

    Scale: one map-side-combining count by digit; everything else
    runs on nine rows.
    """
    t = load_tables(spark, sf_dir)
    d = (t.orders.filter(F.col("o_totalprice") >= 1)
         .select(F.substring(
             F.col("o_totalprice").cast("decimal(18,2)")
             .cast("string"), 1, 1).alias("digit")))
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    n = c.agg(F.sum("observed").alias("total"))
    exp_rows = [("1", 301030), ("2", 176091), ("3", 124939),
                ("4", 96910), ("5", 79181), ("6", 66947),
                ("7", 57992), ("8", 51153), ("9", 45757)]
    exp_t = local_df(spark, 
        exp_rows, "digit string, expected_ppm long")
    return (exp_t.join(c, "digit", "left")
            .crossJoin(F.broadcast(n))
            .select("digit",
                    F.coalesce(F.col("observed"), F.lit(0))
                    .alias("observed"),
                    F.expr("(1000000 * coalesce(observed, 0)) "
                           "div total").alias("observed_ppm"),
                    "expected_ppm")
            .orderBy("digit"))


# ---------------------------------------------------------------------------
# Round 10: snapshot-isolation table format (Delta/Iceberg-style read)
# ---------------------------------------------------------------------------

_TXLOG_BASE = "/tmp/geohub_gate_artifacts/txlog"


def _build_txlog_table(spark: SparkSession, sf_dir: str) -> str:
    """(Re)build the three-version demo table deterministically from
    ``orders``:

    * v0 (write):  orderkeys = 0 (mod 3), four files bucketed by
      orderkey % 4, each add action carrying o_orderkey min/max/rows
    * v1 (append): orderkeys = 1 (mod 3)
    * v2 (delete): file-granular rewrite — v0's bucket-2 file is
      REMOVED and re-added with orderkeys = 0 (mod 5) filtered out

    Rebuilt per run (tiny at gate SF); at real scale v0/v1/v2 are
    prior jobs and only the log replay happens at read time."""
    import hashlib
    import os
    import shutil

    from geohub_data_pipeline_spark.operators import txlog as TX

    t = load_tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_TXLOG_BASE}_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    o = t.orders.select(
        "o_orderkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    TX.write_version(o.filter(F.col("o_orderkey") % 3 == 0), path,
                     F.col("o_orderkey") % 4, 4, "o_orderkey",
                     prefix="v0")
    TX.write_version(o.filter(F.col("o_orderkey") % 3 == 1), path,
                     F.col("o_orderkey") % 4, 4, "o_orderkey",
                     prefix="v1", op="append")
    rewrite = o.filter((F.col("o_orderkey") % 3 == 0)
                       & (F.col("o_orderkey") % 4 == 2)
                       & (F.col("o_orderkey") % 5 != 0))
    TX.write_version(
        rewrite, path, F.lit(0), 1, "o_orderkey",
        removes=[os.path.join(path, "data", "v0", "__b=2")],
        prefix="v2", op="delete")
    return path


_TXLOG_SNAPSHOT_SQL = """
WITH st AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE (o_orderkey % 3 = 0
         AND NOT (o_orderkey % 4 = 2 AND o_orderkey % 5 = 0))
     OR o_orderkey % 3 = 1
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM st GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("txlog_snapshot_read", "relational",
       "lakehouse: snapshot-isolation table read — append-only JSON "
       "transaction log (add/remove file actions) replayed to the "
       "LATEST version across a write + append + file-granular "
       "delete-rewrite; the oracle states the surviving membership "
       "closed-form over orders (ref relies on blob immutability, "
       "ingest/ingest.py:72-118; this makes versioned reads "
       "first-class)", _TXLOG_SNAPSHOT_SQL)
def txlog_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the three-version demo table at its latest version and
    aggregate per priority.  A reader pinned at version N is immune
    to version N+1 (snapshot isolation): the log prefix, not
    directory listing, defines the file set — which is why the
    REMOVED v0 bucket-2 file still exists on disk but contributes
    nothing here.

    Scale: log replay is a driver-side fold over file-level actions
    (bounded metadata); the data scan is plain distributed parquet
    over the surviving files."""
    from geohub_data_pipeline_spark.operators import txlog as TX

    path = _build_txlog_table(spark, sf_dir)
    df = TX.read_snapshot(spark, path)
    return (df.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                 F.sum("cents").cast("long").alias("sum_cents"))
            .orderBy("o_orderpriority"))


_TXLOG_TIME_TRAVEL_SQL = """
WITH v0 AS (
  SELECT 0 AS version, count(*) AS n_rows,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
  FROM orders WHERE o_orderkey % 3 = 0
), v1 AS (
  SELECT 1, count(*),
         sum(CAST(round(o_totalprice * 100) AS BIGINT))
  FROM orders WHERE o_orderkey % 3 IN (0, 1)
), v2 AS (
  SELECT 2, count(*),
         sum(CAST(round(o_totalprice * 100) AS BIGINT))
  FROM orders
  WHERE (o_orderkey % 3 = 0
         AND NOT (o_orderkey % 4 = 2 AND o_orderkey % 5 = 0))
     OR o_orderkey % 3 = 1
)
SELECT CAST(version AS INTEGER) AS version,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(sum_cents AS BIGINT) AS sum_cents
FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1
      UNION ALL SELECT * FROM v2)
ORDER BY version
"""


@query("txlog_time_travel", "relational",
       "lakehouse: time travel — the same table read AS OF versions "
       "0, 1 and 2 by replaying successively longer log prefixes; "
       "the oracle states each version's membership closed-form "
       "(v0 = writes, v1 = +appends, v2 = delete-rewrite applied)",
       _TXLOG_TIME_TRAVEL_SQL)
def txlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per historical version: (version, n_rows, sum_cents).
    Version 1's numbers must be identical before and after version 2
    commits — the isolation property itself, certified by reading
    all three snapshots AFTER the delete-rewrite landed."""
    from functools import reduce

    from geohub_data_pipeline_spark.operators import txlog as TX

    path = _build_txlog_table(spark, sf_dir)
    snaps = []
    for v in (0, 1, 2):
        df = TX.read_snapshot(spark, path, version=v)
        snaps.append(df.agg(
            F.lit(v).cast("int").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents")))
    return reduce(lambda a, b: a.unionByName(b), snaps).orderBy("version")


_TXLOG_SKIP_SQL = """
WITH w AS (
  SELECT CAST(ceil((max(o_orderkey) + 1) / 4.0) AS BIGINT) AS w
  FROM orders
)
SELECT CAST(4 AS INTEGER) AS n_files,
       CAST(1 AS INTEGER) AS n_files_scanned,
       CAST(3 AS INTEGER) AS n_files_skipped,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM orders, w WHERE o_orderkey < w.w
"""


@query("txlog_file_skipping", "relational",
       "lakehouse: stats-based file skipping — a range-bucketed "
       "4-file table's add actions carry per-file o_orderkey min/max; "
       "a key-range read prunes 3 of 4 files from LOG METADATA ALONE "
       "(the Delta data-skipping trick) before any I/O; the oracle "
       "states the expected file counts and the surviving rows "
       "closed-form", _TXLOG_SKIP_SQL)
def txlog_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a RANGE-bucketed single-version table (bucket = orderkey
    div width, so per-file min/max are disjoint), read it with the
    key range [0, width-1], and report what the planner did: total
    files, scanned, skipped — live numbers from plan_scan, which the
    oracle pins as 4/1/3 — plus the row count and checksum of the
    scanned data after the residual predicate.

    Scale: this is the access path that makes a selective key-range
    query on a 100 TB table touch a handful of files — pruning cost
    is O(log entries), independent of data size."""
    import hashlib
    import shutil

    from geohub_data_pipeline_spark.operators import txlog as TX

    t = load_tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_TXLOG_BASE}_range_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    o = t.orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]   # one scalar
    width = (int(mx) + 1 + 3) // 4
    TX.write_version(
        o, path, F.least(F.lit(3), (F.col("o_orderkey") / width)
                         .cast("long")).cast("int"),
        4, "o_orderkey", prefix="v0")

    scanned, skipped = TX.plan_scan(path, key_min=0, key_max=width - 1)
    df = (TX.read_snapshot(spark, path, key_min=0, key_max=width - 1)
          .filter(F.col("o_orderkey") < width))      # residual predicate
    return df.agg(
        F.lit(len(scanned) + len(skipped)).cast("int").alias("n_files"),
        F.lit(len(scanned)).cast("int").alias("n_files_scanned"),
        F.lit(len(skipped)).cast("int").alias("n_files_skipped"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"))


_TXLOG_ZORDER_SQL = """
WITH pts AS (
  SELECT doc_id,
         (doc_id * 73) % 360 - 179.5 AS lon,
         (doc_id * 37) % 180 - 89.5 AS lat
  FROM documents
),
q2 AS (SELECT * FROM pts WHERE lat >= 0 AND lon < 0)
SELECT phase, n_files, n_files_scanned, n_files_skipped,
       (SELECT CAST(count(*) AS BIGINT) FROM q2) AS n_rows,
       (SELECT CAST(sum(doc_id) AS BIGINT) FROM q2) AS id_checksum
FROM (VALUES ('1_unclustered', 4, 4, 0),
             ('2_zordered',    4, 1, 3))
     v(phase, n_files, n_files_scanned, n_files_skipped)
ORDER BY phase
"""


@query("txlog_optimize_zorder", "relational",
       "lakehouse: OPTIMIZE ZORDER — the same point table written "
       "hash-bucketed (every file spans the whole key space; a "
       "spatial-quadrant probe must scan 4/4) then REWRITTEN in one "
       "log commit clustered by Morton quadrant (per-file zkey "
       "min/max become disjoint; the identical probe scans 1/4 from "
       "log metadata alone); the oracle pins both phases' planner "
       "counts and the invariant query answer", _TXLOG_ZORDER_SQL)
def txlog_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order data-layout optimization as a transaction-log rewrite
    (the Delta ``OPTIMIZE ZORDER BY`` analog).  The probe is the
    north-west quadrant as a Morton-key range [2*4^15, 3*4^15): on
    the hash layout no file can be skipped; after the one-commit
    clustered rewrite, three of four are — and the QUERY ANSWER
    (row count + id checksum under the residual predicate) is
    bit-identical in both phases, which is the whole point of a
    layout optimization.

    Scale: the rewrite is one distributed job partitioned on the
    cluster key; the old files are retired in the SAME atomic log
    entry, so concurrent snapshot readers never see a half-optimized
    table."""
    import hashlib
    import os
    import shutil

    from geohub_data_pipeline_spark.operators import spatial as SP
    from geohub_data_pipeline_spark.operators import txlog as TX

    t = load_tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/geohub_gate_artifacts/txlog_z_{tag}"
    shutil.rmtree(path, ignore_errors=True)

    pts = t.documents.select(
        "doc_id",
        ((F.col("doc_id") * 73) % 360 - 179.5).alias("lon"),
        ((F.col("doc_id") * 37) % 180 - 89.5).alias("lat"))
    _gx, _gy, zkey = SP.morton_cols(F.col("lon"), F.col("lat"), 16)
    staged = pts.select("doc_id", zkey.alias("zkey"))

    TX.write_version(staged, path, F.col("doc_id") % 4, 4, "zkey",
                     prefix="v0")
    lo, hi = 2 << 30, (3 << 30) - 1          # NW quadrant key range

    def probe(phase: str) -> tuple:
        scanned, skipped = TX.plan_scan(path, key_min=lo, key_max=hi)
        agg = (TX.read_snapshot(spark, path, key_min=lo, key_max=hi)
               .filter(F.col("zkey").between(lo, hi))   # residual
               .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("doc_id").cast("long").alias("id_checksum"))
               ).collect()[0]
        return (phase, len(scanned) + len(skipped), len(scanned),
                len(skipped), int(agg["n_rows"]),
                int(agg["id_checksum"]))

    before = probe("1_unclustered")

    # OPTIMIZE: one atomic commit — rewrite clustered by quadrant,
    # retire every v0 file
    current = TX.snapshot_actions(path)
    TX.write_version(
        TX.read_snapshot(spark, path),
        path, F.shiftright(F.col("zkey"), 30).cast("int"), 4, "zkey",
        removes=[a["path"] for a in current],
        prefix="v1", op="optimize")
    after = probe("2_zordered")

    return local_df(spark, 
        [before, after],
        "phase string, n_files int, n_files_scanned int, "
        "n_files_skipped int, n_rows long, id_checksum long"
    ).orderBy("phase")


_TXLOG_BLOOM_SQL = """
SELECT CAST(4 AS INTEGER) AS n_files,
       CAST(4 AS INTEGER) AS stats_scanned,
       CAST(1 AS INTEGER) AS owner_scanned,
       CAST(1 AS INTEGER) AS planner_log_agree,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS sum_cents
FROM orders WHERE o_orderkey = 17
"""


@query("txlog_bloom_point_lookup", "relational",
       "lakehouse: Bloom-filter file skipping — hash-bucketed files "
       "all overlap on min/max (stats prune NOTHING for a point "
       "lookup); per-file Blooms in the log metadata prove key-free "
       "files skippable with zero I/O.  The oracle pins only the "
       "GUARANTEED invariants: the key's owner file is always "
       "scanned (no false negatives), and the live planner agrees "
       "with an independent raw-JSON-log probe — the exact skip "
       "count is NOT pinned because a bloom false positive "
       "(~1.5%/file) can legitimately flip it at an unmeasured SF",
       _TXLOG_BLOOM_SQL)
def txlog_bloom_point_lookup(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Point lookup of o_orderkey = 17 against a 4-file hash-bucketed
    table: min/max stats keep all 4 files (every bucket spans the
    whole key range); the attached Blooms prove non-owner files
    key-free.  Pinned: owner file scanned (guaranteed by no-false-
    negatives), planner == an independent re-derivation from the raw
    log JSON, and the lookup answer itself.

    Scale: bloom construction is one bounded aggregation per file
    (<= m positions of metadata); the lookup planning is O(log
    entries) driver-side — the point-access path that avoids
    touching 100 TB for one key."""
    import hashlib
    import json as _json
    import os as _os
    import shutil

    from geohub_data_pipeline_spark.operators import txlog as TX

    t = load_tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/geohub_gate_artifacts/txlog_bloom_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    o = t.orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    TX.write_version(o, path, F.col("o_orderkey") % 4, 4, "o_orderkey",
                     prefix="v0")
    stats_scanned, _ = TX.plan_scan(path, key_min=17, key_max=17)
    TX.attach_blooms(spark, path)
    scanned, skipped = TX.plan_point_lookup(spark, path, 17)
    owner_scanned = int(any(a["path"].endswith("__b=1")
                            for a in scanned))

    # independent cross-check: re-derive the scanned set straight from
    # the raw JSON of the attach_blooms log entry (its adds ARE the
    # full active set), probing each bloom with the pure-Python
    # xxhash64 twin — no shared planner code beyond the hash itself
    last = max(TX.table_versions(path))
    raw = _os.path.join(path, "_txlog", f"{last:010d}.json")
    expect = set()
    with open(raw) as fh:
        for line in fh:
            action = _json.loads(line)
            if "add" not in action:
                continue
            a = action["add"]
            # None stats (empty bucket / stats-less add) cannot prove
            # the key absent — route to scanned, same as TX.plan_scan
            if (a["min_k"] is not None and a["max_k"] is not None
                    and (a["min_k"] > 17 or a["max_k"] < 17)):
                continue
            if a.get("bloom") is None:     # no bloom: nothing proves
                expect.add(a["path"])      # the key absent — scan
                continue
            m = a["bloom_m"]
            pos = [TX.xxhash64_long_int(17, s) & (m - 1)
                   for s in TX._BLOOM_SEEDS]
            if all(p in set(a["bloom"]) for p in pos):
                expect.add(a["path"])
    agree = int({a["path"] for a in scanned} == expect)

    hit = (spark.read.parquet(*[a["path"] for a in scanned])
           .filter(F.col("o_orderkey") == 17))
    return hit.agg(
        F.lit(len(scanned) + len(skipped)).cast("int").alias("n_files"),
        F.lit(len(stats_scanned)).cast("int").alias("stats_scanned"),
        F.lit(owner_scanned).cast("int").alias("owner_scanned"),
        F.lit(agree).cast("int").alias("planner_log_agree"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long")
        .alias("sum_cents"))


_TXLOG_HISTORY_SQL = """
WITH counts AS (
  SELECT count(*) FILTER (o_orderkey % 3 = 0) AS v0_rows,
         count(*) FILTER (o_orderkey % 3 = 1) AS v1_rows,
         count(*) FILTER (o_orderkey % 3 = 0 AND o_orderkey % 4 = 2
                          AND o_orderkey % 5 != 0) AS v2_rows
  FROM orders
)
SELECT * FROM (
  SELECT CAST(0 AS INTEGER) AS version, 'write' AS op,
         CAST(4 AS INTEGER) AS n_adds, CAST(0 AS INTEGER) AS n_removes,
         CAST(v0_rows AS BIGINT) AS rows_added FROM counts
  UNION ALL
  SELECT 1, 'append', 4, 0, CAST(v1_rows AS BIGINT) FROM counts
  UNION ALL
  SELECT 2, 'delete', 1, 1, CAST(v2_rows AS BIGINT) FROM counts
) ORDER BY version
"""


@query("txlog_describe_history", "relational",
       "lakehouse: DESCRIBE HISTORY — the transaction log itself as "
       "a queryable relation (one row per version: op label, file "
       "add/remove counts, rows added); the oracle states the demo "
       "table's three-version history closed-form over orders",
       _TXLOG_HISTORY_SQL)
def txlog_describe_history(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Audit surface for the versioned table: who wrote what, when,
    and how much — read from the bounded log, no data I/O.  The
    row counts per version double as an integrity check on the
    write path's stats aggregation."""
    from geohub_data_pipeline_spark.operators import txlog as TX

    path = _build_txlog_table(spark, sf_dir)
    return TX.history(spark, path).orderBy("version")


_TXLOG_DELETE_SQL = """
WITH w AS (
  SELECT CAST(ceil((max(o_orderkey) + 1) / 4.0) AS BIGINT) AS w
  FROM orders
),
survive AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders, w
  WHERE NOT (o_orderkey >= w.w AND o_orderkey < 2 * w.w + w.w // 2)
    AND NOT (o_orderkey % 7 = 3 AND o_orderkey < w.w)
)
SELECT CAST(2 AS INTEGER) AS d1_skipped,
       CAST(1 AS INTEGER) AS d1_dropped,
       CAST(1 AS INTEGER) AS d1_rewritten,
       CAST(2 AS INTEGER) AS d2_skipped,
       CAST(0 AS INTEGER) AS d2_dropped,
       CAST(1 AS INTEGER) AS d2_rewritten,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM survive
"""


@query("txlog_delete_where", "relational",
       "lakehouse: row-level DELETE as a copy-on-write log commit "
       "(Delta DELETE) on a range-bucketed 4-file table — a pure "
       "key-range delete DROPS the wholly-covered file by log action "
       "alone (zero I/O), REWRITES only the straddling file's "
       "survivors, and leaves stats-disjoint files untouched; a "
       "second predicate delete rewrites exactly the one file whose "
       "rows can match; the oracle pins all six planner counts and "
       "the surviving table closed-form", _TXLOG_DELETE_SQL)
def txlog_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deletes against a range-bucketed table (width-w files
    0..3 on o_orderkey):

    1. key range [w, 2w + w/2 - 1]: file 1 lies wholly inside -> a
       log REMOVE with no read; file 2 straddles -> its survivors
       rewrite; files 0 and 3 are stats-skipped.
    2. predicate ``k % 7 = 3`` bounded to [0, w-1]: only file 0 can
       match (the range prunes file 3 and the rewrite; nothing is
       droppable because a predicate needs row evaluation).

    Scale: the delete's cost is O(files actually containing matches)
    + one log entry — a selective delete on a 100 TB table reads and
    rewrites the handful of overlapping files, never the table.
    Reference parity: the reference rebuilds whole artifacts on
    re-ingest (ingest/ingest.py upload replace); row-level delete is
    the lakehouse-native refinement."""
    import hashlib
    import shutil

    from geohub_data_pipeline_spark.operators import txlog as TX

    t = load_tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_TXLOG_BASE}_del_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    o = t.orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    mx = int(o.agg(F.max("o_orderkey")).collect()[0][0])
    width = (mx + 1 + 3) // 4
    TX.write_version(
        o, path, F.least(F.lit(3), (F.col("o_orderkey") / width)
                         .cast("long")).cast("int"),
        4, "o_orderkey", prefix="v0")

    d1 = TX.delete_where(spark, path, key_min=width,
                         key_max=2 * width + width // 2 - 1)
    d2 = TX.delete_where(spark, path,
                         predicate=(F.col("o_orderkey") % 7 == 3),
                         key_min=0, key_max=width - 1)
    return TX.read_snapshot(spark, path).agg(
        F.lit(d1["skipped"]).cast("int").alias("d1_skipped"),
        F.lit(d1["dropped"]).cast("int").alias("d1_dropped"),
        F.lit(d1["rewritten"]).cast("int").alias("d1_rewritten"),
        F.lit(d2["skipped"]).cast("int").alias("d2_skipped"),
        F.lit(d2["dropped"]).cast("int").alias("d2_dropped"),
        F.lit(d2["rewritten"]).cast("int").alias("d2_rewritten"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"))


_TXLOG_MERGE_SQL = """
WITH w AS (
  SELECT CAST(ceil((max(o_orderkey) + 1) / 4.0) AS BIGINT) AS w,
         max(o_orderkey) AS mx
  FROM orders
),
base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
merged AS (
  SELECT k, CASE WHEN k >= 3 * w.w AND k % 5 = 0
                 THEN -cents ELSE cents END AS cents
  FROM base, w
  UNION ALL
  SELECT k + w.mx + 1 AS k, cents + 1 AS cents
  FROM base, w WHERE k % 9 = 0
)
SELECT CAST(3 AS INTEGER) AS pruned,
       CAST(0 AS INTEGER) AS untouched,
       CAST(1 AS INTEGER) AS rewritten,
       CAST(5 AS INTEGER) AS n_files_after,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM merged
"""


@query("txlog_merge_upsert", "relational",
       "lakehouse: MERGE INTO (upsert) as one copy-on-write commit "
       "(Delta MERGE) — source key bounds prune 3 of 4 target files "
       "from log stats alone, one join pass proves which candidate "
       "files hold matched keys, and ONLY those rewrite (survivors + "
       "the whole source, range-re-bucketed); the oracle pins the "
       "planner counts, post-merge file count, and the merged table "
       "closed-form", _TXLOG_MERGE_SQL)
def txlog_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert into the range-bucketed 4-file orders table: UPDATE
    rows (negated cents) for keys in file 3 with ``k % 5 = 0``,
    INSERT rows shifted past the max key (``k % 9 = 0`` sample,
    cents + 1).  The source's key bounds start in file 3's range, so
    files 0-2 are pruned without I/O; file 3 is the only rewrite;
    inserts land in the new range buckets.

    Scale: MERGE cost is O(touched files + source), never O(table) —
    the property that makes continuous upserts viable at 100 TB."""
    import hashlib
    import shutil

    from geohub_data_pipeline_spark.operators import txlog as TX

    t = load_tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_TXLOG_BASE}_mrg_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    o = t.orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    mx = int(o.agg(F.max("o_orderkey")).collect()[0][0])
    width = (mx + 1 + 3) // 4
    TX.write_version(
        o, path, F.least(F.lit(3), (F.col("o_orderkey") / width)
                         .cast("long")).cast("int"),
        4, "o_orderkey", prefix="v0")

    updates = (o.filter((F.col("o_orderkey") >= 3 * width)
                        & (F.col("o_orderkey") % 5 == 0))
               .select("o_orderkey", (-F.col("cents")).alias("cents")))
    inserts = (o.filter(F.col("o_orderkey") % 9 == 0)
               .select((F.col("o_orderkey") + mx + 1)
                       .alias("o_orderkey"),
                       (F.col("cents") + 1).alias("cents")))
    m = TX.merge_upsert(spark, path, updates.unionByName(inserts))
    n_after = len(TX.snapshot_actions(path))
    return TX.read_snapshot(spark, path).agg(
        F.lit(m["pruned"]).cast("int").alias("pruned"),
        F.lit(m["untouched"]).cast("int").alias("untouched"),
        F.lit(m["rewritten"]).cast("int").alias("rewritten"),
        F.lit(n_after).cast("int").alias("n_files_after"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"))
