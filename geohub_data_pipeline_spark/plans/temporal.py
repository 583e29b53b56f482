"""Event-time / temporal operators (SURVEY.md §2.4 X8 + §2.5).

The reference has no event-time semantics (X8: "no windows, no
watermarks") — these cover the harness' ``events`` capability in batch
form; the streaming (watermarked) versions of the same operators live
in streaming/windows.py and are exercised by tests/test_streaming.py
(batch/stream parity: identical window semantics by construction).

Oracle-parity notes: events.ts is nanosecond parquet, truncated to µs
identically by both engines (sources/tables.py); window starts are
computed with epoch-µs integer arithmetic in the oracle to match
Spark's epoch-aligned windows; session boundaries use the half-open
``[start, last + gap)`` rule Spark's session_window implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geohub_data_pipeline_spark.plans.registry import query
from geohub_data_pipeline_spark.plans._util import dsum, dsum_sql, load_tables
from geohub_data_pipeline_spark.operators.asof import asof_join

# ---------------------------------------------------------------------------
# Tumbling window
# ---------------------------------------------------------------------------

_TUMBLING_SQL = f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       count(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@query("events_tumbling_window", "temporal",
       "§2.4 X8 event-time tumbling window", _TUMBLING_SQL)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling aggregation per event type.

    Scale: a tumbling window is just a derived grouping key — plain
    partial+final hash agg, one shuffle keyed (hour, type).  The
    streaming twin adds withWatermark and emits identical windows.
    """
    t = load_tables(spark, sf_dir)
    return (
        t.events
        .groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
            .alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum(F.col("value")).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# Sliding window
# ---------------------------------------------------------------------------

_SLIDING_SQL = f"""
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events
),
x AS (
  SELECT make_timestamp(us - us % 1800000000 - k.k * 1800000000) AS window_start,
         value
  FROM e, (SELECT unnest([0, 1]) AS k) k
)
SELECT window_start,
       CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
       count(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM x
GROUP BY window_start
ORDER BY window_start
"""


@query("events_sliding_window", "temporal",
       "§2.4 X8 event-time sliding window", _SLIDING_SQL)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2).

    Spark's ``window()`` generates the epoch-aligned window set; the
    oracle reproduces it with integer epoch-µs arithmetic.
    """
    t = load_tables(spark, sf_dir)
    w = F.window(F.col("ts"), "1 hour", "30 minutes")
    return (
        t.events
        .groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum(F.col("value")).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "n_events", "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Session window
# ---------------------------------------------------------------------------

_SESSION_SQL = f"""
WITH d AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
),
m AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM m
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 10 MINUTE AS session_end,
       count(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@query("events_sessionization", "temporal",
       "§2.4 X8 session windows", _SESSION_SQL)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap sessionization per user — gaps-and-islands form.

    Session = events closer than the gap; end = last event + gap
    (half-open, ts == last + gap starts a new session — exactly
    ``session_window``'s rule).  r11: restated from
    ``F.session_window`` to lag-mark + running-sum islands: the
    native plan pays a pre-shuffle partial hash aggregate over
    near-unique (session_window, user) struct keys (pure overhead —
    nothing merges map-side) plus per-row struct building;  the
    island form shuffles the raw (user, ts, value) rows once, sorts
    once, and both window passes plus the final aggregation reuse
    that single user_id exchange (hashpartitioning(user_id)
    satisfies the (user, __sid) clustering).  Measured sf1:
    0.93 -> 0.72 s.  Gap compare is in epoch-µs (full timestamp
    precision).  Scale: still exactly one shuffle on user_id; the
    streaming twin (streaming/windows.py) keeps the native
    session_window + watermark expression — window semantics are
    identical by the half-open rule above.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = 600 * 1_000_000
    marked = (
        t.events.filter(F.col("ts").isNotNull())
        .select(
            "user_id", "ts", "value",
            F.when(
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w)) < gap_us, 0)
            .otherwise(1).alias("__new"))
    )
    sess = marked.select(
        "user_id", "ts", "value",
        F.sum("__new").over(run).alias("__sid"))
    return (
        sess.groupBy("user_id", "__sid")
        .agg(F.min("ts").cast("timestamp_ntz").alias("session_start"),
             (F.max("ts") + F.expr("INTERVAL 10 MINUTES"))
             .cast("timestamp_ntz").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             dsum(F.col("value")).alias("total_value"))
        .select("user_id", "session_start", "session_end",
                "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------

_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.ts AS click_ts,
       p.ts AS matched_ts, p.value AS matched_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


@query("asof_join_events", "temporal",
       "§2.5 as-of join (custom operator, operators/asof.py)", _ASOF_SQL)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to that user's latest prior purchase.

    Custom operator: union + keyed window (ONE shuffle of |L|+|R|
    rows) — see operators/asof.py; the oracle is DuckDB's native
    ASOF JOIN.
    """
    t = load_tables(spark, sf_dir)
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts"), "value")
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    joined = asof_join(clicks, purchases, on="user_id",
                       left_ts="ts", right_ts="ts",
                       payload_cols=["value"])
    return joined.select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("matched_ts"),
        F.col("matched_value"),
    )


# ---------------------------------------------------------------------------
# Latest-per-key dedup + JSON props
# ---------------------------------------------------------------------------

_LATEST_SQL = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


@query("events_dedup_latest", "temporal",
       "§2.4 latest-state compaction (streaming dedup analog)",
       _LATEST_SQL)
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user (changelog compaction / stream-to-table)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (
        t.events.select("user_id", "event_id",
                        F.col("ts").cast("timestamp_ntz").alias("ts"),
                        "event_type",
                        F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_JSON_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("events_json_props", "temporal",
       "§2.5 scalar fns (json — events.props bag)", _JSON_SQL)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON property bag and aggregate an extracted field."""
    t = load_tables(spark, sf_dir)
    return (
        t.events
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint"))
            .cast("bigint").alias("sum_k"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_MAP_FUNCS_SQL = """
WITH m AS (
  SELECT event_id, event_type,
         json_extract_string(props, '$.k') AS k_str
  FROM events
)
SELECT event_id, event_type,
       concat('type=', event_type, ',k=', k_str) AS kv_string,
       CAST(k_str AS BIGINT) % 10 AS k_bucket,
       k_str IS NOT NULL AS has_k
FROM m
WHERE event_id % 20 = 0
"""


@query("events_map_functions", "temporal",
       "§2.5 scalar fns (map/json bag access)", _MAP_FUNCS_SQL)
def events_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property-bag access via a real MapType: props parsed with
    from_json into map<string,string>, then element access — the
    events.props contract from FIXTURES.md."""
    t = load_tables(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,string>")
    return (
        t.events
        .filter(F.col("event_id") % 20 == 0)
        .select(
            "event_id", "event_type",
            F.concat(F.lit("type="), F.col("event_type"), F.lit(",k="),
                     m.getItem("k")).alias("kv_string"),
            (m.getItem("k").cast("bigint") % 10).alias("k_bucket"),
            m.getItem("k").isNotNull().alias("has_k"),
        )
    )


_RANGE_FRAME_SQL = f"""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(sum(CAST(value AS DECIMAL(30,4)))
            OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS value_last_hour,
       CAST(count(*)
            OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS events_last_hour
FROM events
"""


@query("window_range_frame", "temporal",
       "§2.5 windows (time-interval RANGE frames — trailing-hour agg)",
       _RANGE_FRAME_SQL)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour running aggregates per user via a RANGE frame
    keyed on epoch-microseconds (identical frame on both engines).

    Scale: one shuffle on user_id; the range frame is evaluated with a
    sliding pointer over the sorted partition — O(n), not O(n^2).
    """
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return t.events.select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.sum(F.col("value").cast("decimal(30,4)")).over(w)
        .cast("double").alias("value_last_hour"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("events_last_hour"),
    )


_TIME_RANGE_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       {dsum_sql('value')} AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type
"""


@query("events_time_range_pushdown", "temporal",
       "§2.5 + scale: time-range scan with parquet pushdown on the "
       "raw nanosecond column (sources/tables.events_time_range)",
       _TIME_RANGE_SQL)
def events_time_range_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-day event slice aggregated per type.

    Scale: the predicate lands on the raw INT64 nanos column, so the
    parquet reader prunes row groups BEFORE any timestamp conversion —
    asserted by tests/test_plans.py.
    """
    from geohub_data_pipeline_spark.sources.tables import events_time_range

    ev = events_time_range(spark, sf_dir,
                           "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum(F.col("value")).alias("total_value"),
             F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Watermark lateness (X8 observability)
# ---------------------------------------------------------------------------

# streaming delay twin: events later than this vs the per-key high
# watermark would be dropped by `withWatermark(ts, '10 minutes')`
_WM_DELAY_US = 10 * 60 * 1_000_000

_WM_LATENESS_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
lat AS (
  SELECT event_type,
         max(us) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - us AS late_us
  FROM ev
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN late_us > {_WM_DELAY_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(sum(late_us) AS BIGINT) AS sum_late_us,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM lat
GROUP BY event_type
"""


@query("events_watermark_lateness", "temporal",
       "§2.4 X8 watermark-lateness metrics (late-data observability)",
       _WM_LATENESS_SQL)
def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How late does each event arrive vs the high watermark, and what
    would a 10-minute watermark drop?

    The streaming watermark is (max event time seen) - delay; its
    deterministic batch twin is a running max of event time in arrival
    order (event_id), computed PER KEY (user_id) so the window is
    partition-parallel — the keyed form a 1000-executor job actually
    runs, with no global ordering bottleneck.  All metrics are integer
    microsecond arithmetic (bit-exact across engines).
    """
    t = load_tables(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    lat = t.events.select(
        "event_type",
        (F.max(F.unix_micros("ts")).over(w)
         - F.unix_micros("ts")).alias("late_us"),
    )
    return (
        lat.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("late_us") > _WM_DELAY_US).cast("bigint"))
            .alias("n_dropped"),
            F.sum("late_us").alias("sum_late_us"),
            F.max("late_us").alias("max_late_us"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel — ordered stage progression per user
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
v AS (
  SELECT user_id, min(ts) AS t_view FROM e
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked,
       (SELECT count(*) FROM p) AS n_purchased,
       (SELECT CAST(COALESCE(sum(epoch_us(p.t_purchase)
                                 - epoch_us(v.t_view)), 0) AS BIGINT)
        FROM p JOIN v ON p.user_id = v.user_id)
         AS total_us_view_to_purchase
"""


@query("events_funnel", "temporal",
       "§2.4 funnel: strict-order view -> click -> purchase stage "
       "progression per user", _FUNNEL_SQL)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: a user converts a stage only with an event
    strictly after their previous stage's first event (view -> click
    -> purchase), the standard product-analytics query.

    Plan: per-stage min-timestamp aggregation joined forward — three
    aggregations and two joins ALL keyed on user_id, so a cluster
    reuses one hash partitioning end-to-end (AQE broadcasts the
    shrinking stage tables at small SF).  Conversion latency is an
    exact integer microsecond sum — no float drift.
    """
    t = load_tables(spark, sf_dir)
    e = t.events.select("user_id", "event_type", "ts")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (e.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    lat = (p.join(v, "user_id")
           .agg(F.coalesce(
               F.sum(F.unix_micros("t_purchase") - F.unix_micros("t_view")),
               F.lit(0)).cast("long").alias("total_us_view_to_purchase")))
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
        .crossJoin(lat)
    )


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
WITH d AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
firsts AS (
  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, day FROM d
)
SELECT f.cohort_day,
       CAST(a.day - f.cohort_day AS INTEGER) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM act a JOIN firsts f ON a.user_id = f.user_id
GROUP BY f.cohort_day, day_offset
ORDER BY f.cohort_day, day_offset
"""


@query("events_cohort_retention", "temporal",
       "§2.5 temporal analytics: cohort retention — two partial-"
       "aggregated groupBys and one user-keyed join, the classic "
       "product-analytics rollup", _RETENTION_SQL)
def events_cohort_retention(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Day-granularity cohort retention: cohort = each user's first
    active day, one row per (cohort_day, day_offset) with the
    distinct active users — the triangle table behind every
    retention curve.

    Scale: first-day extraction and daily-activity dedup are both
    partial-aggregated groupBys on user_id (map-side combine);
    the join back is user-keyed (AQE broadcasts the cohort side
    when small) and the final rollup groups ~cohorts x offsets
    rows, never raw events.
    """
    t = load_tables(spark, sf_dir)
    d = t.events.select(
        "user_id", F.to_date(F.col("ts")).alias("day"))
    firsts = d.groupBy("user_id").agg(
        F.min("day").alias("cohort_day"))
    act = d.distinct()
    return (act.join(firsts, "user_id")
            .groupBy("cohort_day",
                     F.datediff("day", "cohort_day")
                     .cast("int").alias("day_offset"))
            .agg(F.count_distinct("user_id").cast("long")
                 .alias("n_users"))
            .orderBy("cohort_day", "day_offset"))


# ---------------------------------------------------------------------------
# RFM segmentation + event transition matrix (round 7)
# ---------------------------------------------------------------------------

_RFM_SQL = f"""
WITH agg AS (
  SELECT o_custkey AS custkey,
         CAST(max(o_orderdate) AS TIMESTAMP) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         {dsum_sql('o_totalprice', 4)} AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT custkey, last_order, frequency, monetary,
       CAST(ntile(5) OVER (ORDER BY last_order, custkey)
            AS INTEGER) AS r_q,
       CAST(ntile(5) OVER (ORDER BY frequency, custkey)
            AS INTEGER) AS f_q,
       CAST(ntile(5) OVER (ORDER BY monetary, custkey)
            AS INTEGER) AS m_q
FROM agg
ORDER BY custkey
"""


@query("events_rfm_segments", "temporal",
       "§2.5 agg+windows: RFM segmentation — per-customer recency/"
       "frequency/monetary + deterministic ntile quintiles (the "
       "classic customer-value rollup)", _RFM_SQL)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary per customer with quintile scores
    — one groupBy, three global ntile windows over the AGGREGATED
    table (bounded: one row per customer, never over the fact), each
    with a full tie-break so the quintiles are deterministic."""
    t = load_tables(spark, sf_dir)
    agg = (t.orders.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.max("o_orderdate").cast("timestamp_ntz")
                .alias("last_order"),
                F.count(F.lit(1)).alias("frequency"),
                dsum(F.col("o_totalprice"), 4).alias("monetary")))
    return (agg.select(
        "custkey", "last_order", "frequency", "monetary",
        F.ntile(5).over(Window.orderBy("last_order", "custkey"))
        .alias("r_q"),
        F.ntile(5).over(Window.orderBy("frequency", "custkey"))
        .alias("f_q"),
        F.ntile(5).over(Window.orderBy("monetary", "custkey"))
        .alias("m_q"))
        .orderBy("custkey"))


_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS src, next_type AS dst,
       CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY n DESC, src, dst
LIMIT 25
"""


@query("events_transition_matrix", "temporal",
       "§2.5 windows+agg: first-order event transition matrix "
       "(per-user lead, pair counts — the Markov-chain view of the "
       "event stream behind next-action models)", _TRANSITION_SQL)
def events_transition_matrix(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Consecutive event-type pairs per user, counted — ONE
    user-keyed window for the lead and one pair-keyed partial
    aggregate; the per-user ordering tie-breaks on event_id so the
    matrix is deterministic."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (t.events
            .select(F.col("event_type").alias("src"),
                    F.lead("event_type").over(w).alias("dst"))
            .filter(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "src", "dst")
            .limit(25))


# ---------------------------------------------------------------------------
# Round 8: time-series resample + gap fill
# ---------------------------------------------------------------------------

_RESAMPLE_SQL = f"""
WITH daily AS (
  SELECT CAST(user_id % 20 AS BIGINT) AS series,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         {dsum_sql('value')} AS v
  FROM events
  GROUP BY 1, 2
),
grid AS (
  SELECT s.series, CAST(g.d AS DATE) AS day
  FROM (SELECT DISTINCT series FROM daily) s,
       (SELECT unnest(generate_series(DATE '2024-01-01',
                                      DATE '2024-01-30',
                                      INTERVAL 1 DAY)) AS d) g
)
SELECT g.series AS series, g.day AS day,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY g.series ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_filled,
       d.v IS NULL AS was_gap
FROM grid g
LEFT JOIN daily d ON d.series = g.series AND d.day = g.day
ORDER BY g.series, g.day
"""


@query("events_resample_ffill", "temporal",
       "time series: fixed-grid resample + forward fill — the "
       "pandas asfreq/ffill analog distributed: a generated date "
       "grid per series, one left join against the daily aggregate, "
       "and last(ignorenulls) over an unbounded-preceding row frame",
       _RESAMPLE_SQL)
def events_resample_ffill(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Daily value per series (user_id % 20) over the full January
    grid: days with no events carry the last seen value forward
    (NULL before the first observation) and flag ``was_gap``.  The
    grid is a sequence() explode — no driver loop; the fill is one
    window pass per series; the daily sums are exact decimals so
    both engines agree bit-for-bit."""
    t = load_tables(spark, sf_dir)
    daily = (t.events.groupBy(
        (F.col("user_id") % 20).cast("long").alias("series"),
        F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(dsum(F.col("value")).alias("v")))
    grid = (daily.select("series").distinct()
            .select("series", F.explode(F.expr(
                "sequence(DATE '2024-01-01', DATE '2024-01-30', "
                "interval 1 day)")).alias("day")))
    j = grid.join(daily, ["series", "day"], "left")
    w = (Window.partitionBy("series").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (j.select(
        "series", "day",
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("v").isNull().alias("was_gap"))
        .orderBy("series", "day"))


_INTERVAL_OVERLAP_SQL = """
WITH act AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         min(epoch_us(CAST(ts AS TIMESTAMP))) AS a0,
         max(epoch_us(CAST(ts AS TIMESTAMP))) AS a1
  FROM events GROUP BY user_id, day
),
j AS (
  SELECT user_id,
         greatest(0, least(a1, epoch_us(day) + 18000000000)
                     - greatest(a0, epoch_us(day) + 7200000000)) AS ov_us
  FROM act
)
SELECT user_id, CAST(sum(ov_us) AS BIGINT) AS overlap_us
FROM j GROUP BY user_id HAVING sum(ov_us) > 0 ORDER BY user_id
"""


@query("events_interval_overlap", "temporal",
       "temporal closure: interval-overlap duration — per-user daily "
       "activity spans intersected with a fixed 02:00-05:00 "
       "maintenance window, exact epoch-us integer arithmetic "
       "(greatest/least clamp), one groupBy(user, day) then one "
       "groupBy(user)", _INTERVAL_OVERLAP_SQL)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds (in epoch-µs) each user's daily activity interval
    [min ts, max ts] overlaps the recurring 02:00-05:00 UTC
    maintenance window — the interval-intersection aggregate
    (billing overlap, SLA downtime attribution) computed as pure
    integer clamp arithmetic: overlap = max(0, min(ends) -
    max(starts)).  Users with zero total overlap are dropped.

    Scale: the maintenance set is IMPLICIT (derived per row from
    date_trunc), so there is no interval join at all — just two
    keyed aggregations that combine map-side.  A general two-table
    interval join is the join_range_theta / asof_join_events shape;
    this query pins the overlap ARITHMETIC bit-exactly.
    """
    t = load_tables(spark, sf_dir)
    act = (t.events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.min(F.unix_micros("ts")).alias("a0"),
             F.max(F.unix_micros("ts")).alias("a1")))
    day_us = F.unix_micros("day")
    ov = F.greatest(
        F.lit(0),
        F.least(F.col("a1"), day_us + F.lit(18_000_000_000))
        - F.greatest(F.col("a0"), day_us + F.lit(7_200_000_000)))
    return (act.select("user_id", ov.alias("ov_us"))
            .groupBy("user_id")
            .agg(F.sum("ov_us").alias("overlap_us"))
            .filter(F.col("overlap_us") > 0)
            .orderBy("user_id"))


_SEASONAL_SQL = """
WITH d AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
w AS (
  SELECT day, n_events,
         CASE WHEN count(*) OVER win = 7
              THEN CAST(sum(n_events) OVER win AS BIGINT) END AS sum7,
         CAST(epoch_us(day) // 86400000000 % 7 AS BIGINT) AS dow
  FROM d
  WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
r AS (
  SELECT day, n_events, sum7, dow,
         CAST(7 * n_events - sum7 AS BIGINT) AS resid7
  FROM w
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_events, sum7, dow, resid7,
       CAST(sum(resid7) OVER (PARTITION BY dow) AS DOUBLE)
         / count(resid7) OVER (PARTITION BY dow) AS dow_mean_resid7
FROM r ORDER BY day
"""


@query("events_seasonal_decompose", "temporal",
       "temporal closure: trend/seasonal decomposition — 7-day "
       "centered moving-average trend (full windows only) and "
       "day-of-week seasonal index, all integer until one final "
       "division (residuals scaled by 7 so no float sums ever "
       "accumulate)", _SEASONAL_SQL)
def events_seasonal_decompose(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Classic moving-average seasonal decomposition of the daily
    event count: trend = centered 7-day sum (NULL at the edges where
    the window is partial), residual held as the INTEGER
    7*count - sum7 (so nothing fractional accumulates), and the
    day-of-week seasonal index as one final sum/count division per
    dow partition.  Day-of-week comes from epoch-day arithmetic —
    both engines' dayofweek() disagree on numbering, epoch division
    does not.

    Scale: one groupBy(day) (map-side combining), then windows over
    the DAY-GRAIN relation — thousands of rows per tracked year no
    matter how many raw events, so the window stage is free; the
    heavy lifting is the first aggregation.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    d = (t.events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events")))
    win = Window.orderBy("day").rowsBetween(-3, 3)
    w = d.select(
        "day", "n_events",
        F.when(F.count(F.lit(1)).over(win) == 7,
               F.sum("n_events").over(win)).alias("sum7"),
        (F.unix_micros(F.col("day")) / F.lit(86_400_000_000) % 7)
        .cast("long").alias("dow"))
    r = w.withColumn(
        "resid7", (F.lit(7) * F.col("n_events") - F.col("sum7"))
        .cast("long"))
    dw = Window.partitionBy("dow")
    return (r.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events", "sum7", "dow", "resid7",
        (F.sum("resid7").over(dw).cast("double")
         / F.count("resid7").over(dw)).alias("dow_mean_resid7"))
        .orderBy("day"))


_ATTRIBUTION_SQL = """
WITH ev AS (
  SELECT user_id, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         event_id
  FROM events
),
enc AS (
  SELECT user_id, event_type, value, us, event_id,
         max(CASE WHEN event_type IN ('click', 'view')
                  THEN us * 2 + CASE WHEN event_type = 'view'
                                     THEN 1 ELSE 0 END END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_enc
  FROM ev
),
p AS (
  SELECT CASE WHEN last_enc IS NOT NULL
               AND us - last_enc // 2 <= 259200000000
              THEN CASE WHEN last_enc % 2 = 1 THEN 'view'
                        ELSE 'click' END
              ELSE 'none' END AS attributed_type,
         value
  FROM enc WHERE event_type = 'purchase'
)
SELECT attributed_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
FROM p GROUP BY attributed_type ORDER BY attributed_type
"""


@query("events_attribution_last_touch", "temporal",
       "temporal closure: last-touch marketing attribution — every "
       "purchase credited to the user's most recent click/view "
       "within 72 h via ONE user-keyed window (argmax carried as an "
       "encoded epoch-us integer, so the tie-break is deterministic "
       "and no self-join happens)", _ATTRIBUTION_SQL)
def events_attribution_last_touch(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Revenue attribution: each purchase takes the type of the
    LAST preceding click-or-view by the same user within 3 days,
    else 'none'.  The argmax rides one max() window over an encoded
    integer (us * 2 + type bit) — most-recent wins, view beats
    click on an exact timestamp tie, bit-exactly on both engines —
    instead of the purchase-to-touch self-join that explodes on
    active users.  Money sums go through DECIMAL (order-independent).

    Scale: one shuffle keyed on user_id for the window, one tiny
    groupBy(attributed_type); no join at all.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t.events.select(
        "user_id", "event_type", "value", "event_id",
        F.unix_micros("ts").alias("us"))
    w = (Window.partitionBy("user_id").orderBy("us", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    enc = ev.withColumn(
        "last_enc",
        F.max(F.when(F.col("event_type").isin("click", "view"),
                     F.col("us") * 2
                     + F.when(F.col("event_type") == "view", 1)
                     .otherwise(0))).over(w))
    p = (enc.filter(F.col("event_type") == "purchase")
         .select(
             F.when(F.col("last_enc").isNotNull()
                    & (F.col("us") - F.expr("last_enc div 2")
                       <= 259_200_000_000),
                    F.when(F.col("last_enc") % 2 == 1, "view")
                    .otherwise("click"))
             .otherwise("none").alias("attributed_type"),
             "value"))
    from geohub_data_pipeline_spark.plans._util import dsum
    return (p.groupBy("attributed_type")
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 dsum(F.col("value")).alias("total_value"))
            .orderBy("attributed_type"))


_TWAP_SQL = """
WITH ev AS (
  SELECT user_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
  FROM events
),
g AS (
  SELECT user_id, value, us,
         lead(us) OVER (PARTITION BY user_id
                        ORDER BY us, event_id) AS next_us
  FROM ev
),
w AS (
  SELECT user_id, value, CAST(next_us - us AS BIGINT) AS wt
  FROM g WHERE next_us IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(wt) AS BIGINT) AS span_us,
       round(CAST(sum(CAST(value AS DECIMAL(16,6))
                      * CAST(wt AS DECIMAL(19,0))) AS DOUBLE)
             / CAST(sum(wt) AS BIGINT), 8) AS twap
FROM w GROUP BY user_id ORDER BY user_id
"""


@query("events_time_weighted_avg", "temporal",
       "temporal closure: time-weighted average (TWAP) — each "
       "observation weighted by its holding interval to the next "
       "event (lead window), weights exact epoch-us integers, "
       "value x weight through DECIMAL so nothing float ever "
       "accumulates; one user-keyed window + one aggregation",
       _TWAP_SQL)
def events_time_weighted_avg(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value — the
    TWAP/billing-meter aggregate where a value held for 6 hours
    counts 6x one held for an hour: weight = µs until the user's
    next event (lead over (us, event_id) — the id tie-break keeps
    equal timestamps deterministic), last event carries no interval.
    The weighted sum runs in width-pinned DECIMAL (exact, order-
    independent); the final quotient rounds to 8 decimals because
    DuckDB's int128-decimal -> double conversion differs from
    Java's correctly-rounded one by 1 ulp on ~20-digit sums.

    Scale: one shuffle keyed on user_id shared by the window and
    the groupBy (Catalyst reuses the partitioning); no join.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t.events.select("user_id", "value", "event_id",
                         F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = ev.withColumn("next_us", F.lead("us").over(w))
    wd = (g.filter(F.col("next_us").isNotNull())
          .select("user_id", "value",
                  (F.col("next_us") - F.col("us")).alias("wt")))
    # widths pinned so the product stays inside decimal(38,_) on
    # BOTH engines: value(16,6) x wt(19,0) -> (36,6); a (30,6) x
    # bigint product would overflow Spark's 38-digit cap and
    # silently rescale
    return (wd.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum("wt").alias("span_us"),
                 F.round(
                     F.sum(F.col("value").cast("decimal(16,6)")
                           * F.col("wt").cast("decimal(19,0)"))
                     .cast("double")
                     / F.sum("wt"), 8).alias("twap"))
            .orderBy("user_id"))


_ZSCORE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
w AS (
  SELECT user_id, event_id, value,
         count(*) OVER trail AS k,
         sum(CAST(value AS DECIMAL(18,6))) OVER trail AS s1,
         sum(CAST(value AS DECIMAL(19,6))
             * CAST(value AS DECIMAL(18,6))) OVER trail AS s2
  FROM ev
  WINDOW trail AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id,
       round((CAST(value AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
             / sqrt(CAST(s2 AS DOUBLE) / k
                    - (CAST(s1 AS DOUBLE) / k)
                      * (CAST(s1 AS DOUBLE) / k)), 6) AS zscore
FROM w
WHERE k = 5
  AND CAST(s2 AS DOUBLE) / k
      - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k) > 1e-12
  AND abs((CAST(value AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
          / sqrt(CAST(s2 AS DOUBLE) / k
                 - (CAST(s1 AS DOUBLE) / k)
                   * (CAST(s1 AS DOUBLE) / k))) >= 2.0
ORDER BY user_id, event_id
"""


@query("events_zscore_anomaly", "temporal",
       "temporal closure: trailing-window z-score anomaly detection "
       "— per-event z against the user's previous 5 values, moment "
       "sums in DECIMAL over the window frame (exact), one rounded "
       "double expression; |z| >= 2 flagged", _ZSCORE_SQL)
def events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates >= 2 trailing standard deviations
    from the same user's previous five events — the stream-style
    anomaly primitive, computed batch-side with the same trailing
    frame semantics (ROWS 5 PRECEDING .. 1 PRECEDING, (us, event_id)
    order so timestamp ties stay deterministic).  The mean/variance
    come from DECIMAL moment sums over the frame — exact, so the
    only floats are one identical rounded expression per row;
    degenerate windows (fewer than 5 priors, ~zero variance) are
    excluded on both engines identically.

    Scale: one shuffle keyed on user_id; the frame is O(1) per row.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_id", "value",
                         F.unix_micros("ts").alias("us"))
    trail = (Window.partitionBy("user_id").orderBy("us", "event_id")
             .rowsBetween(-5, -1))
    # (19,6) left factor: forces DuckDB's int128 multiply path
    v = F.col("value").cast("decimal(18,6)")
    vw = F.col("value").cast("decimal(19,6)")
    w = ev.select(
        "user_id", "event_id", "value",
        F.count(F.lit(1)).over(trail).alias("k"),
        F.sum(v).over(trail).alias("s1"),
        F.sum(vw * v).over(trail).alias("s2"))
    mean = F.col("s1").cast("double") / F.col("k")
    var = F.col("s2").cast("double") / F.col("k") - mean * mean
    z = (F.col("value").cast("double") - mean) / F.sqrt(var)
    return (w.filter((F.col("k") == 5) & (var > 1e-12)
                     & (F.abs(z) >= 2.0))
            .select("user_id", "event_id", F.round(z, 6).alias("zscore"))
            .orderBy("user_id", "event_id"))


_SLIDING_DISTINCT_SQL = """
WITH ev AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
  FROM events
),
asg AS (
  SELECT DISTINCT user_id, day - o.k AS win_start_day
  FROM ev, (SELECT unnest(range(3)) AS k) o
),
w AS (
  SELECT win_start_day, CAST(count(*) AS BIGINT) AS distinct_users
  FROM asg GROUP BY win_start_day
)
SELECT CAST(win_start_day AS BIGINT) AS win_start_day, distinct_users
FROM w ORDER BY win_start_day
"""


@query("events_sliding_distinct_users", "temporal",
       "temporal closure: DISTINCT users per sliding 3-day window "
       "(slide 1 day) — each event fans out to its 3 windows "
       "map-side, then ONE (window, user) dedup-count; the "
       "sliding-distinct shape tumbling sums cannot express",
       _SLIDING_DISTINCT_SQL)
def events_sliding_distinct_users(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """3-day rolling active-user counts at day grain: every event
    lands in the 3 windows starting on its day and the two days
    before, and the aggregate is COUNT(DISTINCT user) per window —
    the rolling-MAU/WAU shape, which cannot be composed from
    tumbling results because distinct does not merge.  Epoch-day
    integer arithmetic (engine-neutral), one explode (factor 3 =
    window/slide), one (window, user) dedup, one count.

    Scale: the only shuffle keys on (window, user); the explode
    factor is the window/slide ratio, the standard cost of exact
    sliding distinct (approximate variants ride the HLL/theta
    sketches elsewhere in the registry).
    """
    t = load_tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long")
        .alias("day"))
    asg = (ev.select(
        "user_id",
        F.explode(F.array(F.col("day"), F.col("day") - 1,
                          F.col("day") - 2)).alias("win_start_day"))
        .distinct())
    return (asg.groupBy("win_start_day")
            .agg(F.count(F.lit(1)).alias("distinct_users"))
            .orderBy("win_start_day"))
