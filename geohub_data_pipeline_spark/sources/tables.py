"""Parquet table sources for the harness star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/``.

Scale note: each ``load_table`` is a plain ``spark.read.parquet`` so
Catalyst keeps predicate pushdown / column pruning / partition pruning;
never materialize data here (the only caching is of lazy logical
plans).  At 100 TB these would be directories of many files (possibly
partitioned); the API is path-based so nothing changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (appId, sf_dir, table) -> DataFrame.  A DataFrame is an immutable
# *logical plan*, not data: caching it skips the ~100 ms JVM file
# listing + footer/schema read that `spark.read.parquet` pays per call,
# while predicate pushdown / column pruning still happen per query on
# top of the cached scan node.  Keyed by applicationId so a restarted
# session (new JVM context) never sees plans bound to a dead one.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one harness table; normalizes the events nanosecond timestamp.

    events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS,false) which
    Spark cannot map to a timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as epoch-nanos
    BIGINT and is converted here with integer division (``div 1000`` —
    double division would lose precision above 2**53 ns) to a
    microsecond timestamp, matching DuckDB's ns->µs truncation.
    """
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    configure(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Harness layouts vary by round: TIMESTAMP(MICROS,
            # isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ, which
            # time arithmetic (unix_micros, window()) rejects.  The
            # session timezone is pinned UTC, so the cast to LTZ is an
            # exact wall-clock identity — same values DuckDB sees.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


class Tables:
    """Lazy table namespace: ``t = load_tables(...); t.lineitem``.

    Tables are opened on first attribute access — a query touching two
    tables pays two parquet-footer reads, not ten.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)


def events_time_range(spark: SparkSession, sf_dir: str,
                      lo: str | None = None,
                      hi: str | None = None) -> DataFrame:
    """Events within [lo, hi) with the time filter pushed to parquet.

    ``events.ts`` is stored as raw epoch-nanos INT64; a filter on the
    *converted* timestamp column wraps it in an expression and cannot
    push down.  This helper compares the raw long against nano bounds
    — the scan itself skips row groups — then converts.  At 100 TB
    this is the difference between reading a day and reading a year.

    lo/hi: ISO timestamps (UTC), either may be None.
    """
    import datetime as _dt

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"),
           "__events_raw")
    df = _TABLE_CACHE.get(key)
    if df is None:
        configure(spark)
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
        _TABLE_CACHE[key] = df

    def nanos(s: str) -> int:
        dt = _dt.datetime.fromisoformat(s).replace(tzinfo=_dt.timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    if dict(df.dtypes).get("ts") == "bigint":
        if lo is not None:
            df = df.filter(F.col("ts") >= nanos(lo))
        if hi is not None:
            df = df.filter(F.col("ts") < nanos(hi))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # (non-nanos layout: plain timestamp filters push down natively;
    # filter the stored column THEN normalize ntz->ltz — under the
    # pinned UTC session tz the two orders are equivalent, and the
    # un-wrapped comparison is what reaches the parquet scan)
    if lo is not None:
        df = df.filter(F.col("ts") >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col("ts") < F.lit(hi))
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` can use it."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
