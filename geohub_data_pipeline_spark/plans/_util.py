"""Shared helpers for query builders — deterministic numeric aggregation.

Floating-point SUM/AVG results depend on accumulation order, which
differs between Spark's partial/final aggregation and the DuckDB oracle.
All money/quantity aggregates therefore go through DECIMAL (exact,
associative) and cast back to DOUBLE — bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.sources.tables import load_tables, load_table  # noqa: F401


def dsum(col: Column, scale: int = 4) -> Column:
    """Order-independent sum of a double column, exact via DECIMAL."""
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def davg(col: Column, scale: int = 6) -> Column:
    """Order-independent average (decimal sum / count)."""
    return dsum(col, scale) / F.count(F.lit(1))


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"{dsum_sql(expr, scale)} / count(*)"
