"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 to a (spark, sf_dir) ->
DataFrame builder; ``oracle_sql()`` maps the same names to DuckDB SQL.
Both are backed by the registry in
``geohub_data_pipeline_spark/plans/`` — see plans/registry.py for the
determinism rules that make the value-hash comparison exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    spec = all_queries()["q1_pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query that is SQL-expressible."""
    return {
        name: spec.sql
        for name, spec in all_queries().items()
        if spec.sql is not None
    }
