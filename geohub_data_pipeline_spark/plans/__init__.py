"""Query plans — the registry the correctness harness executes.

Importing this package registers every query module.  Each query is a
(Spark DataFrame builder, DuckDB oracle SQL) pair; see registry.py.
"""

from geohub_data_pipeline_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    get_query,
    query,
)

# Import for registration side effects — order fixes registry order.
from geohub_data_pipeline_spark.plans import relational  # noqa: E402,F401
from geohub_data_pipeline_spark.plans import pipeline  # noqa: E402,F401
from geohub_data_pipeline_spark.plans import temporal  # noqa: E402,F401
from geohub_data_pipeline_spark.plans import llm  # noqa: E402,F401
from geohub_data_pipeline_spark.plans import curation  # noqa: E402,F401
