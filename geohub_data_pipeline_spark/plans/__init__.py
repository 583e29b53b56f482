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

from geohub_data_pipeline_spark.plans.registry import promote  # noqa: E402

# The harness evaluates the registry in order and checks a 50-entry
# prefix per round.  Round 3 rotation: lead with the 5 queries that
# have NEVER had a gate row (round 2's list was 55 long, so its tail
# of 5 fell off the window), then any queries new this round, then the
# 48 round-1-only queries for a fresh hard signal after two rounds of
# churn (the llm/curation/temporal surface went 50/50 green in r2 and
# rotates to the back).  The trivial scalar family sits last as the
# spill past entry 50.
promote([
    # never driver-checked (r2's window tail) — MUST lead
    "tile_shared_borders", "tile_joint_simplify",
    "overview_downsample", "multimodal_metadata", "geo_tile_pipeline",
    # new in round 3 (CRS stack + makevalid + raster probe under the
    # hard gate)
    "crs_roundtrip", "makevalid_audit", "raster_probe", "gpkg_source",
    # round-1-only relational/pipeline flagships
    "q1_pricing_summary", "join_multiway_broadcast", "join_range_theta",
    "agg_cube", "window_rank", "topk_per_group", "set_intersect",
    "tile_aggregation", "tile_assignment", "feature_count_audit",
    # remaining round-1-only joins / aggs / windows / sets
    "join_inner", "join_left_outer", "join_full_outer", "join_semi",
    "join_anti", "join_bloom_prefilter",
    "agg_stats", "agg_distinct", "agg_pivot_status",
    "agg_grouping_sets_df", "agg_rollup", "agg_grouping_sets",
    "agg_percentile", "agg_histogram_quantile",
    "agg_countmin_heavyhitters", "agg_hll_manual", "agg_hll_per_group",
    "window_analytic", "window_running", "sort_limit",
    "set_union", "set_except", "distinct_projection",
    "pivot_status_by_segment", "subquery_above_avg", "subquery_in",
    # round-1-only pipeline surface
    "msg_parse_project", "path_rewrite", "raw_folder_filter",
    "dispatch_route", "user_hash_distinct", "backfill_anti_join",
    "progress_partition",
    # scalar family: simplest plans, spill candidates past entry 50
    "scalar_null_handling", "conditional_case", "scalar_string",
    "scalar_math", "scalar_datetime",
])
