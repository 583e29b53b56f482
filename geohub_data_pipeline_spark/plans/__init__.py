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

# Registry ordering policy: STALEST-FIRST.  The external gate checks a
# fixed-size prefix of this list each round, so the order is a
# deterministic rotation by "rounds since last driver check" — every
# query cycles back under the hard gate on a bounded schedule and none
# can stay unchecked indefinitely.  Ties break by original
# registration order.  New or CHANGED queries slot in right after the
# most-overdue block so they get a gate row in their round.
#
# Round-5 staleness: 17 queries last checked in r2 (most overdue,
# the LLM/curation tail), then crs_wkt_roundtrip (fixture bank
# extended with HOM variant A this round), then the NEW round-5
# queries (equal-area + EPSG-code-only CRS, Gopher/C4 rule sets,
# KML/GPX/CSV/HGT/TopoJSON sources, substring + SemDeDup dedup,
# spatial join, zonal stats, band math), then the 50 last checked
# in r3, then the 50 checked in r4 (freshest).
promote([
    "ann_ivf_coarse", "lateral_explode_top_words", "text_edit_distance",
    "text_normalize", "ann_ivf_kmeans", "ann_ivf_kmeans_parallel",
    "text_repetition_filter", "split_train_val", "sample_stratified",
    "pack_token_shards", "contamination_ngram", "text_tfidf_top_terms",
    "mixture_weights", "text_unigram_logprob", "dedup_cdc_chunks",
    "pack_sequences_offsets", "text_pii_scrub", "crs_wkt_roundtrip",
    "crs_roundtrip_equalarea", "crs_roundtrip_codes",
    "text_gopher_rules", "text_c4_rules",
    "kml_source", "gpx_source", "csv_points_source", "hgt_probe",
    "dedup_substring_spans", "topojson_source", "dedup_semdedup",
    "spatial_join_pip", "zonal_stats", "raster_band_math",
    "raster_hillshade", "raster_slope", "raster_aspect",
    "vector_geodesic_length", "vector_geodesic_area",
    "tile_shared_borders", "tile_joint_simplify", "overview_downsample",
    "multimodal_metadata", "geo_tile_pipeline", "crs_roundtrip",
    "makevalid_audit", "raster_probe", "gpkg_source", "q1_pricing_summary",
    "join_multiway_broadcast", "join_range_theta", "agg_cube",
    "window_rank", "topk_per_group", "set_intersect", "tile_aggregation",
    "tile_assignment", "feature_count_audit", "join_inner",
    "join_left_outer", "join_full_outer", "join_semi", "join_anti",
    "join_bloom_prefilter", "agg_stats", "agg_distinct",
    "agg_pivot_status", "agg_grouping_sets_df", "agg_rollup",
    "agg_grouping_sets", "agg_percentile", "agg_histogram_quantile",
    "agg_countmin_heavyhitters", "agg_hll_manual", "agg_hll_per_group",
    "window_analytic", "window_running", "sort_limit", "set_union",
    "set_except", "distinct_projection", "pivot_status_by_segment",
    "subquery_above_avg", "subquery_in", "msg_parse_project",
    "path_rewrite", "raw_folder_filter", "dispatch_route",
    "user_hash_distinct", "backfill_anti_join", "progress_partition",
    "scalar_null_handling", "conditional_case", "scalar_string",
    "scalar_math", "scalar_datetime", "gdb_source", "nc4_probe",
    "crs_roundtrip_extended", "jpeg_pixel_stats", "erdas_source",
    "fgb_source", "gif_pixel_stats", "raster_warp", "geotiff_source",
    "agg_approx_distinct", "agg_collect_array", "zoom_heuristic",
    "events_tumbling_window", "events_sliding_window",
    "events_sessionization", "asof_join_events", "events_dedup_latest",
    "events_json_props", "events_map_functions", "window_range_frame",
    "events_time_range_pushdown", "events_watermark_lateness",
    "events_funnel", "dedup_exact_keep_first", "minhash_signatures",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "ann_cosine_topk", "ann_lsh_bucketed",
    "ann_lsh_multiprobe", "ann_quantized_int8", "ann_pq_reconstructed",
    "ann_pq_adc", "text_language_id", "text_quality_score",
    "text_token_count", "text_fingerprint", "dedup_pipeline_verified",
    "dedup_cluster_canonical", "dedup_cluster_altcc",
])
