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
# Round-8 prefix (slots 1-50), stalest-first rotation:
# (a) the three queries registered AFTER the r7 gate ran and so have
# no driver CORRECTNESS row yet (raster_sieve / events_rfm_segments /
# events_transition_matrix — r7 verdict next #3); (b) the NEW
# round-8 queries (the oracle-visible companions to the rows-only
# quartet: bpe_roundtrip_gate, bpe_train_tiers_agree,
# embedding_pca_invariants — r7 verdict next #4/#9 — and the
# Unigram-LM tokenizer pair, the SymSpell fuzzy string join, and
# the Z-order clustering key, NEW operator family members, plus
# the raster_stream_network hydrology composite, degree-oriented
# triangle counting, time-series resample+ffill, exact
# integer-weight PPSWOR sampling, and the mergeable KLL quantile
# sketch); (c) the
# CHANGED-this-round queries (mvt_border_weld: non-polygon
# pass-through fix, r7 ADVICE high; raster_point_sample: subdataset
# now rides the output, r7 ADVICE medium; text_quality_classifier:
# Adagrad trainer + now ORACLE-PAIRED on the generating rule;
# embedding_pca_project: projection flattened to scalar columns so
# the driver canonicalizer can hash it, r7 What's-wrong #1;
# bpe_train_merges/bpe_encode_stats: distributed-tier shuffle
# scoping); then (d) the round-8-continuation additions — the TPC-H
# closure set Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q20/Q21/Q22
# (completing all 22 TPC-H query shapes on this schema) and the
# r8-extended crs_roundtrip_codes (SPCS83 State Plane + NAD83(2011)
# UTM families); then (e) the stalest block — r4-checked queries,
# which have waited longest since their last driver row.  51+: the
# rest of the r4 block, then r5, then r6/r7 greens.  Every prefix entry
# verified this round with scripts/check_oracle.py at sf0.01 and the
# touched ones additionally under a VANILLA driver-style session.
promote([
    "raster_sieve",
    "events_rfm_segments",
    "events_transition_matrix",
    "bpe_roundtrip_gate",
    "bpe_train_tiers_agree",
    "embedding_pca_invariants",
    "unigram_roundtrip_gate",
    "unigram_train_invariants",
    "fuzzy_join_names",
    "spatial_zorder_key",
    "raster_stream_network",
    "graph_triangle_count",
    "events_resample_ffill",
    "sample_weighted_topk",
    "agg_kll_quantiles",
    "mvt_border_weld",
    "raster_point_sample",
    "text_quality_classifier",
    "embedding_pca_project",
    "bpe_train_merges",
    "bpe_encode_stats",
    "crs_roundtrip_codes",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_priority_lateness",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q20_excess_shipments",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "scalar_string",
    "scalar_math",
    "scalar_datetime",
    "conditional_case",
    "agg_approx_distinct",
    "agg_collect_array",
    "scalar_null_handling",
    "backfill_anti_join",
    "progress_partition",
    "dedup_minhash_lsh",
    "dedup_pipeline_verified",
    "dedup_cluster_canonical",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "dedup_exact_keep_first",
    "minhash_signatures",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_lsh_multiprobe",
    "ann_quantized_int8",
    "ann_pq_reconstructed",
    "ann_pq_adc",
    "dedup_cluster_altcc",
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "events_sessionization",
    "asof_join_events",
    "events_tumbling_window",
    "events_sliding_window",
    "events_dedup_latest",
    "events_json_props",
    "events_map_functions",
    "window_range_frame",
    "events_time_range_pushdown",
    "events_watermark_lateness",
    "events_funnel",
    "zoom_heuristic",
    "gdb_source",
    "nc4_probe",
    "crs_roundtrip_extended",
    "jpeg_pixel_stats",
    "erdas_source",
    "fgb_source",
    "gif_pixel_stats",
    "raster_warp",
    "geotiff_source",
    "q1_pricing_summary",
    "join_multiway_broadcast",
    "join_range_theta",
    "agg_cube",
    "ann_ivf_coarse",
    "ann_ivf_kmeans",
    "ann_ivf_kmeans_parallel",
    "lateral_explode_top_words",
    "text_edit_distance",
    "text_normalize",
    "text_tfidf_top_terms",
    "pack_token_shards",
    "contamination_ngram",
    "text_repetition_filter",
    "split_train_val",
    "sample_stratified",
    "mixture_weights",
    "text_unigram_logprob",
    "dedup_cdc_chunks",
    "pack_sequences_offsets",
    "text_pii_scrub",
    "tile_shared_borders",
    "tile_joint_simplify",
    "overview_downsample",
    "multimodal_metadata",
    "geo_tile_pipeline",
    "crs_roundtrip",
    "makevalid_audit",
    "raster_probe",
    "crs_roundtrip_equalarea",
    "text_gopher_rules",
    "text_c4_rules",
    "kml_source",
    "gpx_source",
    "csv_points_source",
    "hgt_probe",
    "topojson_source",
    "dedup_semdedup",
    "spatial_join_pip",
    "zonal_stats",
    "raster_band_math",
    "raster_hillshade",
    "raster_slope",
    "raster_aspect",
    "vector_geodesic_length",
    "vector_geodesic_area",
    "join_inner",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "agg_stats",
    "agg_distinct",
    "agg_pivot_status",
    "agg_grouping_sets_df",
    "agg_rollup",
    "agg_grouping_sets",
    "window_rank",
    "window_analytic",
    "window_running",
    "topk_per_group",
    "sort_limit",
    "set_union",
    "set_intersect",
    "set_except",
    "distinct_projection",
    "pivot_status_by_segment",
    "subquery_above_avg",
    "subquery_in",
    "agg_percentile",
    "agg_histogram_quantile",
    "join_bloom_prefilter",
    "agg_countmin_heavyhitters",
    "agg_hll_manual",
    "agg_hll_per_group",
    "msg_parse_project",
    "path_rewrite",
    "raw_folder_filter",
    "dispatch_route",
    "user_hash_distinct",
    "feature_count_audit",
    "tile_assignment",
    "tile_aggregation",
    "dedup_substring_spans",
    "dedup_semdedup_kmeans",
    "geo_dissolve",
    "spatial_join_buffered",
    "mvt_fragment_merge",
    "hfa_source",
    "spatial_join_nearest",
    "raster_polygonize",
    "raster_contour",
    "geo_clip",
    "spatial_join_intersects",
    "geo_overlay_intersection",
])
