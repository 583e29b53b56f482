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

# The harness evaluates the registry in order (round 1 it stopped at
# entry 50), so lead with the queries that have never had a gate row —
# the llm/curation/temporal north-star surface — plus the two repaired
# relational reds and the untested pipeline tail.  The relational bulk
# (38/40 green in round 1) rotates to the back.
promote([
    # llm: dedup + ANN + text (round-1 entries 66-90, never checked)
    "dedup_minhash_lsh", "dedup_pipeline_verified",
    "dedup_cluster_canonical", "ann_cosine_topk", "ann_lsh_bucketed",
    "dedup_exact_keep_first", "minhash_signatures", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "ann_lsh_multiprobe", "ann_quantized_int8", "ann_pq_reconstructed",
    "ann_pq_adc", "ann_ivf_coarse", "ann_ivf_kmeans",
    "ann_ivf_kmeans_parallel", "dedup_cluster_altcc",
    "text_language_id", "text_quality_score", "text_token_count",
    "text_fingerprint", "lateral_explode_top_words",
    "text_edit_distance", "text_normalize",
    # curation (91-101, never checked)
    "text_tfidf_top_terms", "pack_token_shards", "contamination_ngram",
    "text_repetition_filter", "split_train_val", "sample_stratified",
    "mixture_weights", "text_unigram_logprob", "dedup_cdc_chunks",
    "pack_sequences_offsets", "text_pii_scrub",
    # temporal (55-65, never checked)
    "events_sessionization", "asof_join_events",
    "events_tumbling_window", "events_sliding_window",
    "events_dedup_latest", "events_json_props", "events_map_functions",
    "window_range_frame", "events_time_range_pushdown",
    "events_watermark_lateness", "events_funnel",
    # repaired round-1 reds
    "agg_collect_array", "agg_approx_distinct",
    # pipeline tail that sat past entry 50 (+ the new round-2 op)
    "zoom_heuristic", "tile_shared_borders", "tile_joint_simplify",
    "overview_downsample", "multimodal_metadata", "geo_tile_pipeline",
])
