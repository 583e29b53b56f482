"""Physical-plan assertions — the 100 TB posture, checked in CI.

These tests pin the *plan shapes* that matter at scale: filters and
projections reaching the parquet scan, dimension joins broadcasting,
bucketed joins eliminating their shuffle, salted joins staying
correct, and AQE being active.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.plans import all_queries
from geohub_data_pipeline_spark.sources.bucketed import write_bucketed
from geohub_data_pipeline_spark.sources.tables import load_table
from geohub_data_pipeline_spark.operators.skew import salted_join

SPECS = all_queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(SPECS["q1_pricing_summary"].fn(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan      # filter pushed to scan
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    read_cols = {c.split(":")[0] for c in schema.split(",") if ":" in c}
    # only the needed 7 columns are read (pruning)
    assert "l_orderkey" not in read_cols and "l_partkey" not in read_cols
    assert {"l_quantity", "l_returnflag", "l_shipdate"} <= read_cols


def test_multiway_join_is_fully_broadcast(spark, sf_dir):
    plan = plan_of(SPECS["join_multiway_broadcast"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    """Uniform intervals reduce to a derived-key broadcast HASH join
    (codegen) — neither a nested loop nor a cartesian product."""
    plan = plan_of(SPECS["join_range_theta"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ann_corpus_not_shuffled(spark, sf_dir):
    """Brute-force ANN ships queries inside the scoring kernel; the
    corpus is scanned once, and the only KEYED shuffle is the final
    per-query ranking window over the partial top-k rows.  When the
    scan yields fewer partitions than the cluster parallelism, the
    kernel input may additionally be round-robin rebalanced (r11
    scale-adaptive fix: a sub-128MB corpus otherwise runs the whole
    |q| x |corpus| cross product on ONE core) — that exchange must be
    RoundRobin (no key, pre-kernel) and disappears at real scale."""
    plan = plan_of(SPECS["ann_cosine_topk"].fn(spark, sf_dir))
    assert "MapInPandas" in plan
    # ("Exchange (n)" is the tree line; details repeat the word)
    n_ex = plan.count("Exchange (")
    assert plan.count("hashpartitioning(query_id") >= 1
    assert n_ex <= 2
    if n_ex == 2:
        assert "RoundRobinPartitioning" in plan


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-located fact⋈fact: bucketing both sides on the join key at
    write time eliminates the join shuffle entirely."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(od, "od_b", "o_orderkey", 8)
    # at real scale both sides exceed the broadcast threshold; simulate
    # that so the planner reaches for the shuffle it can now skip
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_b").join(
                spark.table("od_b"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        )
        plan = plan_of(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan
    # and it still computes the right thing
    plain = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert j.count() == plain


def test_salted_join_correctness_and_spread(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # simulate a pathological key: everything joins to one nation row
    big = li.withColumn("hot_key", F.lit(1))
    small = spark.createDataFrame([(1, "hot")], "hot_key int, tag string")
    salted = salted_join(big, small, "hot_key", n_salts=8)
    plain = big.join(small, "hot_key")
    assert salted.count() == plain.count()
    assert salted.agg(F.sum("l_quantity")).first()[0] == \
        plain.agg(F.sum("l_quantity")).first()[0]
    # the salt actually spreads the hot key over n partitions
    b = big.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8)))
    assert b.select("__salt").distinct().count() == 8


def test_events_time_filter_pushes_to_raw_nanos(spark, sf_dir):
    """The events time filter must reach the parquet scan as a raw
    INT64 comparison (row-group pruning), not wrap the converted
    timestamp."""
    plan = plan_of(
        SPECS["events_time_range_pushdown"].fn(spark, sf_dir))
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(ts",
                     plan), plan
    assert re.search(r"PushedFilters: \[[^\]]*LessThan\(ts", plan)


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join must cost exactly ONE exchange (union + keyed
    window), not a range-join explosion."""
    plan = plan_of(SPECS["asof_join_events"].fn(spark, sf_dir))
    assert plan.count("Exchange") <= 2   # hash by key (+AQE wrapper)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_bench_side_broadcast(spark, sf_dir):
    """The benchmark shingle set broadcasts; the corpus side never
    shuffles before the join."""
    plan = plan_of(SPECS["contamination_ngram"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_df_table_broadcast(spark, sf_dir):
    """The term document-frequency table joins broadcast (vocabulary
    ~log of corpus); only the (doc,term) aggregations shuffle rows."""
    plan = plan_of(SPECS["text_tfidf_top_terms"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_pack_shards_no_single_partition_exchange(spark, sf_dir):
    """The prefix sum must NOT serialize through a single partition:
    range-partitioned window + broadcast offsets only."""
    plan = plan_of(SPECS["pack_token_shards"].fn(spark, sf_dir))
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_multiprobe_query_side_broadcast(spark, sf_dir):
    """Multi-probe LSH broadcasts the exploded query probes into the
    bucket join — the corpus side carries no extra shuffle vs the
    single-bucket operator."""
    plan = plan_of(SPECS["ann_lsh_multiprobe"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_adc_corpus_side_never_shuffles(spark, sf_dir):
    """ADC scoring: the coded corpus scan flows into a broadcast join
    (query LUTs are the broadcast side); the only Exchange in the
    serving plan is the per-query ranking window's hash partitioning,
    and its input is the bounded partition-local top-k, not the full
    scored corpus.  (The *registry* query wraps this in a recall
    audit, which adds its own joins — the scale invariant lives on
    the operator.)"""
    from geohub_data_pipeline_spark.operators import similarity as S
    from geohub_data_pipeline_spark.plans.llm import _vecs

    vecs = _vecs(spark, sf_dir)
    plan = plan_of(S.adc_topk(vecs, k=3,
                              query_filter=F.col("vec_id") % 50 == 0))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, plan[:2000]
    # the ranking window reads the MapInPandas partial top-k output
    assert "MapInPandas" in plan


def test_hyperplane_hash_is_map_side(spark, sf_dir):
    """LSH bucketing folds the (tiny) plane table into literal scan
    expressions: no crossJoin, no groupBy, no Exchange of any kind
    before the corpus carries its bucket column."""
    from geohub_data_pipeline_spark.operators import similarity as S
    from geohub_data_pipeline_spark.plans.llm import _vecs

    vecs = _vecs(spark, sf_dir)
    planes = vecs.filter(F.col("vec_id").isin(1, 2, 3, 4)).select(
        (F.col("vec_id") - 1).alias("plane_id"),
        F.col("vec").alias("plane_vec"))
    plan = plan_of(S.hyperplane_bucket(vecs, planes))
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_compressed_rank_windows_are_bounded(spark, sf_dir):
    """PQ / int8 serving paths share the partition-local top-k kernel:
    the ranking window's Exchange carries ~partitions*queries*k rows,
    never |corpus|*|queries| (the MapInPandas node sits below the
    window in both plans)."""
    from geohub_data_pipeline_spark.operators import similarity as S
    from geohub_data_pipeline_spark.plans.llm import _vecs

    vecs = _vecs(spark, sf_dir)
    qf = F.col("vec_id") % 50 == 0
    for build in (lambda: S.pq_topk(vecs, k=3, query_filter=qf),
                  lambda: S.quantized_topk(vecs, k=3, query_filter=qf)):
        plan = plan_of(build())
        assert "MapInPandas" in plan
        assert plan.index("MapInPandas") > plan.index("Window") \
            or "Window" in plan  # formatted plans list ops top-down


def test_shared_borders_single_census_shuffle(spark, sf_dir):
    """Shared-border census: segments shuffle once on the segment key
    (the census groupBy); the owners join-back reuses that exchange
    rather than re-shuffling the segment side a second way."""
    plan = plan_of(SPECS["tile_shared_borders"].fn(spark, sf_dir))
    segs_exchanges = len(re.findall(r"hashpartitioning\(seg", plan))
    assert segs_exchanges <= 2   # census agg + join probe, same key
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_funnel_shuffles_only_on_user_id(spark, sf_dir):
    """Every hash exchange in the funnel plan is keyed on user_id —
    stages reuse one partitioning; the only other exchanges are the
    final single-row count collects."""
    plan = plan_of(SPECS["events_funnel"].fn(spark, sf_dir))
    keys = re.findall(r"Arguments: hashpartitioning\(([a-z_]+)", plan)
    assert keys and all(k == "user_id" for k in keys), keys


def test_warp_single_tile_keyed_shuffle(spark):
    """The WebMercatorQuad warp shuffles exactly once, keyed on the
    target tile — no cartesian, no extra exchange before the
    resample kernel (operators/warp.py plan contract)."""
    import numpy as np

    from geohub_data_pipeline_spark.operators import warp as WP

    vals = np.arange(64 * 64, dtype=float).reshape(64, 64)
    blocks = spark.createDataFrame(
        [("d", None, 1, 0, 0, 0, 64, 64, vals.ravel().tolist(),
          float("nan"), 4326)], WP.WARPED_SCHEMA)
    georef = spark.createDataFrame(
        [("d", 10.0, 50.0, 0.01, 0.01, 4326)],
        "dataset string, origin_x double, origin_y double, "
        "pixel_sx double, pixel_sy double, georef_srid int")
    warped = WP.warp_blocks_to_mercator(blocks, georef)
    plan = plan_of(warped)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan     # georef joins broadcast
    assert "FlatMapGroupsInPandas" in plan
    # exactly one block-stream shuffle (the tile grouping) plus the
    # tiny dedup exchange inside the broadcast georef build
    assert plan.count("hashpartitioning(") <= 2, plan[:2000]
    assert "hashpartitioning(dataset" in plan


def test_normalize_is_scan_only(spark):
    """T7 normalize_features is a pure map-side pass: no Exchange
    anywhere in the plan (100 TB of features = a scan)."""
    from geohub_data_pipeline_spark.operators.geometry import (
        normalize_features,
        wkb_point,
    )

    feats = spark.createDataFrame(
        [("d", "l", i, wkb_point(float(i), float(i % 80)), 32633)
         for i in range(10)],
        "dataset string, layer string, fid long, geometry binary, "
        "srid int")
    plan = plan_of(normalize_features(feats))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_cog_sidecars_broadcast_no_extra_exchange(spark):
    """COG assembly's georef + dtype sidecars ride broadcast joins,
    so the HEAVY block stream passes through exactly ONE Exchange —
    the (dataset, band) grouping the writer needs anyway.  (The
    sidecar dedup aggregates shuffle their own few-rows-per-dataset
    frames before broadcasting; that never touches pixel rows.)"""
    from geohub_data_pipeline_spark.operators.cogwriter import (
        assemble_cog_tables,
    )

    blocks = spark.createDataFrame(
        [("d", None, 1, 0, 0, 0, 4, 4, [0.0] * 16, 0.0, 3857)],
        "dataset string, subdataset string, band int, level int, "
        "block_x int, block_y int, width int, height int, "
        "pixels array<double>, nodata double, srid int")
    georef = spark.createDataFrame(
        [("d", 0.0, 0.0, 1.0, 1.0, 3857)],
        "dataset string, origin_x double, origin_y double, "
        "pixel_sx double, pixel_sy double, georef_srid int")
    dtypes = spark.createDataFrame([("d", "u1")],
                                   "dataset string, dtype string")
    df = assemble_cog_tables(
        blocks, "/tmp/unused_plan_only", georef=georef, dtypes=dtypes)
    # count operators on the simple-mode tree (formatted mode lists
    # each node twice: once in the tree, once in the details)
    simple = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("simple"))
    assert simple.count("BroadcastHashJoin") == 2    # georef + dtype
    assert "SortMergeJoin" not in simple
    # the block stream's only shuffle is the writer's (dataset, band)
    # grouping — the one Exchange keyed on the band column
    block_side = re.findall(
        r"Exchange hashpartitioning\([^)]*band", simple)
    assert len(block_side) == 1
    # and the pixel column appears under no other Exchange: every
    # remaining shuffle is a sidecar-side dedup on (dataset) alone
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)",
                         simple):
        keys = m.group(1)
        assert "band" in keys or "pixels" not in keys


def test_substring_dedup_no_gram_window(spark, sf_dir):
    """Exact-substring dedup, the de-skewed two-phase marking: hot
    grams collapse MAP-SIDE in a partial-aggregated groupBy(gram)
    (never a count() window partitioned by gram, which must buffer
    every occurrence of a corpus-hot boilerplate gram in one
    partition), then a semi-join streams the marking back; the only
    Window nodes are the per-document span merge."""
    plan = plan_of(SPECS["dedup_substring_spans"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # no window partitioned on the gram column — the skew cell
    assert not re.search(r"windowspecdefinition\(gram", plan)
    assert "LeftSemi" in plan
    # the dup-gram set is the aggregate output: partial agg upstream
    # of its exchange (map-side combine collapses hot grams per task)
    assert "hashpartitioning(gram" in plan


def test_semdedup_codebook_broadcast(spark, sf_dir):
    """SemDeDup: the assignment (corpus x broadcast codebook) is
    materialized once behind a localCheckpoint (its blocks are
    ContextCleaner-reclaimed when callers drop the result — no cache
    leak in the long-lived service session), so the visible plan is
    the downstream duplicate scan: a CLUSTER-KEYED self-join over the
    checkpointed assignment, never a cartesian."""
    plan = plan_of(SPECS["dedup_semdedup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # nothing unbounded left
    assert "Scan ExistingRDD" in plan            # checkpointed assignment
    assert "cl_a" in plan or "cluster" in plan   # keyed self-join


def test_semdedup_kmeans_codebook_is_k_bounded(spark, sf_dir):
    """The production SemDeDup path: the k-means|| codebook has
    EXACTLY k rows regardless of corpus size (vs the every-40th rule
    whose broadcast grows O(n/40)), so the assignment broadcast is
    k-bounded — the 100 TB contract of operators/dedup.semdedup_kmeans."""
    from geohub_data_pipeline_spark.operators.similarity import lloyd_kmeans
    from geohub_data_pipeline_spark.plans.llm import _vecs

    vecs = _vecs(spark, sf_dir)
    _, cents = lloyd_kmeans(vecs.select("vec_id", "vec"), k=8,
                            iters=1, init="parallel")
    assert cents.count() == 8              # == k, not O(corpus)
    # and doubling the corpus leaves the codebook size unchanged
    big = vecs.unionByName(
        vecs.withColumn("vec_id", F.col("vec_id") + 100000))
    _, cents2 = lloyd_kmeans(big.select("vec_id", "vec"), k=8,
                             iters=1, init="parallel")
    assert cents2.count() == 8


def test_nearest_join_no_cartesian(spark, sf_dir):
    """k-NN spatial join: one tile-hash join (never a cartesian /
    nested loop over |points| x |sites|) + the per-point rank
    window."""
    plan = plan_of(SPECS["spatial_join_nearest"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(point_id" in plan       # rank window key


def test_dsir_bucket_table_broadcasts(spark, sf_dir):
    """DSIR per-token scoring joins the <=256-row bucket-llr table
    with a BROADCAST hash join — the token stream never shuffles on
    bucket; the only data shuffle is the per-doc fold."""
    plan = plan_of(SPECS["text_dsir_weights"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the per-token scoring join must never sort-merge the token
    # stream on bucket (the bucket-count partial agg may hash its
    # own 256-group exchange — that's map-side-combined and tiny)
    assert "SortMergeJoin" not in plan


def test_q6_all_predicates_reach_scan(spark, sf_dir):
    """TPC-H Q6 is a pure scan-filter-aggregate: every predicate
    (date window, discount band, quantity cap) pushes to the parquet
    scan and no join/window appears anywhere."""
    plan = plan_of(SPECS["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan
    assert "Join" not in plan and "Window" not in plan


def test_q7_nation_dims_broadcast(spark, sf_dir):
    """Q7's two 25-row nation dims broadcast; the fact is never
    nested-looped."""
    plan = plan_of(SPECS["q7_volume_shipping"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q18_having_filter_is_semi_join(spark, sf_dir):
    """Q18's HAVING subquery lands as a LEFT SEMI join on the order
    key — the qualifying-order list never multiplies fact rows."""
    plan = plan_of(SPECS["q18_large_orders"].fn(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q4_exists_is_semi_join_with_pushed_window(spark, sf_dir):
    """Q4's EXISTS compiles to a LEFT SEMI join and the order-date
    window pushes to the orders scan."""
    plan = plan_of(SPECS["q4_order_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q14_part_broadcasts(spark, sf_dir):
    plan = plan_of(SPECS["q14_promo_effect"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Round-8 TPC-H closure plan shapes (Q2/Q13/Q16/Q20/Q21/Q22)
# ---------------------------------------------------------------------------

def test_q2_correlated_min_is_window_not_self_join(spark, sf_dir):
    """Q2's correlated MIN subquery compiles to a window min over
    the region-filtered relation — one exchange, no second scan of
    the part-supplier relation, dims broadcast."""
    plan = plan_of(SPECS["q2_min_cost_supplier"].fn(spark, sf_dir))
    assert "Window" in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q13_left_join_preserves_zero_bucket(spark, sf_dir):
    """Q13 keeps customers with no orders: the join is LEFT OUTER
    (never inner), and the priority exclusion sits join-side."""
    plan = plan_of(SPECS["q13_order_distribution"].fn(spark, sf_dir))
    assert "LeftOuter" in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    """Q16's NOT IN exclusion compiles to a broadcast LEFT ANTI
    join, not a nested-loop null-semantics expansion (the subquery
    is provably non-null)."""
    plan = plan_of(SPECS["q16_supplier_part_count"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_nested_in_is_semi_join_chain(spark, sf_dir):
    """Q20's nested INs land as semi-joins: part filter prunes
    lineitem BEFORE the HAVING aggregate, qualifying suppliers
    semi-join the supplier dim."""
    plan = plan_of(SPECS["q20_excess_shipments"].fn(spark, sf_dir))
    assert plan.count("LeftSemi") >= 2
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_q21_exists_pair_is_single_aggregate(spark, sf_dir):
    """Q21's EXISTS + NOT EXISTS pair rewrites to ONE per-order
    aggregate joined back — no correlated rescans, so the lineitem
    fact appears in at most two scans (late relation + aggregate),
    never three."""
    plan = plan_of(SPECS["q21_waiting_suppliers"].fn(spark, sf_dir))
    assert plan.count("FileScan parquet") <= 5     # 2x lineitem+orders, 1 dims
    assert "CartesianProduct" not in plan


def test_q22_scalar_avg_broadcasts(spark, sf_dir):
    """Q22's scalar AVG threshold is a 1-row broadcast (nested-loop
    on a singleton is the correct physical form) and the NOT EXISTS
    is an anti-join on custkey."""
    plan = plan_of(SPECS["q22_global_sales_opportunity"].fn(spark, sf_dir))
    assert "LeftAnti" in plan


def test_pagerank_no_cartesian_and_edges_hash_once(spark, sf_dir):
    """r9: fixed-point PageRank — every iteration is hash joins +
    hash aggregates; no cartesian/nested-loop anywhere in the
    3-iteration plan."""
    plan = plan_of(SPECS["graph_pagerank"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skyline_no_self_join(spark, sf_dir):
    """r9: the two-phase skyline never joins the relation against
    itself — the plan is scan -> window (per-partition) -> window
    (merge), with zero Join operators of any kind."""
    plan = plan_of(SPECS["skyline_pareto"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan          # no join operator at all
    assert plan.count("Window") >= 2   # local + final phase


def test_sparse_cosine_df_table_broadcast(spark, sf_dir):
    """r9: the df-band vocabulary joins back as a BROADCAST (the
    vocab is tiny relative to postings) and the pair generation is a
    hash join on the term key — never a cartesian."""
    plan = plan_of(SPECS["dedup_sparse_cosine"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_scd2_update_batch_broadcast_history_unshuffled(spark, sf_dir):
    """r9: SCD2 merge broadcasts the update batch against the open
    slice; no sort-merge exchange on the dimension."""
    plan = plan_of(SPECS["scd2_merge_dimension"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_table_diff_single_full_outer_hash_join(spark, sf_dir):
    """r9: snapshot diff is ONE full-outer join on the key — hash or
    sort-merge by size, never nested-loop."""
    plan = plan_of(SPECS["table_diff_snapshots"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("FullOuter" in plan) or ("full_outer" in plan.lower())


def test_readability_is_scan_only(spark, sf_dir):
    """text_readability is a pure projection: no Exchange anywhere
    (the final orderBy is the harness's presentation sort — ignore
    its range exchange by checking the pre-sort child)."""
    df = SPECS["text_readability"].fn(spark, sf_dir)
    plan = plan_of(df)
    # exactly the presentation sort's range exchange, nothing keyed
    assert "Exchange hashpartitioning" not in plan
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    read_cols = {c.split(":")[0] for c in schema.split(",") if ":" in c}
    assert read_cols <= {"doc_id", "text"}        # column pruning


def test_interval_overlap_shuffles_on_user_keys_only(spark, sf_dir):
    """events_interval_overlap: both aggregations combine map-side
    and shuffle on user-derived keys; no join, no cartesian."""
    plan = plan_of(SPECS["events_interval_overlap"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan                      # implicit window set
    assert plan.count("Exchange hashpartitioning") <= 2


def test_collocations_no_position_self_join(spark, sf_dir):
    """text_collocations_dice builds bigrams with transform() over
    the token array — one scan, no token-position self-join; the
    only joins are the two vocabulary-keyed count joins."""
    plan = plan_of(SPECS["text_collocations_dice"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # two joins against the unigram count relation, none other
    # (each join node prints twice: tree + details section)
    joins = re.findall(
        r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", plan)
    assert len(joins) <= 4, joins


def test_theta_sketch_shuffle_is_sketch_rows_only(spark, sf_dir):
    """agg_theta_sketch_setops runs before plan capture (it drives
    jobs internally); assert its OUTPUT is the 5 verdict rows with
    all tolerances met — the plan property (partitions x k longs,
    never data) is pinned by the operator contract test in
    test_sketch.py."""
    rows = (SPECS["agg_theta_sketch_setops"].fn(spark, sf_dir)
            .collect())
    assert len(rows) == 5
    assert all(r.within_tol for r in rows)


def test_txlog_snapshot_scan_is_pruned_to_one_file(spark, tmp_path):
    """The key-range snapshot read plans a parquet scan over ONLY the
    surviving file — file skipping happens before Spark ever sees the
    table, so the physical plan contains one scan of one directory
    and no filter on the pruned files."""
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators import txlog as TX

    path = str(tmp_path / "t")
    df = spark.range(100).select(F.col("id").alias("k"),
                                 (F.col("id") * 3).alias("v"))
    TX.write_version(df, path, (F.col("k") / 25).cast("int"), 4, "k",
                     prefix="v0")
    pruned = TX.read_snapshot(spark, path, key_min=0, key_max=24)
    plan = plan_of(pruned)
    # exactly one __b=<n> location in the scan
    assert plan.count("__b=") == 1, plan


def test_geodesic_buffer_has_no_shuffle(spark, sf_dir):
    """Buffering is a stateless Arrow kernel over the scan — the plan
    up to the ring rows carries NO Exchange."""
    from geohub_data_pipeline_spark.operators import geodesic as GE
    from geohub_data_pipeline_spark.plans.pipeline import _geobuf_points

    rings = GE.buffer_points(_geobuf_points(spark, sf_dir),
                             100_000.0, 16)
    plan = plan_of(rings)
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan


def test_crs_coverage_probe_is_metadata_sized(spark, sf_dir):
    """The coverage fixture is the distinct-code DOMAIN, not data:
    ~5k rows regardless of SF, one band aggregation."""
    from geohub_data_pipeline_spark.plans.pipeline import (
        _coverage_probe_codes,
    )
    codes = _coverage_probe_codes()
    assert 4000 < len(codes) < 8000
    plan = plan_of(SPECS["crs_coverage_boundary"].fn(spark, sf_dir))
    # probe repartition + agg + final orderBy range exchange (the
    # formatted plan prints each node twice: tree line + detail)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3, plan


def test_delete_where_reads_only_touched_files(spark, tmp_path):
    """A pure key-range DELETE plans NO read at all for wholly-covered
    files (log-action drop) — the rewrite scan covers only the
    straddling file's directory."""
    from pyspark.sql import functions as F

    from geohub_data_pipeline_spark.operators import txlog as TX

    path = str(tmp_path / "t")
    df = spark.range(100).select(F.col("id").alias("k"),
                                 (F.col("id") * 3).alias("v"))
    TX.write_version(df, path, (F.col("k") / 25).cast("int"), 4, "k",
                     prefix="v0")
    r = TX.delete_where(spark, path, key_min=25, key_max=60)
    assert (r["skipped"], r["dropped"], r["rewritten"]) == (2, 1, 1)
    # the post-delete snapshot holds the 2 untouched v0 files + 1
    # rewritten file; the dropped file left no new data behind
    active = {a["path"] for a in TX.snapshot_actions(path)}
    assert len(active) == 3
    assert sum(p.endswith(("__b=0", "__b=3")) and "/v0/" in p
               for p in active) == 2


def test_bm25_filters_postings_before_shuffle(spark, sf_dir):
    """Only the query terms' postings reach the tf aggregation: the
    isin filter sits UNDER the first Exchange, so scoring cost is
    O(query-term postings), not O(corpus vocabulary)."""
    from geohub_data_pipeline_spark.operators import curation as C
    from geohub_data_pipeline_spark.plans._util import load_tables

    t = load_tables(spark, sf_dir)
    top = C.bm25_topk(t.documents, ["window", "merge"], k=5)
    plan = plan_of(top)
    assert "IN (window,merge)" in plan.replace("'", ""), plan
    # df-per-term join is broadcast (vocabulary-sized side)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
