#!/usr/bin/env python
"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice: a warm-up that triggers JIT/codegen and
file-footer caching, then the timed run (count() forces full execution
without driver-side materialization of results).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402

# Headline set: one per operator family, heaviest variants.
HEADLINE = [
    "q1_pricing_summary",
    "join_multiway_broadcast",
    "join_range_theta",
    "agg_cube",
    "window_rank",
    "topk_per_group",
    "set_intersect",
    "dedup_minhash_lsh",
    "dedup_pipeline_verified",
    "dedup_exact_keep_first",
    "ann_cosine_topk",
    "text_quality_score",
    "text_fingerprint",
    "lateral_explode_top_words",
    "events_sessionization",
    "events_sliding_window",
    "asof_join_events",
    "subquery_above_avg",
    "tile_aggregation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs]

    # Warm-up: JVM JIT, parquet footers, broadcast machinery.
    for n in names:
        try:
            specs[n].fn(spark, sf_dir).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    total = 0.0
    for n in names:
        best = float("inf")
        for _ in range(2):          # best-of-2: damp scheduler jitter
            t0 = time.time()
            specs[n].fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        dt = round(best, 3)
        timings[n] = dt
        total += dt

    print(json.dumps({
        "metric": "headline_suite_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
