#!/usr/bin/env python
"""A/B the non-tiny scan-split floor (spark.sql.files.openCostInBytes).

Round-11 change #4 lowered the floor to 256 KB for the data-proportional
suites so compute-heavy scans of small-in-bytes tables split to ~cores
tasks; the same record showed floor-bound small queries regressing
(dedup_exact_keep_first +303% at sf3).  This probe times each query at
sf3 under both floors, interleaved A/B/A/B within one session so box
drift cancels, using the bench's own methodology (plan built once,
warm pass, median of N count() runs).

Usage: python scripts/probe_opencost.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402
import bench  # noqa: E402

QUERIES = [
    # regressed in the r11 record (floor-bound, small tables)
    "dedup_exact_keep_first", "tile_aggregation", "events_sliding_window",
    "subquery_above_avg", "lateral_explode_top_words", "asof_join_events",
    "events_sessionization",
    # the compute-heavy wins the 256k floor was added for (guard: must
    # not regress when we re-tune)
    "dedup_minhash_lsh", "text_fingerprint", "dedup_pipeline_verified",
]


def time_query(spark, fn, sf_dir, open_cost, reps=5, warm=2):
    spark.conf.set("spark.sql.files.openCostInBytes", str(open_cost))
    df = fn(spark, sf_dir)
    for _ in range(warm):
        df.count()
    runs = []
    for _ in range(reps):
        t0 = time.time()
        df.count()
        runs.append(time.time() - t0)
    return statistics.median(runs)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchdata", "sf3")
    names = sys.argv[2:] or QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("probe-opencost")
    # bench non-tiny regime
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(bench._sized_shuffle_partitions(sf_dir, cpus)))
    specs = all_queries()
    out = {}
    for n in names:
        fn = specs[n].fn
        spark.sparkContext.setJobDescription(f"probe {n}")
        a1 = time_query(spark, fn, sf_dir, 4 << 20)
        b1 = time_query(spark, fn, sf_dir, 256 << 10)
        a2 = time_query(spark, fn, sf_dir, 4 << 20)
        b2 = time_query(spark, fn, sf_dir, 256 << 10)
        r = {"4m": round(min(a1, a2), 3), "256k": round(min(b1, b2), 3)}
        out[n] = r
        print(f"{n:28s} 4m={r['4m']:7.3f}  256k={r['256k']:7.3f}",
              flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
