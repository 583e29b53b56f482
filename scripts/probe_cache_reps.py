#!/usr/bin/env python
"""Check whether any headline query's timed reps hit the Spark cache.

The bench times each query as median-of-5 count() calls on ONE
DataFrame.  An operator that .cache()es an intermediate makes rep 1
materialize it and reps 2-5 read it back — the median would then
measure cache reads, not the declared computation.  This probe runs
each query twice and reports (first, second) wall times plus whether
the second executed plan contains InMemoryTableScan.

Usage: python scripts/probe_cache_reps.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchdata", "sf3")
    names = sys.argv[2:] or ["dedup_minhash_lsh", "dedup_pipeline_verified"]
    spark = get_session("probe-cache")
    specs = all_queries()
    for n in names:
        df = specs[n].fn(spark, sf_dir)
        t0 = time.time(); df.count(); t1 = time.time()
        df.count(); t2 = time.time()
        plan = df._jdf.queryExecution().executedPlan().toString()
        hit = "InMemoryTableScan" in plan
        print(f"{n:28s} rep1={t1-t0:6.2f}s rep2={t2-t1:6.2f}s "
              f"InMemoryTableScan={hit}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
