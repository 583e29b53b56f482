#!/usr/bin/env python
"""Measure plan-BUILD time (fn call) vs EXECUTE time for the bench
headline + geo queries, and count the Spark jobs each build runs.

A query whose fn() triggers jobs computes eagerly at prepare time —
the bench's prepared-statement model then times only the residual
read-back, which understates the query.  Output: per query, build
seconds, jobs run during build, and first-execute seconds.

Usage: python scripts/probe_eager_build.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402
import bench  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("probe-eager-build")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    specs = all_queries()
    for n in bench.HEADLINE + bench.GEO_HEADLINE:
        if n not in specs:
            continue
        jobs0 = len(tracker.getJobIdsForGroup() or [])
        t0 = time.time()
        df = specs[n].fn(spark, sf_dir)
        t1 = time.time()
        jobs1 = len(tracker.getJobIdsForGroup() or [])
        df.count()
        t2 = time.time()
        print(f"{n:28s} build={t1-t0:6.2f}s jobs_in_build={jobs1-jobs0:3d} "
              f"first_exec={t2-t1:6.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
