#!/usr/bin/env python
"""Measure the driver-looped iterative registry queries: wall-clock
and Spark JOB COUNT per query (build + one execution), the
job-dispatch-floor evidence for the r12 in-task fixpoint work.

Each query runs under its own job group; the group's job count is the
number of synchronous driver round-trips the query pays — the thing
the in-task fixpoint collapses (guide §1.2, §2; the r11 halo-engine
change-17 pattern).

Usage: python scripts/probe_iterative_jobs.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402

DEFAULT = [
    "graph_bfs_hops",
    "graph_sssp_weighted",
    "graph_kcore",
    "graph_label_propagation",
    "graph_pagerank",
    "dedup_cluster_canonical",
    "dedup_cluster_altcc",
    "geo_line_merge",
    "text_quality_classifier",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    spark = get_session("probe-iterative")
    sc = spark.sparkContext
    specs = all_queries()
    print(f"-- sf_dir={sf_dir}")
    for name in names:
        if name not in specs:
            print(f"{name}: NOT REGISTERED")
            continue
        sc.setJobGroup(name, name)
        t0 = time.time()
        try:
            df = specs[name].fn(spark, sf_dir)
            t_build = time.time() - t0
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.time() - t1
        except Exception as ex:
            print(f"{name}: FAILED {str(ex).splitlines()[0][:120]}")
            sc.setJobGroup(None, None)
            continue
        jobs = len(sc.statusTracker().getJobIdsForGroup(name))
        sc.setJobGroup(None, None)
        print(f"{name}: build={t_build:.2f}s exec={t_exec:.2f}s "
              f"total={t_build + t_exec:.2f}s jobs={jobs}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
