#!/usr/bin/env python
"""Run a subset of the bench suite via bench.run_suite (same protocol)
on a given sf dir: python scripts/probe_suite_subset.py <sf_dir> q1 q2...
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from geohub_data_pipeline_spark.session import get_session  # noqa: E402


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    steal0 = bench._read_steal()
    timings, iqrs, total, skipped, _wide = bench.run_suite(
        spark, sf_dir, cpus, names=names,
        warm_passes=int(os.environ.get("PROBE_WARM", "2")))
    steal1 = bench._read_steal()
    steal = (round(100 * (steal1[0] - steal0[0])
                   / max(1, steal1[1] - steal0[1]), 2)
             if steal0 and steal1 else None)
    print(json.dumps({"sf_dir": sf_dir, "total": round(total, 3),
                      "queries": timings, "iqrs": iqrs,
                      "skipped": skipped, "steal_pct": steal}))
    spark.stop()


if __name__ == "__main__":
    main()
