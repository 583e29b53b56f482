#!/usr/bin/env python
"""Scheduling-floor profile for the five >2x-vs-DuckDB gate queries
(r7 verdict next #6 'done' criterion, floor-profile branch).

For each query: one warm run, then a timed run whose job/stage/task
timeline is read back from the Spark status REST API.  The claim
under test: the gap to the DuckDB baseline is per-stage scheduling
floor (job/stage launch + task dispatch), not plan work — i.e. the
sum of actual executor task CPU is a small fraction of the wall, and
the per-stage overhead (stage wall minus max task runtime) accounts
for the rest.

Prints one line per query:
  <name> wall=<ms> stages=<n> task_cpu=<ms> max_task_path=<ms>
         sched_floor=<ms> (<pct>% of wall)
where task_cpu = sum of executorRunTime over all tasks,
max_task_path = sum over stages of the stage's slowest task (the
critical path if dispatch were free), and sched_floor = wall -
max_task_path.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402

QUERIES = ["window_rank", "set_intersect", "dedup_exact_keep_first",
           "join_multiway_broadcast", "tile_aggregation"]


def _api(spark, path: str):
    url = (f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
           f"{spark.sparkContext.applicationId}/{path}")
    return json.loads(urllib.request.urlopen(url).read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # UI ON (the status REST API is the measurement instrument);
    # otherwise the bench session's tiny-input policy
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("floor-probe")
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.sql.shuffle.partitions",
                     os.environ.get("SPARK_GRAFT_PROBE_PARTS", "1"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    sc = spark.sparkContext
    for name in QUERIES:
        df = specs[name].fn(spark, sf_dir)
        df.count()                                   # warm
        sc.setJobGroup(name, name)
        before = {j["jobId"] for j in _api(spark, "jobs")}
        t0 = time.time()
        df.count()
        wall = (time.time() - t0) * 1000
        jobs = [j for j in _api(spark, "jobs")
                if j["jobId"] not in before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        task_cpu = 0.0
        max_task_path = 0.0
        n_stages = 0
        for sid in stage_ids:
            try:
                stages = _api(spark, f"stages/{sid}")
            except Exception:
                continue
            for st in stages:
                if st["status"] not in ("COMPLETE", "ACTIVE"):
                    continue
                n_stages += 1
                task_cpu += st.get("executorRunTime", 0)
                tasks = _api(
                    spark, f"stages/{sid}/{st['attemptId']}/taskList"
                           f"?length=1000")
                if tasks:
                    max_task_path += max(
                        t.get("duration", 0) for t in tasks)
        floor = wall - max_task_path
        print(f"{name:26s} wall={wall:6.0f}ms stages={n_stages} "
              f"task_cpu={task_cpu:6.0f}ms "
              f"max_task_path={max_task_path:6.0f}ms "
              f"sched_floor={floor:6.0f}ms "
              f"({100 * floor / wall:.0f}% of wall)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
