#!/usr/bin/env python
"""Capture .explain("formatted") for the bench headline + geo queries.

Usage: python scripts/capture_plans.py <suffix> [query ...]

Writes plans/r11/<query>_<suffix>.txt for each query (default: the
bench HEADLINE + GEO_HEADLINE sets).  Plans are captured under the
same conf regime the bench's sf1 suite runs with (AQE on,
input-proportional shuffle partitions) against the gate-SF data dir,
so a plan diff between <suffix>=before and <suffix>=after reflects
exactly what the timed suite executes.  explain() does not execute
the plan, so this is cheap and safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geohub_data_pipeline_spark.session import get_session  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (bench.HEADLINE + bench.GEO_HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("capture-plans")
    # Mirror the bench's data-proportional (sf1) regime: AQE on,
    # input-sized shuffle partitions (bench.run_suite non-tiny branch).
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(bench._sized_shuffle_partitions(sf_dir, cpus)))

    specs = all_queries()
    for n in names:
        if n not in specs:
            print(f"-- unknown query {n}, skipped", file=sys.stderr)
            continue
        try:
            df = specs[n].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{n}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as ex:
            print(f"-- {n} failed: {ex}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
