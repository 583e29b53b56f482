#!/usr/bin/env python
"""DuckDB side of the benchmark: run each headline query's ORACLE SQL
on the same parquet dir and report best-of-3 timings — the measured
baseline bench.py is compared against.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bench_duckdb.py
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import GEO_HEADLINE, HEADLINE  # noqa: E402
from geohub_data_pipeline_spark.plans import all_queries  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    specs = all_queries()

    def run(names):
        timings: dict[str, float] = {}
        total = 0.0
        for n in names:
            spec = specs.get(n)
            if spec is None or spec.sql is None:
                continue
            try:
                con.execute(spec.sql).fetchall()      # warm-up
            except Exception as ex:
                print(f"-- {n} failed: {ex}", file=sys.stderr)
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                con.execute(spec.sql).fetchall()
                best = min(best, time.time() - t0)
            timings[n] = round(best, 3)
            total += timings[n]
        return timings, total

    timings, total = run(HEADLINE)
    geo_timings, geo_total = run(GEO_HEADLINE)
    print(json.dumps({
        "metric": "duckdb_oracle_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "geo": {"value": round(geo_total, 3), "queries": geo_timings},
    }))


if __name__ == "__main__":
    main()
