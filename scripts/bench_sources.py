"""Round-5 source-format throughput probe (PERF.md evidence).

Generates the SAME 300k-point dataset as a CSV and as newline-
delimited GeoJSON, then measures features/s through each source
route, plus the substring-dedup and SemDeDup operators at sf0.1.
Run: python scripts/bench_sources.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    from pyspark.sql import SparkSession

    from geohub_data_pipeline_spark.session import get_session

    spark = get_session(master="local[8]")

    d = tempfile.mkdtemp(prefix="srcbench_")
    csv_path = os.path.join(d, "pts.csv")
    gjl_path = os.path.join(d, "pts.geojsonl")
    with open(csv_path, "w") as fc, open(gjl_path, "w") as fg:
        fc.write("name,lat,lon,score\n")
        for i in range(n):
            lon = -170.0 + (i * 7 % 3400) / 10.0
            lat = -80.0 + (i * 3 % 1600) / 10.0
            fc.write(f"p{i},{lat},{lon},{i % 100}\n")
            fg.write(json.dumps({
                "type": "Feature", "id": i,
                "geometry": {"type": "Point",
                             "coordinates": [lon, lat]},
                "properties": {"name": f"p{i}", "score": i % 100},
            }) + "\n")

    from geohub_data_pipeline_spark.sources.csvpoints import (
        features_from_csv,
    )
    from geohub_data_pipeline_spark.sources.geojsonseq import (
        features_from_geojsonseq,
    )

    results = {}
    for label, fn, path in (
            ("csv_points", features_from_csv, csv_path),
            ("geojsonseq", features_from_geojsonseq, gjl_path)):
        fn(spark, path).count()            # warm (JIT + file cache)
        t0 = time.perf_counter()
        cnt = fn(spark, path).count()
        dt = time.perf_counter() - t0
        results[label] = (cnt, dt, cnt / dt)

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from geohub_data_pipeline_spark.plans import all_queries
    for q in ("dedup_substring_spans", "dedup_semdedup"):
        spec = all_queries()[q]
        t0 = time.perf_counter()
        cnt = spec.fn(spark, sf).count()
        dt = time.perf_counter() - t0
        results[q] = (cnt, dt, cnt / dt)

    for k, (cnt, dt, rate) in results.items():
        print(f"{k:24s} rows={cnt:>8d} wall={dt:7.2f}s "
              f"rate={rate:>10.0f} rows/s")
    spark.stop()


if __name__ == "__main__":
    main()
