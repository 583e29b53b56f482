"""Per-round shuffle-bytes probe for the iterative raster operators
(r7 brief #1 'done' criterion): run cost_distance on a 1M-px DEM and
report, from the Spark status REST API, the shuffle WRITE bytes of
every stage — the strips-only exchange should be ~1.5% of state, not
~1x state per round (the r6 measured reality of the DataFrame loop).

Usage: python scripts/probe_halo_shuffle.py [flow]
"""
import json
import os
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from geohub_data_pipeline_spark.operators import raster as R

    n, b = 1024, 256                      # 1M px, 4x4 blocks
    rng = np.random.RandomState(11)
    base = rng.rand(n, n) * 9.0 + 1.0     # costs in [1, 10)
    rows = []
    for by in range(0, n, b):
        for bx in range(0, n, b):
            t = base[by:by + b, bx:bx + b]
            rows.append(("dem", None, 1, 0, bx // b, by // b, b, b,
                         t.ravel().tolist(), None, 4326))
    blocks = spark.createDataFrame(rows, R.BLOCK_SCHEMA)

    t0 = time.time()
    if len(sys.argv) > 1 and sys.argv[1] == "flow":
        dirs = R.flow_direction(blocks, border="clamp")
        out = R.flow_accumulation(dirs)
        label = "flow_accumulation(1M px)"
    else:
        sources = spark.createDataFrame([(5, 5)], "row long, col long")
        out = R.cost_distance(blocks, sources, diagonal=True)
        label = "cost_distance(1M px, corner source)"
    n_px = out.count()
    wall = time.time() - t0

    api = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/" \
          f"{spark.sparkContext.applicationId}/stages"
    stages = json.loads(urllib.request.urlopen(api).read())
    state_bytes = n * n * 8 * 2           # cost + dist float64
    shuffled = sorted(
        (s for s in stages if s.get("shuffleWriteBytes", 0) > 0),
        key=lambda s: s["stageId"])
    total = sum(s["shuffleWriteBytes"] for s in shuffled)
    print(f"{label}: {n_px} blocks out, {wall:.1f}s wall")
    print(f"state size (cost+dist f64): {state_bytes/1e6:.1f} MB")
    print(f"shuffle-writing stages: {len(shuffled)}; "
          f"total shuffle write {total/1e6:.2f} MB "
          f"({100.0*total/state_bytes:.2f}% of ONE state copy, "
          f"across ALL rounds)")
    for s in shuffled:
        print(f"  stage {s['stageId']:>4} {s['name'][:40]:40} "
              f"{s['shuffleWriteBytes']/1e3:10.1f} kB")
    spark.stop()


if __name__ == "__main__":
    main()
