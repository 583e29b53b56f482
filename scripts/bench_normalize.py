"""A/B throughput harness for the T7 normalize_features kernel.

Synthetic workload: UTM-32633 polygons (64 vertices each) + points,
2 layers x N features — the shape of a real vector upload that needs
the reproject path.  Prints features/sec for the full
normalize_features stage (parse -> reproject -> promote -> bbox) on
one local session.  Used for the PERF.md vectorization A/B.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def main(n_features: int = 20_000) -> None:
    from pyspark.sql import SparkSession

    from geohub_data_pipeline_spark.operators import geometry as G

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("bench-normalize").getOrCreate())

    rows = []
    for i in range(n_features):
        cx = 400000.0 + (i % 500) * 200.0
        cy = 5200000.0 + (i // 500) * 200.0
        if i % 3 == 0:
            wkb = G.wkb_point(cx, cy)
        else:
            ring = [(cx + 80.0 * math.cos(2 * math.pi * k / 64),
                     cy + 80.0 * math.sin(2 * math.pi * k / 64))
                    for k in range(64)]
            ring.append(ring[0])
            wkb = G.wkb_polygon([ring])
        rows.append(("bench", "layer_a" if i % 2 else "layer_b",
                     i, wkb, 32633))
    feats = spark.createDataFrame(
        rows, "dataset string, layer string, fid long, "
              "geometry binary, srid int").repartition(8)
    feats.write.mode("overwrite").parquet("/tmp/bench_norm_src")
    feats = spark.read.parquet("/tmp/bench_norm_src")

    # warm-up (JVM + python workers)
    G.normalize_features(feats.limit(500)).count()

    t0 = time.time()
    out = G.normalize_features(feats).count()
    dt = time.time() - t0
    print(f"normalize_features: {out} features in {dt:.2f}s "
          f"= {out / dt:,.0f} features/s")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000)
