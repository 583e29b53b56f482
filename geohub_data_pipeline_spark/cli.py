"""Offline CLI entry point (EP2 analog).

Reference: ``/root/reference/ingest/cli/main.py:18-40`` — argparse
(-src, -dst, -j join-tiles, -d debug) driving ``process_geo_file``
directly with no Azure/queue.  Spark restatement: a plain batch job
over a local (or any Hadoop-visible) source path running the same
dataflow stages the streaming service uses per micro-batch.

Usage:
    python -m geohub_data_pipeline_spark.cli \
        --src /path/features.parquet --dst /path/out [--join-tiles]
        [--maxzoom N] [--sf-dir DIR --demo]

``--demo`` runs the registry's flagship query against --sf-dir instead
(a smoke entry that needs no geospatial input).
"""

from __future__ import annotations

import argparse
import sys

from geohub_data_pipeline_spark.session import get_session


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="geohub-data-pipeline-spark")
    ap.add_argument("--src", help="input feature parquet "
                    "(dataset/layer/fid/geometry/srid columns)")
    ap.add_argument("--dst", help="output directory for tiles + audits")
    ap.add_argument("--join-tiles", action="store_true",
                    help="multilayer joined mode (T9)")
    ap.add_argument("--maxzoom", type=int, default=None,
                    help="fixed max zoom (default: -zg heuristic)")
    ap.add_argument("--demo", action="store_true",
                    help="run the flagship query on --sf-dir instead")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--serve", metavar="BASE_DIR",
                    help="run the streaming ingest service over "
                         "BASE_DIR/{msgs,cancel} until drained (EP1)")
    args = ap.parse_args(argv)

    spark = get_session("geohub-cli")
    try:
        if args.serve:
            from geohub_data_pipeline_spark.streaming.service import (
                IngestService,
            )

            base = args.serve.rstrip("/")
            svc = IngestService(
                spark=spark,
                messages_dir=f"{base}/msgs",
                ledger_dir=f"{base}/ledger",
                checkpoint_dir=f"{base}/ckpt",
                cancel_dir=f"{base}/cancel",
            )
            svc.run_available_now()
            ledger = svc.ledger()
            counts = {r["stage"]: r["count"] for r in
                      ledger.groupBy("stage").count().collect()}
            print(f"ledger rows: {ledger.count()}; stages: {counts}")
            return 0

        if args.demo:
            from geohub_data_pipeline_spark.plans import all_queries
            df = all_queries()["q1_pricing_summary"].fn(spark, args.sf_dir)
            for row in df.collect():
                print(row)
            return 0

        if not args.src or not args.dst:
            ap.error("--src and --dst are required (or use --demo)")

        from geohub_data_pipeline_spark.operators import geometry as G
        from geohub_data_pipeline_spark.operators import tiling as TLG

        from pyspark.sql import functions as F

        from geohub_data_pipeline_spark.operators import pmtiles as PMT

        feats = spark.read.parquet(args.src)
        norm = G.normalize_features(feats)
        tiles = TLG.build_tiles(norm, maxzoom=args.maxzoom,
                                simplify_low_zooms=True, encode="mvt")
        tiles.write.mode("overwrite").partitionBy("z").parquet(
            f"{args.dst}/tiles")
        tiles_back = spark.read.parquet(f"{args.dst}/tiles")
        TLG.tile_audit(tiles_back) \
            .write.mode("overwrite").parquet(f"{args.dst}/tile_audit")
        G.feature_count_audit(feats, norm, ["dataset", "layer"]) \
            .write.mode("overwrite").parquet(f"{args.dst}/feature_audit")
        manifest = PMT.write_pmtiles_tables(
            tiles_back.withColumn("dataset", F.lit("output")),
            f"{args.dst}/archives", payload_format="mvt").collect()
        n = tiles_back.count()
        for m in manifest:
            print(f"archive: {m.path} ({m.n_tiles} tiles, "
                  f"{m.n_layers} layers, z{m.min_zoom}-{m.max_zoom})")
        print(f"wrote {n} tiles to {args.dst}/tiles")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
