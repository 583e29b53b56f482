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
    ap.add_argument("--point-drop-rate", type=float, default=None,
                    help="tippecanoe-style point dropping gamma "
                         "(e.g. 2.5): keep 1/rate^(maxzoom-z) of "
                         "points at each zoom below maxzoom, "
                         "deterministically by feature hash")
    ap.add_argument("--demo", action="store_true",
                    help="run the flagship query on --sf-dir instead")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--serve", metavar="BASE_DIR",
                    help="run the streaming ingest service over "
                         "BASE_DIR/{msgs,cancel} until drained (EP1)")
    ap.add_argument("--backfill", metavar="BASE_DIR",
                    help="EP3: scan BASE_DIR's {user}/datasets trees "
                         "and regenerate missing .fgb companions "
                         "from {user}/raw uploads")
    ap.add_argument("--decode-pmtiles", metavar="ARCHIVE",
                    help="re-ingest a PMTiles archive: decode its "
                         "max-zoom MVT tiles back into feature rows "
                         "(operators/mvt.py) and write GeoParquet-"
                         "style feature parquet under --dst; a "
                         "feature CLIPPED across several max-zoom "
                         "tiles decodes as one fragment row per "
                         "tile (same fid)")
    ap.add_argument("--curate", metavar="DOCS_PARQUET",
                    help="run the corpus-curation pipeline (exact dedup "
                         "-> LSH near-dup clusters -> repetition filter "
                         "-> train/val split -> shard manifest) over a "
                         "(doc_id, text) parquet; writes to --dst")
    ap.add_argument("--shard-tokens", type=int, default=20_000,
                    help="token capacity per training shard")
    ap.add_argument("--raster", metavar="SRC",
                    help="raster ingest (T11): .tif/.tiff (full pixel "
                         "decode), .asc/.grd/.aig/.sgr, classic .nc, "
                         ".nc4/.h5 (HDF5), Erdas raw (.raw/.bl), or a "
                         ".zip/.tar/.7z of any of these -> "
                         "WebMercatorQuad warp -> overview cascade -> "
                         "validated COGs in --dst")
    ap.add_argument("--overview-levels", type=int, default=2,
                    help="overview pyramid rounds for --raster")
    ap.add_argument("--no-warp", action="store_true",
                    help="skip the WebMercatorQuad warp (keep the "
                         "source grid; the reference always warps)")
    ap.add_argument("--cog-dtype", default="auto",
                    choices=["auto", "u1", "u2", "u4", "i1", "i2",
                             "i4", "f4", "f8"],
                    help="COG sample type; 'auto' (default) preserves "
                         "the probed source dtype per dataset (as the "
                         "reference does through rio-cogeo) and falls "
                         "back to f8 for sources without a dtype "
                         "probe; an explicit type forces it for all "
                         "outputs")
    ap.add_argument("--rgb-composite", action="store_true",
                    help="write ONE chunky multiband COG per dataset "
                         "instead of one per band (T12 RGB rule; the "
                         "reference auto-detects via colorinterp)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
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
                output_dir=f"{base}/datasets",
            )
            svc.run_available_now()
            ledger = svc.ledger()
            counts = {r["stage"]: r["count"] for r in
                      ledger.groupBy("stage").count().collect()}
            arts = [r.content for r in
                    ledger.filter("kind = 'artifact'").collect()]
            for a in sorted(arts):
                print(f"artifact: {a}")
            print(f"ledger rows: {ledger.count()}; stages: {counts}")
            return 0

        if args.backfill:
            from geohub_data_pipeline_spark.backfill import run_backfill

            report = run_backfill(spark, args.backfill).collect()
            for r in report:
                print(f"backfilled: {r.dataset_path} -> "
                      f"{r.n_fgb} fgb ({', '.join(r.fgb_paths)})")
            print(f"backfill: {len(report)} datasets regenerated")
            return 0

        if args.decode_pmtiles:
            if not args.dst:
                ap.error("--decode-pmtiles requires --dst")
            from pyspark.sql import functions as F

            from geohub_data_pipeline_spark.operators import mvt as MVT
            from geohub_data_pipeline_spark.sources import (
                pmtiles_source as PMDS,
            )

            PMDS.register(spark)
            # max zoom comes from the v3 HEADER (byte 101) — no need
            # to scan every tile payload just to find it
            with open(args.decode_pmtiles, "rb") as fh:
                hdr = fh.read(102)
            zmax = hdr[101]
            tiles = (spark.read.format("pmtiles")
                     .option("path", args.decode_pmtiles).load()
                     .filter(F.col("z") == zmax))
            # lower zooms are simplified duplicates; at zmax the
            # per-tile duplicate copies (the encoder ships the full
            # geometry to every covering tile) re-merge to one row
            # per feature — the round-trip-faithful form
            feats = MVT.merge_tile_fragments(
                MVT.features_from_tiles(tiles))
            out = f"{args.dst.rstrip('/')}/features"
            feats.write.mode("overwrite").parquet(out)
            back = spark.read.parquet(out)
            stats = back.groupBy("layer").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("n_tiles") - 1).alias("dups")).collect()
            total = 0
            for r in sorted(stats, key=lambda x: x["layer"]):
                dup = "" if not r["dups"] else \
                    f" ({r['dups']} per-tile copies merged)"
                print(f"layer {r['layer']}: {r['n']} features"
                      f"{dup} (z{zmax})")
                total += r["n"]
            print(f"decoded {total} features -> {out}")
            return 0

        if args.curate:
            if not args.dst:
                ap.error("--curate requires --dst")
            from pyspark.sql import functions as F

            from geohub_data_pipeline_spark.operators import curation as Cu
            from geohub_data_pipeline_spark.operators import dedup as D

            docs = spark.read.parquet(args.curate).select("doc_id", "text")
            n0 = docs.count()

            # 1. exact dedup — keep the lowest id per content hash
            keep = (docs.groupBy(F.md5("text").alias("__h"))
                    .agg(F.min("doc_id").alias("doc_id"))
                    .select("doc_id"))
            d1 = docs.join(keep, "doc_id")

            # 2. near-dup clusters — drop non-canonical members
            sigs = D.minhash_signatures(d1, "text", "doc_id")
            cand = D.lsh_candidate_pairs(sigs, "doc_id").select(
                "id_a", "id_b")
            verified = D.jaccard_for_pairs(d1, cand, "text", "doc_id") \
                .filter(F.col("jaccard") >= 0.8)
            cc = D.connected_components(verified.select("id_a", "id_b"))
            drop = cc.filter(F.col("node") != F.col("label")).select(
                F.col("node").alias("doc_id"))
            d2 = d1.join(drop, "doc_id", "left_anti")

            # 3. repetition filter (docs too short to shingle pass)
            rep = Cu.repetition_stats(d2).select("doc_id", "flagged")
            d3 = (d2.join(rep, "doc_id", "left")
                  .filter(~F.coalesce(F.col("flagged"), F.lit(False)))
                  .drop("flagged"))

            # 4. deterministic split; 5. shard manifest for train docs
            sp = Cu.hash_split(d3).select("doc_id", "split")
            clean = d3.join(sp, "doc_id")
            clean.write.mode("overwrite").partitionBy("split").parquet(
                f"{args.dst}/corpus")
            train = clean.filter(F.col("split") == "train").select(
                "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("tokens"))
            manifest = Cu.pack_token_shards(train, args.shard_tokens)
            manifest.write.mode("overwrite").parquet(
                f"{args.dst}/shard_manifest")

            back = spark.read.parquet(f"{args.dst}/corpus")
            n_train = back.filter(F.col("split") == "train").count()
            n_val = back.filter(F.col("split") == "val").count()
            n_shards = spark.read.parquet(
                f"{args.dst}/shard_manifest").select("shard") \
                .distinct().count()
            print(f"curate: {n0} docs in -> {n_train + n_val} kept "
                  f"({n_train} train / {n_val} val), "
                  f"{n_shards} training shards -> {args.dst}")
            return 0

        if args.raster:
            if not args.dst:
                ap.error("--raster requires --dst")
            from geohub_data_pipeline_spark.operators import (
                cogwriter as W,
                raster as R,
                rasterprobe as RP,
            )
            from geohub_data_pipeline_spark.sources import aaigrid as AG
            from geohub_data_pipeline_spark.sources import hdf5 as H5
            from geohub_data_pipeline_spark.sources import netcdf3 as NC

            low = args.raster.lower()
            tif_probe_paths: list[str] = []
            if low.endswith((".zip", ".tar", ".tgz", ".gz", ".7z")):
                # archived raster upload (ref /vsizip/ GDAL paths,
                # ingest/utils.py:23-32)
                from geohub_data_pipeline_spark.sources.archive import (
                    raster_blocks_from_members,
                    raster_georefs_from_members,
                    read_archives,
                )
                members = read_archives(spark, args.raster)
                blocks = raster_blocks_from_members(members)
                georefs = [raster_georefs_from_members(members)]
            elif low.endswith((".tif", ".tiff", ".gtif", ".gtiff")):
                from geohub_data_pipeline_spark.sources import (
                    geotiff as GTF,
                )
                blocks = GTF.blocks_from_geotiff(spark, args.raster)
                georefs = [GTF.georef_from_geotiff(spark, args.raster)]
                tif_probe_paths = [args.raster]
            elif low.endswith(".nc"):
                blocks = NC.blocks_from_netcdf3(spark, args.raster)
                georefs = [NC.georef_from_netcdf3(spark, args.raster)]
            elif low.endswith((".nc4", ".h5", ".hdf5")):
                blocks = H5.blocks_from_netcdf4(spark, args.raster)
                georefs = [H5.georef_from_netcdf4(spark, args.raster)]
            elif low.endswith((".asc", ".grd", ".aig", ".sgr")):
                blocks = AG.blocks_from_aaigrid(spark, args.raster)
                georefs = [AG.georef_from_aaigrid(spark, args.raster)]
            elif low.endswith((".raw", ".bl")):
                import os as _os
                from geohub_data_pipeline_spark.sources import (
                    erdasraw as ER,
                )
                # header + companion data pair live in one directory
                blocks = ER.blocks_from_erdas(
                    spark, _os.path.dirname(args.raster) or ".")
                georefs = []
            else:                          # directory: all families
                import os as _os
                from geohub_data_pipeline_spark.sources import (
                    erdasraw as ER,
                )
                parts, georefs = [], []
                try:
                    parts.append(ER.blocks_from_erdas(spark,
                                                      args.raster))
                except Exception:
                    pass
                from geohub_data_pipeline_spark.sources import (
                    geotiff as GTF,
                )
                tif_probe_paths = [
                    _os.path.join(args.raster, "*.tif"),
                    _os.path.join(args.raster, "*.tiff")]
                for fn, gfn, glob in (
                        (GTF.blocks_from_geotiff,
                         GTF.georef_from_geotiff, "*.tif"),
                        (GTF.blocks_from_geotiff,
                         GTF.georef_from_geotiff, "*.tiff"),
                        (AG.blocks_from_aaigrid,
                         AG.georef_from_aaigrid, "*.asc"),
                        (AG.blocks_from_aaigrid,
                         AG.georef_from_aaigrid, "*.grd"),
                        (AG.blocks_from_aaigrid,
                         AG.georef_from_aaigrid, "*.aig"),
                        (AG.blocks_from_aaigrid,
                         AG.georef_from_aaigrid, "*.sgr"),
                        (NC.blocks_from_netcdf3,
                         NC.georef_from_netcdf3, "*.nc"),
                        (H5.blocks_from_netcdf4,
                         H5.georef_from_netcdf4, "*.nc4")):
                    try:
                        src = _os.path.join(args.raster, glob)
                        parts.append(fn(spark, src))
                        georefs.append(gfn(spark, src))
                    except Exception:
                        continue           # no files of this family
                if not parts:
                    ap.error(f"no raster files under {args.raster}")
                blocks = parts[0]
                for p in parts[1:]:
                    blocks = blocks.unionByName(p)
            georef = georefs[0] if georefs else None
            for g in georefs[1:]:
                georef = georef.unionByName(g)
            # auto dtype: preserve the probed source sample type per
            # dataset (ref keeps dtype via rio-cogeo's profile,
            # ingest/config.py:92-101); explicit --cog-dtype forces
            dtypes_df = None
            if args.cog_dtype == "auto" and tif_probe_paths:
                from geohub_data_pipeline_spark.sources import (
                    geotiff as GTF,
                )
                parts_d = []
                for pp in tif_probe_paths:
                    try:
                        parts_d.append(
                            GTF.dtypes_from_geotiff(spark, pp))
                    except Exception:
                        continue
                if parts_d:
                    dtypes_df = parts_d[0]
                    for d in parts_d[1:]:
                        dtypes_df = dtypes_df.unionByName(d)
            cog_dtype = ("f8" if args.cog_dtype == "auto"
                         else args.cog_dtype)
            if georef is not None and not args.no_warp:
                # T11 warp: the reference's cog_translate targets the
                # WebMercatorQuad grid (ref processing.py:497-506)
                from geohub_data_pipeline_spark.operators import (
                    warp as WP,
                )
                blocks, georef = WP.warp_to_mercator(blocks, georef)
            pyramid = R.overview_cascade(blocks, args.overview_levels)
            # T12 auto-dispatch (ref processing.py:783-786): an RGB
            # photometric source with >= 3 bands becomes ONE
            # multiband composite; everything else one COG per band.
            rgb_datasets: set[str] = set()
            if not args.rgb_composite and tif_probe_paths:
                for pp in tif_probe_paths:
                    try:
                        probes = RP.probe_rasters(
                            spark.read.format("binaryFile")
                            .load(pp).select("path", "content"))
                        rgb_datasets |= {
                            r.path.rsplit("/", 1)[-1]
                            for r in probes.collect()
                            if (r.photometric or 1) >= 2
                            and (r.n_bands or 1) >= 3}
                    except Exception:
                        continue           # no files for this glob
            from pyspark.sql import functions as SF
            manifest = []
            if args.rgb_composite:
                manifest += W.assemble_cog_rgb_tables(
                    pyramid, f"{args.dst}/cog",
                    georef=georef, dtype=cog_dtype,
                    dtypes=dtypes_df).collect()
            elif rgb_datasets:
                is_rgb = SF.col("dataset").isin(sorted(rgb_datasets))
                manifest += W.assemble_cog_rgb_tables(
                    pyramid.filter(is_rgb), f"{args.dst}/cog",
                    georef=georef, dtype=cog_dtype,
                    dtypes=dtypes_df).collect()
                rest = pyramid.filter(~is_rgb)
                if rest.limit(1).count():
                    manifest += W.assemble_cog_tables(
                        rest, f"{args.dst}/cog",
                        georef=georef, dtype=cog_dtype,
                    dtypes=dtypes_df).collect()
            else:
                manifest += W.assemble_cog_tables(
                    pyramid, f"{args.dst}/cog", georef=georef,
                    dtype=cog_dtype, dtypes=dtypes_df).collect()
            for m in manifest:
                with open(m.path, "rb") as f:
                    payload = f.read()
                probe = RP.probe_geotiff(payload)
                # post-write validation, as the reference's
                # cog_validate (ref processing.py:511-514)
                check = RP.validate_cog(payload)
                if not check["valid"]:
                    raise SystemExit(
                        f"invalid COG {m.path}: {check['errors']}")
                what = (f"{m.n_bands}-band rgb"
                        if "n_bands" in m.__fields__
                        else f"band {m.band}")
                print(f"cog: {m.path} {probe['width']}x{probe['height']} "
                      f"{what}, {probe['n_overviews']} overviews, "
                      f"{probe['compression']}, {m.file_bytes} bytes, "
                      f"valid COG")
            print(f"wrote {len(manifest)} COGs to {args.dst}/cog")
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

        if args.src.lower().endswith(".mbtiles"):
            # tile-level conversion: MBTiles -> PMTiles (no re-tiling;
            # the reference allowlists .mbtiles uploads)
            from geohub_data_pipeline_spark.operators.mbtiles import (
                tiles_from_mbtiles,
            )
            tiles = tiles_from_mbtiles(spark, args.src)
            manifest = PMT.write_pmtiles_tables(
                tiles, f"{args.dst}/archives",
                payload_format="mvt").collect()
            for m in manifest:
                print(f"archive: {m.path} ({m.n_tiles} tiles, "
                      f"{m.n_layers} layers, "
                      f"z{m.min_zoom}-{m.max_zoom})")
            print(f"converted {args.src} -> {len(manifest)} PMTiles")
            return 0
        else:
            # shared extension dispatch (processing.py): archives,
            # .gpkg/.gdb/.fgb/.geojson/.shp, else feature parquet —
            # the same reader path the streaming service runs (EP1)
            from geohub_data_pipeline_spark import processing as PROC
            feats = PROC.read_vector_features(spark, args.src)
        norm = G.normalize_features(feats)
        if "properties" in feats.columns:
            # attributes survive normalize via a fid join and ride
            # into both artifacts (tippecanoe/ogr2ogr keep them)
            norm = norm.join(
                feats.select("dataset", "layer", "fid", "properties"),
                ["dataset", "layer", "fid"], "left")
        # companion .fgb artifacts, as the reference uploads next to
        # the PMTiles (ref ingest/processing.py:405-443 dataset2pmtiles)
        from geohub_data_pipeline_spark.sources.flatgeobuf import (
            write_flatgeobuf_tables,
        )
        for m in write_flatgeobuf_tables(
                norm, f"{args.dst}/fgb").collect():
            print(f"fgb: {m.path} ({m.n_features} features)")
        tiles = TLG.build_tiles(norm, maxzoom=args.maxzoom,
                                simplify_low_zooms=True, encode="mvt",
                                point_drop_rate=args.point_drop_rate)
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
        # only stop a session this invocation created — in-process
        # callers (tests, notebooks) keep theirs
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
