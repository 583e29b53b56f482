"""FGB backfill job (EP3 analog) — batch scan + anti-join pipeline.

Reference: ``/root/reference/ingest/fgb_upload/main.py:105-234`` —
scan every user's datasets, skip datasets whose ``.fgb`` outputs
already exist (or whose raw input is missing), regenerate the rest.

Spark restatement: pure relational plan over two listings:

  produced(dataset outputs) ⟕anti existing(fgb outputs)
                            ⋈semi raw(inputs present)

Scale: listings are DataFrames (``binaryFile`` reader or an inventory
table at 100 TB); the anti/semi joins broadcast whichever side is
small and degrade to shuffled hash joins when both are huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.functions import paths as P


def backfill_plan(datasets: DataFrame, existing_fgb: DataFrame,
                  raw_inputs: DataFrame,
                  exclude_users: tuple[str, ...] = ("test",)) -> DataFrame:
    """Compute the work list for the backfill.

    datasets:     (path) produced .pmtiles outputs to check
    existing_fgb: (path) already-present .fgb outputs
    raw_inputs:   (path) raw upload blobs

    Returns (user, dataset_path, raw_path, fgb_path) rows to convert.
    """
    ds = datasets.select(F.col("path").alias("dataset_path")).filter(
        P.file_ext(F.col("dataset_path")) == ".pmtiles")
    ds = ds.select(
        "dataset_path",
        F.split(F.col("dataset_path"), "/").getItem(0).alias("user"),
        F.regexp_replace("dataset_path", r"\.pmtiles$", ".fgb")
        .alias("fgb_path"),
        F.regexp_replace(
            F.regexp_replace("dataset_path", f"/{P.DATASETS_FOLDER}/",
                             f"/{P.RAW_FOLDER}/"),
            r"\.pmtiles$", "").alias("raw_path"),
    ).filter(~F.col("user").isin(*exclude_users))  # T21 user exclusion

    missing = ds.join(
        existing_fgb.select(F.col("path").alias("fgb_path")),
        "fgb_path", "left_anti")                    # T20: skip if exists

    return missing.join(
        raw_inputs.select(
            F.regexp_replace(F.col("path"), r"\.[^./]+$", "")
            .alias("raw_path")),
        "raw_path", "left_semi")                    # skip if raw missing


def run_backfill(spark, base_dir: str,
                 exclude_users: tuple[str, ...] = ("test",)) -> DataFrame:
    """EP3 end-to-end (ref fgb_upload/main.py:105-192): list the
    artifact tree under ``base_dir``, compute the T20/T21 work list
    with ``backfill_plan``, and REGENERATE the missing ``.fgb``
    companions from each dataset's raw upload through the same
    normalize -> FlatGeobuf stages the ingest runs (dataset2fgb,
    ref processing.py:100-213).  Returns a report DataFrame
    (dataset_path, raw_path, n_fgb, fgb_paths).

    The listings here come from a local os.walk (the reference's
    ``list_blobs`` driver loop); at 100 TB they would be an object-
    store inventory table read as a DataFrame — ``backfill_plan``
    itself is listing-agnostic.  The per-dataset regeneration loop is
    bounded by the MISSING count (the plan's anti-join output), and
    each regeneration is a distributed job.
    """
    import os

    from geohub_data_pipeline_spark import processing as PROC
    from geohub_data_pipeline_spark.operators import geometry as G
    from geohub_data_pipeline_spark.sources.flatgeobuf import (
        write_flatgeobuf_tables,
    )

    base = base_dir.rstrip("/")
    rels = []
    for root, _dirs, files in os.walk(base):
        for fn in files:
            rels.append(os.path.relpath(os.path.join(root, fn), base))
    if not rels:
        return spark.createDataFrame(
            [], "dataset_path string, raw_path string, n_fgb int, "
                "fgb_paths array<string>")
    listing = spark.createDataFrame([(r,) for r in rels], "path string")
    todo = backfill_plan(
        listing, listing.filter(P.file_ext(F.col("path")) == ".fgb"),
        listing.filter(F.col("path").contains(f"/{P.RAW_FOLDER}/")),
        exclude_users=exclude_users).collect()

    report = []
    for row in todo:
        raw_prefix = os.path.join(base, row.raw_path)
        src = next((raw_prefix + ext for ext in
                    (".gpkg", ".fgb", ".geojson", ".json", ".zip",
                     ".gdb", ".shp")
                    if os.path.exists(raw_prefix + ext)), None)
        if src is None:
            continue
        feats = PROC.read_vector_features(spark, src)
        norm = G.normalize_features(feats)
        if "properties" in feats.columns:
            norm = norm.join(
                feats.select("dataset", "layer", "fid", "properties"),
                ["dataset", "layer", "fid"], "left")
        dst = os.path.dirname(os.path.join(base, row.fgb_path))
        manifest = write_flatgeobuf_tables(norm, dst).collect()
        report.append((row.dataset_path, row.raw_path,
                       len(manifest), [m.path for m in manifest]))
    return spark.createDataFrame(
        report, "dataset_path string, raw_path string, n_fgb int, "
                "fgb_paths array<string>")


def backfill_user_ids(datasets: DataFrame,
                      exclude_users: tuple[str, ...] = ("test",)) -> DataFrame:
    """T21+T18: distinct users (minus excluded) with md5 ids
    (ref fgb_upload/main.py:36-41, 224-227)."""
    return (
        datasets.select(
            F.split(F.col("path"), "/").getItem(0).alias("user"))
        .filter(~F.col("user").isin(*exclude_users))
        .distinct()
        .select("user", P.user_id_hash(F.col("user")).alias("user_hash"))
    )
