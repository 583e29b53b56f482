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
