"""Bucketed-table layout — shuffle-free co-located joins.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders on
orderkey) is the shuffle.  Bucketing both tables on the join key at
write time moves that shuffle to ingestion: every subsequent join (and
groupBy on the key) reads co-located buckets and plans a sort-merge
join with **zero Exchange nodes** — verified by tests/test_plans.py.

Pick bucket counts so one bucket ≈ one healthy task (128-512 MB);
bucket counts must match (or divide) across join sides.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    Idempotent: drops the catalog entry AND any orphaned warehouse
    directory (an in-memory catalog forgets tables across sessions but
    the directory survives).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), table)
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
