"""General range/interval joins.

Two strategies, chosen by interval shape:

* **Uniform-width intervals** — derive the bucket key and equi-join
  (used by the ``join_range_theta`` registry query): O(1) per row,
  hash join, codegen.
* **Irregular intervals** — ``range_join_general``: broadcast the
  interval table and pre-bucket *both* sides on a chosen granularity
  so each probe only scans intervals overlapping its bucket, instead
  of a full nested loop over every interval.  An interval spanning k
  buckets is replicated k times (bounded by interval width /
  granularity).

At 100 TB the naive BNLJ is rows x intervals condition evaluations;
granular pre-bucketing makes it rows x (intervals overlapping the
row's bucket), which for point-in-interval workloads is ~O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_general(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    granularity: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval with lo <= value < hi.

    ``granularity``: bucket width used to co-key the two sides; pick
    on the order of the median interval width.
    """
    p = points.withColumn(
        "__gb", F.floor(F.col(value_col) / granularity).cast("long"))
    iv = intervals.withColumn(
        "__gb",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / granularity).cast("long"),
                # hi is exclusive: a bucket containing only hi itself
                # can still hold values just below hi
                F.floor(
                    (F.col(hi_col) - F.lit(granularity) * 1e-9) / granularity
                ).cast("long"),
            )
        ),
    )
    return (
        p.join(F.broadcast(iv), "__gb", how)
        .filter((F.col(value_col) >= F.col(lo_col))
                & (F.col(value_col) < F.col(hi_col)))
        .drop("__gb")
    )
