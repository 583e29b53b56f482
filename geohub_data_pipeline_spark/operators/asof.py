"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with
``right.ts <= left.ts`` sharing the join key.

Implementation: **union + keyed window**, not a range join:

  1. tag both sides and union them on (key, event-time),
  2. one shuffle partitions by key, sorts by (time, tag) — right rows
     sort before left rows at equal timestamps, making the join
     inclusive (>=),
  3. ``last(payload, ignorenulls=True)`` over the running frame gives
     every left row the most recent right payload,
  4. keep left rows.

Scale: exactly ONE shuffle of |L|+|R| rows; no per-key driver loops
and no N×M candidate explosion (a naive theta-join
``l.ts >= r.ts`` is quadratic).  Skewed keys: pre-split hot keys by
time-bucket salting before calling (each salt bucket still sees its
full right-side prefix via a per-bucket seed row), or rely on AQE
skew handling for moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "matched_",
    how: str = "left",
) -> DataFrame:
    """As-of join ``left`` to the latest earlier ``right`` row per key.

    Parameters
    ----------
    on : equality join key present in both frames.
    left_ts / right_ts : event-time columns.
    payload_cols : right-side columns to attach (prefixed).
    how : 'left' keeps unmatched left rows (payload NULL), 'inner'
        drops them.
    """
    pc = {c: f"{payload_prefix}{c}" for c in payload_cols}

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_ts).cast("timestamp_ntz").alias(f"{payload_prefix}ts"),
        *[F.col(c).alias(a) for c, a in pc.items()],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in [f"{payload_prefix}ts", *pc.values()]
        ],
    )
    out = (
        filled.filter(F.col("__side") == 1)
        .drop("__t", "__side", f"{payload_prefix}ts", *pc.values())
    )
    for c in [f"{payload_prefix}ts", *pc.values()]:
        out = out.withColumnRenamed(f"__f_{c}", c)
    if how == "inner":
        out = out.filter(F.col(f"{payload_prefix}ts").isNotNull())
    return out
