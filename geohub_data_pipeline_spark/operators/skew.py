"""Skew mitigation: salted joins (+ AQE as the first line of defense).

AQE's skew-join splitting (on by default, session.py) handles moderate
skew by splitting oversized shuffle partitions.  For pathological keys
(one key = 30% of a 100 TB table) a salted join bounds the largest
partition deterministically:

* the big/skewed side gets ``salt = pmod(hash(salt_source), n)`` —
  a derived column that spreads one hot key over n partitions;
* the small side is replicated n times (explode), once per salt;
* the join key becomes (key, salt); results are identical to the
  unsalted join (verified by tests).

Cost: small side × n replication (bounded; choose n ≈ hot-key
partition count) versus an unboundedly skewed reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebalance_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` to ``defaultParallelism`` partitions IF its
    current plan yields fewer — the scale-adaptive guard for
    compute-bound projections over byte-small inputs (guide §2/§6.1:
    scan split count follows *bytes*, so a table under
    ``files.openCostInBytes`` arrives as ONE task and a compute-heavy
    expression chain — MinHash's ~400 md5/doc, fingerprint sorts —
    serializes on one core; measured r11: the sf1 MinHash signature
    stage 9.2 s on 2 scan tasks vs 1.05 s rebalanced).

    At real scale the input has >= defaultParallelism splits and this
    is the identity — the branch never fires, no exchange is added.
    Correct for any consumer whose result is partition-independent
    (per-row projections, commutative aggregations, joins).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def fits_one_task(df: DataFrame) -> bool:
    """True when a MATERIALIZED (localCheckpoint'ed) relation landed
    in a single partition — the degenerate-partitioning case where a
    synchronous driver-looped fixpoint pays one full job dispatch per
    round for zero distribution benefit (guide §1.2; the r11
    halo-engine / classifier P=1 pattern, r12 graph/CC operators).

    The caller must pass an already-materialized frame (checkpoint or
    cached): for those the partition count is physical metadata, no
    job runs.  At real scale the materialized relation spans many
    partitions and this returns False — the distributed round loop is
    untouched.
    """
    try:
        return df.rdd.getNumPartitions() <= 1
    except Exception:
        return False


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner",
                salt_source: str | None = None) -> DataFrame:
    """Join with the big side salted and the small side replicated.

    salt_source: column of ``big`` used to derive the salt
    (default: a per-row monotonic id — maximal spreading).
    """
    if salt_source is None:
        b = big.withColumn(
            "__salt",
            F.pmod(F.hash(F.monotonically_increasing_id()),
                   F.lit(n_salts)).cast("int"))
    else:
        b = big.withColumn(
            "__salt",
            F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("int"),
                             F.lit(n_salts - 1).cast("int"))))
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def profile_columns(df, specs) -> "DataFrame":
    """Single-pass column profiler — the ``DESCRIBE``-style data
    audit every ingestion pipeline runs before trusting a new drop:
    for each column, row count, null count, EXACT distinct count,
    and min/max rendered through an explicit cross-engine format.

    ``specs`` is ``[(col, kind)]`` with kind in ``int`` (cast to
    string), ``num2`` (via DECIMAL(18,2) — double-to-string
    formatting differs between engines, decimal does not), ``ts``
    (explicit yyyy-MM-dd HH:mm:ss), ``str`` (as-is).

    ALL columns profile in ONE aggregation over ONE scan — the
    shape that matters at 100 TB where "profile the table" must not
    mean one job per column.  The only driver-side data is the
    single aggregate row (4 x n_cols scalars), re-emitted as the
    (column, metric) result frame.
    """
    from pyspark.sql import functions as F

    def fmt(expr, kind):
        # format AFTER aggregating — min/max must compare in the
        # column's native order, not lexicographically
        if kind == "num2":
            return expr.cast("decimal(18,2)").cast("string")
        if kind == "ts":
            return F.date_format(expr, "yyyy-MM-dd HH:mm:ss")
        return expr.cast("string")

    aggs = []
    for col, kind in specs:
        aggs += [
            F.count(F.lit(1)).alias(f"n__{col}"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .alias(f"nulls__{col}"),
            F.countDistinct(F.col(col)).alias(f"dist__{col}"),
            fmt(F.min(F.col(col)), kind).alias(f"min__{col}"),
            fmt(F.max(F.col(col)), kind).alias(f"max__{col}"),
        ]
    row = df.agg(*aggs).collect()[0]
    rows = [(col, int(row[f"n__{col}"]), int(row[f"nulls__{col}"]),
             int(row[f"dist__{col}"]), row[f"min__{col}"],
             row[f"max__{col}"]) for col, _ in specs]
    return df.sparkSession.createDataFrame(
        rows, "col_name string, n_rows long, n_nulls long, "
              "n_distinct long, min_value string, max_value string")
