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
