"""Shared test/oracle comparison utilities.

Mirrors the driver's correctness gate: row count + sorted-column schema
+ order-insensitive value comparison.  Values are canonicalized to
exact representations (floats via ``repr`` — bit-identical by design,
see plans/registry.py).
"""

from __future__ import annotations

import math

import pandas as pd


def canon(df: pd.DataFrame) -> list[tuple]:
    """Canonical order-insensitive representation of a result frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False, name=None):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append(None)
            elif isinstance(v, float):
                out.append(repr(v))
            elif hasattr(v, "isoformat"):
                out.append(pd.Timestamp(v).isoformat())
            elif isinstance(v, (list, tuple, dict)) \
                    or type(v).__name__ == "ndarray":
                # The DRIVER's canonicalizer sorts the pandas frame by
                # all columns; numpy arrays are unhashable there, so a
                # query returning a raw ARRAY/MAP column is unverifiable
                # by the hard gate even when values match (round-9
                # scalar_array_functions escape).  Refuse locally too —
                # the local stand-in must never be more permissive than
                # the driver.  Serialize (array_join / to_json) instead.
                raise TypeError(
                    "non-scalar result column value "
                    f"{type(v).__name__!s}: serialize arrays/maps "
                    "(F.array_join / F.to_json) before returning — "
                    "the driver gate cannot canonicalize them")
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=repr)


def compare_frames(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(
            f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns spark={sorted(spark_df.columns)} "
            f"duck={sorted(duck_df.columns)}")
        return problems
    cs, cd = canon(spark_df), canon(duck_df)
    if cs != cd:
        bad = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
        for i in bad[:3]:
            problems.append(f"row {i}: spark={cs[i]} duck={cd[i]}")
        problems.append(f"{len(bad)} differing rows")
    return problems
