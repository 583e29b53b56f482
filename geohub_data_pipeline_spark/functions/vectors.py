"""Vector (embedding) math as Catalyst expressions — no UDFs.

Dot products and cosine similarity over ``array<float>`` columns using
``zip_with`` + ``aggregate`` (sequential left fold — deterministic
accumulation order, which the oracle mirrors exactly).

Scale: these are JVM codegen expressions; a 64-dim cosine costs ~64
fused multiply-adds per row and never leaves Tungsten rows.  For very
high dimensions (>2k) a Pandas-UDF/numpy batch kernel wins — that
variant lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    """Promote array<float> to array<double> before arithmetic so both
    engines compute in double precision from the first multiply."""
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column | None = None,
           norm_b: Column | None = None) -> Column:
    """Cosine similarity; pass precomputed norms when joining many
    pairs so each side's norm is computed once, not per pair."""
    na = norm(a) if norm_a is None else norm_a
    nb = norm(b) if norm_b is None else norm_b
    return dot(a, b) / (na * nb)
