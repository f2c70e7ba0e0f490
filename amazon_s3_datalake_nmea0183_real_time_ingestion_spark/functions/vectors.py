"""Vector expressions over ``array<float>`` embedding columns.

JVM-side only: ``zip_with`` + ``aggregate`` compute dot products inside
whole-stage codegen, no Python round-trip.  Cast to double FIRST so the
accumulation is float64 and matches any double-precision oracle that sums
elements left-to-right.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right float64 dot product of two float arrays."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL (not an ANSI crash) when either vector has zero norm."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def as_double(v: Column) -> Column:
    """Float→double array cast, exposed so join operators can cast each
    side ONCE per row (below the join) instead of once per pair."""
    return _as_double(v)


def dot_double(a_d: Column, b_d: Column) -> Column:
    """Dot product of two ALREADY-double arrays — the per-pair kernel once
    casts/norms are precomputed per side (see operators/similarity.py)."""
    prods = F.zip_with(a_d, b_d, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
