"""Vector math over array<float|double> columns, JVM-side.

All expressions are built from ``pyspark.sql.functions`` higher-order
functions (``zip_with`` + ``aggregate``) so they run inside
whole-stage codegen — no Python in the hot path. Elements are cast to
double and folded left-to-right in index order, which makes the result
bit-deterministic and reproducible in any engine that folds the same
way (the DuckDB oracle does).

Scale: these are per-row O(d) expressions — they parallelize trivially
and shuffle nothing by themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products, in index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def squared_l2(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
