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


def int8_scale(vec: Column) -> Column:
    """Symmetric-quantization scale for one vector: 127 / max|x|
    (0.0 for an all-zero vector so quantize maps it to zeros instead
    of dividing by zero)."""
    amax = F.array_max(F.transform(as_double(vec), F.abs))
    return F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Per-vector symmetric int8 quantization: q_i = floor(x_i * scale
    + 0.5) — floor of an identical IEEE double is bit-reproducible in
    any engine, while round()'s half-tie rule is not. By construction
    |x_i * scale| <= 127, so results lie in [-127, 127] with no clamp.

    ``scale`` should be a PROJECTED attribute (from :func:`int8_scale`
    in a prior select), not an inline expression: expressions
    referenced inside a higher-order-function lambda are re-evaluated
    per element, which would recompute the array_max per component.

    Why it matters at 100 TB: int8 storage cuts embedding bytes (and
    therefore shuffle and scan IO for ANN / near-dup passes) 4x versus
    float32 for a bounded, measurable recall cost."""
    return F.transform(
        as_double(vec), lambda x: F.floor(x * scale + F.lit(0.5)).cast("int")
    )


def squared_l2(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
