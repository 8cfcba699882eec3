"""Z-order (Morton) clustering for multi-dimensional key locality.

The reference clusters rows by chunk routing only (src/schema.rs:28-38):
within a chunk, rows are laid out in lexicographic key order, so zone
maps (src/block.rs:210-232) are selective for the LEADING dimension and
nearly useless for the others — a range query on dim 2 must touch every
block. Z-ordering interleaves the bits of all dimensions into one sort
key, so consecutive rows form small hyper-rectangles in key space and
parquet row-group min/max stats become selective for EVERY dimension
(the Delta Lake / Databricks OPTIMIZE ZORDER design, public behavior).

Everything is JVM-side integer arithmetic (shift/and/or inside
whole-stage codegen): bucketize each dimension to ``bits`` bits using
its global min/max, then interleave bucket bits round-robin. Used by
``Database.compact(cluster="zorder")`` — a layout-only change: scan
semantics and results are identical, only row order inside segments
(and therefore stats tightness) differs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from matdb_spark.schema import Schema

#: bits per dimension in the interleaved key (16 → 65536 buckets/dim;
#: finer adds no selectivity once buckets are smaller than a row group)
DEFAULT_BITS = 16

_INTEGRAL = {"long", "int"}


def zorder_bucket(name: str, lo: int, hi: int, bits: int = DEFAULT_BITS) -> Column:
    """Map values in [lo, hi] to integer buckets in [0, 2^bits).

    Exact integer ``div`` (not double division — inexact above 2^53),
    and overflow-safe for ANY long domain: dividing BEFORE subtracting
    keeps every intermediate within ±2^63 even when hi - lo itself
    overflows (e.g. full-range signed 64-bit hashed keys, where
    ``col - lo`` would wrap / raise under ANSI mode). Buckets from the
    div-first form can shift by one at ``step`` boundaries versus
    (col-lo) div step — irrelevant for clustering, which only needs a
    monotone map — and the ``least`` clamp pins the one boundary value
    that could reach 2^bits."""
    span = hi - lo  # python int: never overflows
    step = (span // (1 << bits)) + 1
    b = F.expr(f"(CAST(`{name}` AS BIGINT) div {step}) - ({lo // step})")
    return F.least(b, F.lit((1 << bits) - 1))


def interleave_bits(buckets: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave: bit b of bucket i lands at position
    b * n_dims + i. Pure shift/and/or — stays in codegen.

    ``bits * n_dims`` must stay <= 63: position 63 is the long's sign
    bit (would invert the sort order) and JVM shiftleft masks shift
    counts mod 64 (positions past 63 would silently wrap into the low
    bits). Callers cap bits via ``bits_for`` — this guard catches
    direct misuse."""
    n = len(buckets)
    if bits * n > 63:
        raise ValueError(
            f"{bits} bits x {n} dims = {bits * n} interleaved bits; max 63 "
            f"(use bits_for(n_dims))"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(buckets):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def bits_for(n_dims: int, bits: int = DEFAULT_BITS) -> int:
    """Widest per-dim bucket width whose interleave fits a signed long."""
    return min(bits, 63 // n_dims)


def morton_py(vals: list[int], bits: int = DEFAULT_BITS) -> int:
    """Python reference of interleave_bits (for tests)."""
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def _validate_dims(schema: Schema) -> list:
    dims = list(schema.dimensions)
    bad = [d.name for d in dims if d.type not in _INTEGRAL]
    if bad:
        raise ValueError(f"zorder requires integral dims; non-integral: {bad}")
    if len(dims) < 2:
        raise ValueError("zorder needs >= 2 dimensions (1-D order is already optimal)")
    return dims


def zorder_key_from_bounds(
    schema: Schema, bounds: dict[str, tuple], bits: int = DEFAULT_BITS
) -> Column:
    """Z-order key from KNOWN per-dim (lo, hi) bounds — e.g. merged
    from the commit manifests' txn-level stats — so building the key
    costs zero Spark jobs. Conservative (wider) bounds are valid: they
    only coarsen bucket granularity, never break ordering."""
    dims = _validate_dims(schema)
    bits = bits_for(len(dims), bits)
    buckets = []
    for d in dims:
        lo, hi = bounds[d.name]
        buckets.append(zorder_bucket(d.name, int(lo), int(hi), bits))
    return interleave_bits(buckets, bits)


def zorder_key(
    df: DataFrame, schema: Schema, bits: int = DEFAULT_BITS
) -> Column:
    """Build the z-order sort key for ``df``'s dimension columns.

    Fallback path: bounds come from one min/max aggregation over the
    input — for a compaction that means a full extra pass over the
    snapshot plan, so prefer ``zorder_key_from_bounds`` with manifest
    stats when the store carries them (Database.compact does this
    automatically). Requires >= 2 integral dims — with one dimension
    the lexicographic sort is already optimal and z-ordering is a
    no-op by definition."""
    dims = _validate_dims(schema)
    bits = bits_for(len(dims), bits)
    aggs = []
    for d in dims:
        aggs += [F.min(d.name).alias(f"__lo_{d.name}"), F.max(d.name).alias(f"__hi_{d.name}")]
    row = df.agg(*aggs).first()
    buckets = []
    for d in dims:
        lo, hi = row[f"__lo_{d.name}"], row[f"__hi_{d.name}"]
        if lo is None:  # empty input: constant key
            return F.lit(0).cast("long")
        buckets.append(zorder_bucket(d.name, int(lo), int(hi), bits))
    return interleave_bits(buckets, bits)
