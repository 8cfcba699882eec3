"""Incremental aggregate maintenance from the CDC diff feed.

The payoff of ``Database.changes(with_preimage=True)``: any
distributive aggregate (count, sum — and by extension avg = sum/count)
over the store can be PATCHED from a change window's diffs instead of
recomputed from the base table. At 100 TB this is the difference
between a maintenance job priced by change volume (read the window's
segments + the pre-image keys, one small merge) and one priced by
table size (full snapshot re-aggregation).

Semantics per diff row (``change_type`` ∈ insert/update/delete, new
values in the value columns, pre-images in ``old_<v>``):

    insert:  n += 1,  sum += new
    update:  n += 0,  sum += new - old
    delete:  n -= [key existed],  sum -= old

"key existed" for a delete is derivable from the pre-image (snapshot
rows always carry at least one non-null value cell, so an all-null
pre-image means the tombstone hit a key absent at ``since`` — a no-op,
exactly as the feed documents). Sums are carried as DECIMAL, so the
patched state is bit-identical to a full recompute under any
accumulation order — the same exactness discipline as the oracle-gated
aggregates.

Constraints (asserted): grouping keys must be dimension columns (a
delete has no new values to re-derive a value-dependent group from),
and the store must be read in the default row-level resolution (a
cell-merge store's partial upserts don't carry full rows).

Scale: one shuffle to aggregate the deltas by key, one outer merge
join against the (key-partitioned) state — both sized by the change
window, never the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dec(col, scale: int):
    return col.cast(f"decimal(18,{scale})")


def sum_count_state(
    snapshot: DataFrame,
    keys: list[str],
    value_cols: list[str],
    scale: int = 2,
) -> DataFrame:
    """Base aggregate state from a snapshot: per key, ``n`` plus
    ``sum_<v>`` (decimal-exact) for each value column."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(_dec(F.col(v), scale)).alias(f"sum_{v}") for v in value_cols
    ]
    return snapshot.groupBy(*keys).agg(*aggs)


def apply_diff(
    state: DataFrame,
    diff: DataFrame,
    keys: list[str],
    value_cols: list[str],
    scale: int = 2,
) -> DataFrame:
    """Patch ``state`` (from :func:`sum_count_state`) with one change
    window's diff feed. Returns the new state — equal, bit-for-bit, to
    recomputing :func:`sum_count_state` on the post-window snapshot.
    Groups whose count reaches zero disappear (matching recompute)."""
    ct = F.col("change_type")
    old_exists = F.lit(False)
    for v in value_cols:
        old_exists = old_exists | F.col(f"old_{v}").isNotNull()
    n_delta = (
        F.when(ct == "insert", F.lit(1))
        .when(ct == "delete", F.when(old_exists, F.lit(-1)).otherwise(F.lit(0)))
        .otherwise(F.lit(0))
        .cast("long")
    )
    zero = F.lit(0).cast(f"decimal(18,{scale})")
    deltas = [n_delta.alias("__dn")]
    for v in value_cols:
        new_part = F.when(ct != "delete", F.coalesce(_dec(F.col(v), scale), zero)).otherwise(zero)
        old_part = F.coalesce(_dec(F.col(f"old_{v}"), scale), zero)
        deltas.append((new_part - old_part).alias(f"__d_{v}"))

    patch = (
        diff.select(*keys, *deltas)
        .groupBy(*keys)
        .agg(
            F.sum("__dn").alias("__dn"),
            *[F.sum(f"__d_{v}").alias(f"__d_{v}") for v in value_cols],
        )
    )

    merged = state.join(patch, keys, "full_outer")
    zl = F.lit(0).cast("long")
    out_cols = [F.col(k) for k in keys] + [
        (F.coalesce(F.col("n"), zl) + F.coalesce(F.col("__dn"), zl)).alias("n")
    ] + [
        (
            F.coalesce(F.col(f"sum_{v}"), zero) + F.coalesce(F.col(f"__d_{v}"), zero)
        ).alias(f"sum_{v}")
        for v in value_cols
    ]
    return merged.select(*out_cols).filter(F.col("n") > 0)


def maintain_sum_count(
    db,
    keys: list[str],
    value_cols: list[str],
    since: int,
    until: int | None = None,
    scale: int = 2,
) -> DataFrame:
    """End-to-end: state at ``since`` + diffs of ``(since, until]`` →
    patched state, never touching base-table rows outside the change
    window (the pre-image join inside ``changes`` prunes to the
    changed keys' stats envelope)."""
    bad = [k for k in keys if k not in db.schema.dim_names]
    if bad:
        raise ValueError(
            f"grouping keys must be dimension columns (deletes carry no "
            f"new values to re-derive {bad!r} from)"
        )
    base = sum_count_state(
        db.snapshot(as_of=since), keys, value_cols, scale=scale
    )
    diff = db.changes(since=since, until=until, with_preimage=True)
    return apply_diff(base, diff, keys, value_cols, scale=scale)
