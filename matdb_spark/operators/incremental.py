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

"key existed" for a delete is derived from ALL pre-image columns in
the feed, not just the maintained subset (snapshot rows always carry
at least one non-null value cell, so an all-null pre-image means the
tombstone hit a key absent at ``since`` — a no-op, exactly as the
feed documents; a pre-image that is null only in the maintained
columns still proves existence through the others). Sums are carried
as DECIMAL plus a per-column non-null count, so the patched state is
bit-identical to a full recompute under any accumulation order —
including the all-null group whose sum must be NULL, not 0.

Constraints: grouping keys must be dimension columns (asserted in
:func:`maintain_sum_count` — a delete has no new values to re-derive
a value-dependent group from), and the store must be operated in the
default row-level resolution (documented, not detectable here: a
cell-merge store's partial upserts carry null for "keep old cell",
which row-level diffs would misread as a write of null).

Scale: one shuffle to aggregate the deltas by key, one outer merge
join against the (key-partitioned) state — both sized by the change
window, never the base table. Building the INITIAL state is a full
snapshot aggregation by nature; persist it and hand it back to
:func:`apply_diff` per window (``maintain_sum_count(..., state=...)``)
so steady-state cost tracks change volume only.
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
    """Base aggregate state from a snapshot: per key, ``n`` (row
    count) plus, for each value column, ``nn_<v>`` (non-null count)
    and ``sum_<v>`` (decimal-exact; NULL when no non-null values —
    the ``nn`` column is what lets :func:`apply_diff` preserve that
    distinction through patches)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for v in value_cols:
        aggs.append(F.count(F.col(v)).alias(f"nn_{v}"))
        aggs.append(F.sum(_dec(F.col(v), scale)).alias(f"sum_{v}"))
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
    # Existence of the pre-image row is proven by ANY old_* column in
    # the feed (the feed emits one per schema value column) — not just
    # the maintained subset, whose columns may legitimately be null on
    # an existing row.
    pre_cols = [c for c in diff.columns if c.startswith("old_")]
    old_exists = F.lit(False)
    for c in pre_cols:
        old_exists = old_exists | F.col(c).isNotNull()
    n_delta = (
        F.when(ct == "insert", F.lit(1))
        .when(ct == "delete", F.when(old_exists, F.lit(-1)).otherwise(F.lit(0)))
        .otherwise(F.lit(0))
        .cast("long")
    )
    zero = F.lit(0).cast(f"decimal(18,{scale})")
    deltas = [n_delta.alias("__dn")]
    for v in value_cols:
        new_live = ct != "delete"
        new_part = F.when(new_live, F.coalesce(_dec(F.col(v), scale), zero)).otherwise(zero)
        old_part = F.coalesce(_dec(F.col(f"old_{v}"), scale), zero)
        deltas.append((new_part - old_part).alias(f"__d_{v}"))
        nn_new = F.when(new_live & F.col(v).isNotNull(), F.lit(1)).otherwise(F.lit(0))
        nn_old = F.when(F.col(f"old_{v}").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        deltas.append((nn_new - nn_old).cast("long").alias(f"__dnn_{v}"))

    patch = (
        diff.select(*keys, *deltas)
        .groupBy(*keys)
        .agg(
            F.sum("__dn").alias("__dn"),
            *[F.sum(f"__d_{v}").alias(f"__d_{v}") for v in value_cols],
            *[F.sum(f"__dnn_{v}").alias(f"__dnn_{v}") for v in value_cols],
        )
    )

    merged = state.join(patch, keys, "full_outer")
    zl = F.lit(0).cast("long")
    out_cols = [F.col(k) for k in keys] + [
        (F.coalesce(F.col("n"), zl) + F.coalesce(F.col("__dn"), zl)).alias("n")
    ]
    for v in value_cols:
        nn = F.coalesce(F.col(f"nn_{v}"), zl) + F.coalesce(F.col(f"__dnn_{v}"), zl)
        # re-cast to the state's declared sum type: decimal addition
        # widens precision (28,s → 30,s → … → 38 cap), so without the
        # cast the patched schema drifts from the recompute's on every
        # chained application and eventually overflows the cap
        total = (
            F.coalesce(F.col(f"sum_{v}"), zero) + F.coalesce(F.col(f"__d_{v}"), zero)
        ).cast(state.schema[f"sum_{v}"].dataType)
        out_cols.append(nn.alias(f"nn_{v}"))
        # a group with zero non-null contributions sums to NULL, as a
        # recompute would — 0 would conflate "nothing" with "zero"
        out_cols.append(F.when(nn > 0, total).otherwise(F.lit(None)).alias(f"sum_{v}"))
    return merged.select(*out_cols).filter(F.col("n") > 0)


def maintain_sum_count(
    db,
    keys: list[str],
    value_cols: list[str],
    since: int,
    until: int | None = None,
    scale: int = 2,
    state: DataFrame | None = None,
) -> DataFrame:
    """State at ``since`` + diffs of ``(since, until]`` → patched
    state. Pass ``state`` (the persisted output of a previous call /
    of :func:`sum_count_state`) to skip rebuilding the base state —
    that is the steady-state shape whose cost tracks change volume
    only; without it the base state is a one-time full aggregation of
    the ``since`` snapshot."""
    bad = [k for k in keys if k not in db.schema.dim_names]
    if bad:
        raise ValueError(
            f"grouping keys must be dimension columns (deletes carry no "
            f"new values to re-derive {bad!r} from)"
        )
    if state is None:
        state = sum_count_state(
            db.snapshot(as_of=since), keys, value_cols, scale=scale
        )
    diff = db.changes(since=since, until=until, with_preimage=True)
    return apply_diff(state, diff, keys, value_cols, scale=scale)
