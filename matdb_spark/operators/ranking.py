"""Global (total-order) row numbering at scale.

A bare ``Window.orderBy(...)`` with no ``partitionBy`` funnels EVERY
row through one task — the classic Spark scale trap: at 100 TB that
single task sorts the whole table. The reference's only ordered
output is its merge scan (/root/reference/src/scan.rs:183-238), which
never needs a global rank; pipelines do (stable sample ids, sharded
export manifests, curriculum ordering).

Two-phase plan, all sizes bounded:

1. per-bucket counts — one tiny aggregation (#buckets rows);
   cumulative offsets via a window over BUCKETS only, so the single
   task that window implies handles #buckets rows, not #rows;
2. per-bucket ``row_number`` (parallel across buckets, the only
   full-data shuffle) + broadcast-joined offset add.

The caller supplies ``bucket``: a deterministic, order-aligned
bucketing of the leading sort key — ``b1 < b2`` must imply every row
in ``b1`` sorts before every row in ``b2`` (e.g. ``key div N``, a
date column, ingestion partition). This is the same contract
``repartitionByRange`` establishes by sampling; an explicit expression
keeps the result engine-reproducible (range sampling is not).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

# Rows whose bucket expression evaluates (or casts) to NULL must not
# be dropped by the inner equi-join back to the offset table — they
# fold into this sentinel bucket instead, which sorts FIRST, matching
# Spark's default NULLS FIRST window ordering a partitionless
# ``Window.orderBy(bucket)`` would have produced.
_NULL_BUCKET = -(2**63)


def _bucket_col(bucket: Column) -> Column:
    return F.coalesce(bucket.cast("long"), F.lit(_NULL_BUCKET))


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    bucket: Column,
    weight_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Append ``out_col`` = inclusive running sum of ``weight_col``
    under the total order (``bucket``, ``*order_cols``) — the same
    two-phase plan as global_row_number with sums instead of counts:
    per-bucket weight totals (tiny agg), cumulative bucket offsets
    via a #buckets-row window, then a per-bucket running sum plus the
    broadcast offset. This is what makes a GLOBAL quota walk
    (budget_select across the whole corpus, not per group) runnable
    at scale: the partitionless running-sum window it replaces is the
    single-task trap. Weights should be exact integers (token
    counts) for engine-exact results. Same ``bucket`` monotonicity
    contract as global_row_number. Rows with a NULL bucket are kept —
    they fold into a first-sorting sentinel bucket (NULLS FIRST), never
    silently dropped by the offset join."""
    b = df.withColumn("__grs_b", _bucket_col(bucket))
    totals = b.groupBy("__grs_b").agg(
        F.sum(F.col(weight_col)).alias("__grs_t")
    )
    w_off = Window.orderBy("__grs_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__grs_b",
        F.coalesce(F.sum("__grs_t").over(w_off), F.lit(0)).alias("__grs_off"),
    )
    w_in = (
        Window.partitionBy("__grs_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(offsets), "__grs_b")
        .withColumn(
            out_col,
            (F.sum(F.col(weight_col)).over(w_in) + F.col("__grs_off")).cast(
                "long"
            ),
        )
        .drop("__grs_b", "__grs_off")
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    bucket: Column,
    out_col: str = "rn",
) -> DataFrame:
    """Append ``out_col`` = 1-based rank of each row under the total
    order (``bucket``, ``*order_cols``), computed without a
    single-task global sort.

    ``bucket`` must be monotone in the leading sort key (see module
    docstring); ``order_cols`` must be a total order WITHIN a bucket
    (include a unique tiebreaker) for deterministic output. NULL
    buckets fold into a first-sorting sentinel (NULLS FIRST) instead
    of being dropped by the offset join.
    """
    b = df.withColumn("__grn_b", _bucket_col(bucket))
    counts = b.groupBy("__grn_b").agg(F.count(F.lit(1)).alias("__grn_c"))
    # Window over buckets only: single task, #buckets rows — driver-scale.
    w_off = (
        Window.orderBy("__grn_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__grn_b",
        F.coalesce(F.sum("__grn_c").over(w_off), F.lit(0)).alias("__grn_off"),
    )
    w_in = Window.partitionBy("__grn_b").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), "__grn_b")
        .withColumn(out_col, (F.row_number().over(w_in) + F.col("__grn_off")).cast("long"))
        .drop("__grn_b", "__grn_off")
    )
