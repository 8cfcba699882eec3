"""Range join: equi-keys + an interval predicate on an ordered column.

A naive ``a.join(b, (b.t >= a.lo) & (b.t <= a.hi))`` with no equi-key
degenerates to a broadcast-nested-loop — O(|a|·|b|) at scale. The
scalable plan bucketizes the ordered column: each left interval lands
in ``ceil((hi-lo)/bucket)+1`` buckets, the right side in one; an
*equi* join on (keys…, bucket) prunes to neighboring rows and the
exact interval predicate filters the rest. That turns the nested loop
into a hash/sort-merge join whose cost tracks the true match count —
the standard interval-bucketing scheme (cf. interval joins in stream
processors and range-join optimizations in warehouse engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    lo: Column | str,
    hi: Column | str,
    right_value: Column | str,
    on: list[str] | None = None,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` whose ``right_value`` lies in the left
    row's ``[lo, hi]`` interval, matching equi-keys ``on`` first.

    ``lo``/``hi``/``right_value`` are long-valued columns (e.g. epoch
    millis). ``bucket_width`` defaults to a heuristic; pick ~ the
    typical interval width so each left row explodes into ~2 buckets.
    """
    if how not in ("inner", "left"):
        # outer variants can't be a post-filter on the bucketized join
        # (the filter would drop the null-extended rows again) — only
        # the two supported shapes are implemented correctly.
        raise ValueError(f"range_join supports how='inner' or 'left', got {how!r}")
    lo_c = F.col(lo) if isinstance(lo, str) else lo
    hi_c = F.col(hi) if isinstance(hi, str) else hi
    rv_c = F.col(right_value) if isinstance(right_value, str) else right_value
    on = on or []

    if bucket_width is None:
        bucket_width = 3_600_000  # 1h in ms — caller should size this

    left_base = left
    if how == "left":
        left_base = left_base.withColumn("__lid", F.monotonically_increasing_id())
    l = left_base.withColumn("__lo", lo_c.cast("long")).withColumn("__hi", hi_c.cast("long"))
    l = l.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col("__lo") / bucket_width), F.floor(F.col("__hi") / bucket_width))),
    )
    r = right.withColumn("__rv", rv_c.cast("long")).withColumn(
        "__bucket", F.floor(F.col("__rv") / bucket_width)
    )
    keys = on + ["__bucket"]
    cond = (F.col("__rv") >= F.col("__lo")) & (F.col("__rv") <= F.col("__hi"))
    # inner core: each matching (left, right) pair meets in exactly one
    # bucket (the right row's), so the explode introduces no duplicates
    out = l.join(r, keys, "inner").filter(cond).drop("__lo", "__hi", "__rv", "__bucket")
    if how == "inner":
        return out
    # left outer: append unmatched left rows with null right columns
    # (anti-join on the surrogate id — NOT a filter on the outer join,
    # which would silently degrade to inner semantics)
    right_only = [f for f in right.schema.fields if f.name not in set(on)]
    unmatched = left_base.join(out.select("__lid"), "__lid", "left_anti")
    for f in right_only:
        unmatched = unmatched.withColumn(f.name, F.lit(None).cast(f.dataType))
    return out.unionByName(unmatched).drop("__lid")
