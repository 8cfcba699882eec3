"""Grouped top-k via ranking window.

``row_number`` over (group, order) then ``rn <= k``. Spark pushes a
per-partition top-k (``WindowGroupLimit``) below the shuffle, so each
map task ships at most k rows per group — the right plan at 100 TB.
Always pass a total order (tie-breaker columns) for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
