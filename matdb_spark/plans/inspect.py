"""Parse `df.explain()` output into checkable facts.

Works on the formatted explain string — stable enough across Spark 3/4
for the coarse assertions we need (operator presence/counts, pushdown
strings). For exact plan surgery use df._jdf.queryExecution(), but
string-level checks keep the tests readable and version-tolerant.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def exchange_count(df: DataFrame) -> int:
    """Number of distinct Exchange (shuffle) operators in the plan.
    ReusedExchange nodes are not counted — they cost nothing extra."""
    return _count_nodes(physical_plan(df), "Exchange")


def _count_nodes(plan: str, name: str) -> int:
    # formatted mode lists each node once as "(n) NodeName"
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return _count_nodes(plan, "BroadcastHashJoin") + _count_nodes(
        plan, "BroadcastNestedLoopJoin"
    )


def shuffle_join_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return _count_nodes(plan, "SortMergeJoin") + _count_nodes(plan, "ShuffledHashJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node (row-group zone-map
    pruning evidence — the Spark form of the reference's block min/max
    bounds, segment.rs:138-163)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        # filters are Func(col,value) tokens — split on commas that are
        # OUTSIDE parentheses only
        out.extend(
            s.strip() for s in re.split(r",(?![^(]*\))", m.group(1)) if s.strip()
        )
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters from scan nodes (Hive partition pruning — the
    Spark form of the reference's chunk routing, schema.rs:28-38)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_counts(df: DataFrame) -> int:
    return _count_nodes(physical_plan(df), "Scan parquet")
