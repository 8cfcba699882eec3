"""Skew mitigation: salted two-stage operators.

Sum/count/min/max aggregations are skew-immune in Spark (map-side
partial aggregation shrinks hot keys before the shuffle), and AQE
splits skewed JOIN partitions at runtime. The remaining victim is the
per-key WINDOW computation (ranking/top-k): all rows of a hot key land
in one task, however hot.

``salted_top_k_per_group`` breaks that: stage 1 ranks within
(key, salt) — a hot key's rows spread over ``salt_buckets`` tasks,
each keeping k candidates; stage 2 ranks the ≤ k·buckets survivors
per key. Correct because a key's global top-k is always a subset of
the union of its per-salt top-ks. Cost: one extra (tiny) shuffle over
k·buckets rows per key.

The salt is a deterministic hash of the ordering columns (not a
random number): reruns and retries produce identical partitioning —
required for exactly-once sinks and for oracle-checked results.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from matdb_spark.operators.topk import top_k_per_group


def salted_top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_buckets: int = 32,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key top-k that survives arbitrarily hot keys.

    ``salt_on``: columns whose hash spreads a key's rows (defaults to
    every non-key column — any per-row-varying subset works)."""
    salt_cols = list(salt_on) if salt_on else [c for c in df.columns if c not in keys]
    if not salt_cols:
        raise ValueError("need at least one non-key column to salt on")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    )
    stage1 = top_k_per_group(salted, list(keys) + ["__salt"], order_cols, k).drop(
        "__salt", "rank"
    )
    return top_k_per_group(stage1, list(keys), order_cols, k)
