"""Group-map Pandas operators (``groupBy().applyInPandas``).

The third Python escape hatch after scalar pandas UDFs and
mapInPandas: the whole group arrives as ONE pandas DataFrame, for
algorithms that genuinely need all group rows in memory (per-group
model fits, complex rank logic). Cost model at scale: one shuffle on
the group key, and the LARGEST GROUP must fit in one task's memory —
pre-split giant groups (salt) or cap them upstream.

``rank_normalize`` is deliberately integer-exact (rank and count are
ints; their ratio divides identically in any IEEE engine), so the
whole Arrow → pandas → Arrow path is verifiable against a SQL oracle
bit-for-bit — the point is proving the plumbing, not the arithmetic.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def rank_normalize(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """(keys…, id, rank, pct_rank) per group: dense position of
    (value, id) in ascending order and rank/count. Ties broken by id —
    fully deterministic."""
    key_fields = [df.schema[k] for k in keys]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("rank", LongType()),
            StructField("pct_rank", DoubleType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([value_col, id_col], kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        out = pdf[list(keys) + [id_col]].copy()
        out["rank"] = range(1, n + 1)
        out["pct_rank"] = [(i + 1) / n for i in range(n)]
        return out

    return df.groupBy(*keys).applyInPandas(per_group, out_schema)


def cogroup_stats(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Cogrouped Pandas map (``cogroup().applyInPandas``): both sides'
    rows for one key arrive as two pandas frames in one task — the
    escape hatch for per-key merge logic no join expresses (custom
    reconciliation, per-key model scoring against reference data).

    Emits integer-exact per-key stats (counts + min ids) so the
    co-shuffle plumbing is oracle-checkable: equivalent to a full outer
    join of the two sides' aggregates. Scale: one shuffle per side on
    the key; each side's largest single-key group must fit in memory.
    """
    key_fields = [left.schema[k] for k in keys]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("n_left", LongType(), False),
            StructField("min_left_id", left.schema[left_id].dataType),
            StructField("n_right", LongType(), False),
            StructField("min_right_id", right.schema[right_id].dataType),
        ]
    )

    def per_key(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        src = lpdf if len(lpdf) else rpdf
        row = {k: [src.iloc[0][k]] for k in keys}
        row["n_left"] = [len(lpdf)]
        row["min_left_id"] = [lpdf[left_id].min() if len(lpdf) else None]
        row["n_right"] = [len(rpdf)]
        row["min_right_id"] = [rpdf[right_id].min() if len(rpdf) else None]
        return pd.DataFrame(row)

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(per_key, out_schema)
    )
