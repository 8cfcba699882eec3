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
