"""Grouped-aggregate pandas UDFs (the Python custom-UDAF surface).

Deliberately NO ``from __future__ import annotations`` here: Spark
infers the GROUPED_AGG evaluation type from the real ``pd.Series ->
scalar`` signature, and postponed annotation evaluation (PEP 563)
leaves only strings behind — the UDF would be mis-typed as SCALAR and
fail analysis inside ``agg()``.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_agg(v: pd.Series) -> float:
    """Exact median — order-independent, and binary-exact for integer
    inputs (integer or half-integer result), so cross-engine
    hash-comparison is safe where float sums would not be.

    All-null group → NULL (SQL semantics), not NaN — NaN would poison
    comparisons and cross-engine hash checks."""
    m = v.median()
    return None if pd.isna(m) else float(m)


@pandas_udf("long")
def count_agg(v: pd.Series) -> int:
    """SQL count(col) semantics: non-null values only (len(v) would
    behave as count(*) and diverge from any SQL oracle on nulls)."""
    return int(v.count())
