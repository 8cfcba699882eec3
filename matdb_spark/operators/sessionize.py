"""Sessionization: split a per-key event stream on inactivity gaps.

Classic two-window composition (lag → gap flag → cumulative sum), one
shuffle on the key. The batch twin of Structured Streaming's
``session_window`` (the streaming module uses that one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_ms: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Adds a 0-based per-key ``session_col``. Deterministic given a
    total (key, ts, tiebreak…) order; ties on ts are fine because the
    gap flag only depends on ts deltas.

    Boundary: a delta of exactly ``gap_ms`` does NOT split — sessions
    split only on delta STRICTLY greater than the gap, matching
    ``F.session_window`` (verified empirically: two events exactly gap
    apart merge into one session; gap+1ms splits) and
    ``sessionize_with_state`` — batch and streaming paths agree on
    session counts."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    t_ms = F.unix_micros(F.col(ts)) / 1000
    prev = F.lag(t_ms).over(w)
    new_session = F.when(prev.isNull() | ((t_ms - prev) > gap_ms), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
