"""As-of join — Spark lacks a native one; two composable strategies.

Semantics: for each left row, attach the single right row with the
greatest ``right_on <= left_on`` (backward; forward is the mirror),
optionally within equal ``by`` keys. Matches DuckDB/kdb ASOF JOIN and
pandas ``merge_asof``.

Strategy A (default, ``asof_join``): range-join + max_by aggregation.
    left ⋈ right on (by, right_on <= left_on) → groupBy left pk →
    max_by(right payload, right_on).
    Pure built-ins, partial aggregation, no Python. The intermediate
    is bounded by (left rows × matching right rows); with a
    ``tolerance`` bound the match window stays small and Spark's
    range-join machinery + AQE handle the rest.

Strategy B (``asof_join_sorted``): union + window carry-forward.
    Tag right rows, union with left, window partitioned by ``by``
    ordered by time, ``last(right_payload, ignorenulls=True)`` carries
    the latest right row forward onto each left row. Exactly one
    shuffle on ``by`` regardless of window size — the 100 TB choice
    when ``by`` has reasonable cardinality and no tolerance is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    by: list[str] | None = None,
    right_by: list[str] | None = None,
    tolerance_ms: int | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tie_break: str | None = None,
) -> DataFrame:
    """Strategy A: range join + max_by. Left columns are preserved;
    right columns arrive suffixed (including the time column).

    ``tie_break``: optional right-side column (pre-suffix name) used as
    a secondary order key when two right rows share the same ``on``
    instant — without it the winner among equal timestamps is
    arbitrary (matching pandas/DuckDB, which are also arbitrary, but
    unverifiable cross-engine). The preference follows the direction's
    order: ``backward`` (max_by) keeps the LARGEST tie_break among the
    equal instants, ``forward`` (min_by) the SMALLEST — write
    direction-matched oracles (``ORDER BY ts DESC, tb DESC`` vs
    ``ts ASC, tb ASC``)."""
    right_on = right_on or on
    by = by or []
    right_by = right_by or by
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, c + suffix)
    r_on = right_on + suffix

    cond = F.lit(True)
    for lb, rb in zip(by, right_by):
        cond = cond & (left[lb] == r[rb + suffix])
    # timestampadd works for TIMESTAMP, TIMESTAMP_NTZ, and DATE alike
    # (unix_micros would reject NTZ inputs).
    if direction == "backward":
        cond = cond & (r[r_on] <= left[on])
        if tolerance_ms is not None:
            cond = cond & (
                r[r_on] >= F.timestamp_add("MILLISECOND", F.lit(-tolerance_ms), left[on])
            )
    else:
        cond = cond & (r[r_on] >= left[on])
        if tolerance_ms is not None:
            cond = cond & (
                r[r_on] <= F.timestamp_add("MILLISECOND", F.lit(tolerance_ms), left[on])
            )

    # Surrogate key so duplicate left rows each survive the group-by
    # (pandas merge_asof / DuckDB ASOF JOIN preserve every left row;
    # grouping by the left *columns* would collapse duplicates and
    # diverge from asof_join_sorted on non-unique inputs).
    lid = "__asof_lid"
    left_keyed = left.withColumn(lid, F.monotonically_increasing_id())
    joined = left_keyed.join(r, cond, "left")
    payload_cols = [c for c in r.columns]
    payload = F.struct(*[joined[c] for c in payload_cols])
    # backward: newest right_on <= left_on; forward: oldest >= left_on.
    # min_by avoids negating the order key (type-agnostic). The
    # optional tie_break column rides in a struct (lexicographic
    # struct comparison = ORDER BY ts, tie_break).
    pick = F.max_by if direction == "backward" else F.min_by
    order_key = (
        F.struct(joined[r_on], joined[tie_break + suffix])
        if tie_break
        else joined[r_on]
    )
    agg = joined.groupBy(joined[lid]).agg(
        *[F.first(joined[c]).alias(c) for c in left.columns],
        pick(payload, order_key).alias("__m"),
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(c) for c in payload_cols
    ]
    return agg.select(*out_cols)


def asof_join_sorted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Strategy B: single-shuffle union + carry-forward window
    (backward direction). Preferred at scale for keyed time series."""
    r_payload = [c for c in right.columns if c not in by]
    # NULL-timestamp right rows can never satisfy ``right_on <=
    # left_on``; dropping them up front keeps parity with Strategy A
    # (asc() sorts nulls FIRST, so an unfiltered null-ts right row
    # would be carried onto every left row preceding any real match).
    right = right.filter(F.col(on).isNotNull())
    tagged_r = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c + suffix) for c in r_payload]).alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
    )
    tagged_l = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(tagged_r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in left.columns if c not in by],
    )
    u = tagged_r.unionByName(tagged_l)
    # right rows sort before left rows at equal timestamps so a
    # same-instant right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1)
    cols = (
        [F.col(c) for c in by]
        + [F.col("__t").alias(on)]
        + [F.col(c) for c in left.columns if c not in by and c != on]
        + [F.col(f"__last.{c + suffix}").alias(c + suffix) for c in r_payload]
    )
    return out.select(*cols)
