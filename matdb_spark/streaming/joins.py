"""Stream-stream joins (event correlation).

The reference is batch-transactional and has no join at all (SURVEY
§2.2); the streaming analogue of its "correlate two feeds" use case
(e.g. the sensor-log example's dictionary lookup, sensor-log.rs:85-104,
but against a moving feed) is Structured Streaming's stream-stream
interval join: both sides buffered in state, matched on equal keys
within an event-time interval, state evicted by watermark.

Scale notes:
- State size is bounded by (watermark + interval) × per-key arrival
  rate — the watermark is NOT optional for an unbounded stream; an
  interval join without it retains both sides forever.
- The join shuffles both streams by key once; output is append-mode
  (each matched pair emits exactly once, when it becomes final under
  the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Inner stream-stream join: equal ``keys`` and
    ``left_ts + lower <= right_ts <= left_ts + upper``.
    Right columns (except join keys) arrive suffixed.
    Works identically on batch DataFrames (the watermark is a no-op),
    so one pipeline definition serves both modes."""
    l = left
    r = right
    for c in right.columns:
        if c not in keys:
            r = r.withColumnRenamed(c, c + suffix)
    r_ts = right_ts + suffix
    if left.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if right.isStreaming:
        r = r.withWatermark(r_ts, watermark)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (l[k] == r[k])
    cond = cond & (r[r_ts] >= F.expr(f"`{left_ts}` + INTERVAL {lower}"))
    cond = cond & (r[r_ts] <= F.expr(f"`{left_ts}` + INTERVAL {upper}"))
    joined = l.join(r, cond, "inner")
    # drop the duplicated key columns from the right side
    return joined.select(
        *[l[c] for c in left.columns],
        *[r[c] for c in r.columns if c.endswith(suffix) or c not in keys],
    )


def static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) static
    dimension — the canonical ingest-time dimension lookup. Stateless
    (nothing buffered, no watermark needed): each micro-batch joins
    against the CURRENT static relation, so dimension updates between
    batches are picked up automatically. The explicit broadcast keeps
    the stream side shuffle-free at any scale; only the dim must fit
    in executor memory."""
    return stream.join(F.broadcast(dim), keys, how)
