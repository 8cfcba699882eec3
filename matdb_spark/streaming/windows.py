"""Event-time window aggregations — one code path for batch & stream.

All three shapes are plain ``groupBy(window_fn(ts), *keys)`` plans:
on a batch DataFrame they run as ordinary hash aggregations; on a
streaming DataFrame Spark maintains window state per key, and the
optional watermark bounds that state (late rows beyond the watermark
are dropped — the standard completeness/latency trade).

Scale notes:
- state size ~ (#open windows × #keys); the watermark is what keeps
  it finite — always set one on unbounded streams.
- the aggregation is the only shuffle; partial aggregation happens
  map-side exactly as in batch.
- session windows merge on the fly (gap-based); skewed keys produce
  skewed state — mitigate by salting the key for the count-style
  aggs, or capping session length upstream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _windowed(
    df: DataFrame,
    win: Column,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: tuple[str, str] | None,
) -> DataFrame:
    if watermark is not None:
        df = df.withWatermark(*watermark)
    out = df.groupBy(win.alias("__win"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("__win.start").alias("window_start"),
        F.col("__win.end").alias("window_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in out.columns if c != "__win" and c not in keys],
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows aligned to the epoch.
    ``duration`` e.g. '5 minutes'; default agg is a row count ``n``."""
    return _windowed(
        df,
        F.window(F.col(ts_col), duration),
        keys,
        list(aggs) if aggs else [F.count(F.lit(1)).alias("n")],
        watermark,
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Overlapping windows of ``duration`` advancing every ``slide``
    (each row lands in duration/slide windows)."""
    return _windowed(
        df,
        F.window(F.col(ts_col), duration, slide),
        keys,
        list(aggs) if aggs else [F.count(F.lit(1)).alias("n")],
        watermark,
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Gap-based session windows (a session closes after ``gap`` of
    inactivity; window end = last event + gap). Streaming mode
    requires a watermark so closed sessions can be finalized."""
    return _windowed(
        df,
        F.session_window(F.col(ts_col), gap),
        keys,
        list(aggs) if aggs else [F.count(F.lit(1)).alias("n")],
        watermark,
    )


def run_to_memory_sink(
    out: DataFrame,
    name: str,
    checkpoint: str,
    output_mode: str = "complete",
):
    """Execute a (finite) streaming plan to completion into an
    in-memory table via availableNow, returning after the last batch.
    Used by tests and the gate harness; production sinks would be
    parquet/kafka with the same writeStream call.

    Shuffle partitions = the state-store instance count for stateful
    streaming operators, captured at stream START from the session
    conf (not settable per-query). For a one-batch availableNow run,
    32 stores is pure checkpoint overhead (measured 17 s vs 2.6 s on
    the stream-stream join at sf0.1) — so the start is wrapped in a
    small, env-overridable count ($SPARK_GRAFT_STREAM_SHUFFLE,
    default 8). On a cluster this knob is sized to sustained
    throughput, not to a single finite batch; partitioning never
    changes WHAT a stateful operator computes, only how many state
    stores hold it."""
    import os

    spark = out.sparkSession
    parts = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return q
