"""Time-series resampling — the rollups the reference's sensor-series
use case needs (README.md:10-12 positions matdb for "timeseries data";
its only read is the ordered scan, so downsampling/gap-filling happened
in host code — here they are first-class distributed operators).

- ``resample_ffill``: regularize an irregular series onto a fixed
  bucket grid, forward-filling gaps from the last observation.
- ``time_weighted_avg``: average where each sample is weighted by how
  long it remained current (the correct mean for irregularly-sampled
  state series, vs the naive row mean that over-weights bursts).

Scale notes (100 TB):
- One shuffle each (the per-key groupBy / window partition). The grid
  explode in ``resample_ffill`` is generated per key AFTER the
  per-bucket aggregation, so its input is |keys|·|buckets-spanned|
  rows, not raw rows — bounded by the time span, not data volume.
- The forward-fill window is ``last(ignorenulls)`` over rows — a
  running accumulator, no per-row rescan; partitions are per-key, so
  skew equals real key skew (AQE handles it).
- All arithmetic is integer/decimal-exact until the final division,
  keeping results bit-identical across engines and run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def resample_ffill(
    df: DataFrame,
    keys: list[str],
    ts_ms: Column,
    value: Column,
    order: Column,
    bucket_ms: int,
) -> DataFrame:
    """Downsample onto a ``bucket_ms`` grid per key and forward-fill.

    For each key the output covers every bucket from its first to its
    last observation (inclusive). ``value`` for a bucket is the LAST
    observation within it (by ``order``, which must be unique per key
    — pass a (ts, id) composite); empty buckets carry the previous
    bucket's value with ``observed = false``.

    Output: keys…, bucket (long), value, observed (boolean).
    """
    bucket = F.floor(ts_ms / F.lit(bucket_ms)).cast("long").alias("bucket")
    per_bucket = (
        df.select(*keys, bucket, value.alias("__v"), order.alias("__ord"))
        .groupBy(*keys, "bucket")
        .agg(
            F.max_by("__v", F.col("__ord")).alias("__v"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    # per-key span → dense grid (generated after aggregation: rows are
    # |keys|·|buckets|, independent of raw data volume)
    span = per_bucket.groupBy(*keys).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = span.select(
        *keys, F.explode(F.sequence("__lo", "__hi")).alias("bucket")
    )
    joined = grid.join(per_bucket, [*keys, "bucket"], "left")
    w = (
        W.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # ``observed`` means "the bucket had at least one row", NOT "the
    # value is non-null" — a genuine NULL observation must surface as
    # (value=NULL, observed=true), not be overwritten by stale carry.
    # Wrapping the value in a struct lets last(ignorenulls) skip only
    # truly-empty buckets while carrying null-valued observations.
    observed = F.col("__cnt").isNotNull()
    wrapped = F.when(observed, F.struct(F.col("__v").alias("v")))
    return joined.select(
        *keys,
        "bucket",
        F.last(wrapped, ignorenulls=True).over(w)["v"].alias("value"),
        observed.alias("observed"),
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    ts_ms: Column,
    value: Column,
    order: Column,
) -> DataFrame:
    """Per-key time-weighted average: each sample is weighted by the
    interval until the next sample (the last sample of a key carries no
    weight — its holding time is unknown). ``value`` should be an
    exact (decimal) column; the weighted sum stays decimal-exact and
    only the final ratio is floating point.

    Output: keys…, twa (double), n_intervals (long), span_ms (long).
    """
    t = df.select(*keys, ts_ms.alias("__ms"), value.alias("__v"), order.alias("__ord"))
    w = W.partitionBy(*keys).orderBy("__ord")
    t = t.withColumn("__dt", F.lead("__ms").over(w) - F.col("__ms")).filter(
        F.col("__dt").isNotNull()
    )
    return t.groupBy(*keys).agg(
        (
            F.sum(F.col("__v") * F.col("__dt")).cast("double")
            / F.sum("__dt").cast("double")
        ).alias("twa"),
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("__dt").alias("span_ms"),
    )
