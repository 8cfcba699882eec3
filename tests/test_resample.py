"""Time-series resampling: gap-filled forward fill and time-weighted
average (operators/resample.py) on hand-computable fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from matdb_spark.operators.resample import resample_ffill, time_weighted_avg


def _series(spark, rows):
    return spark.createDataFrame(rows, "k long, ms long, v double, seq long")


def test_resample_ffill_fills_gaps_and_marks_observed(spark):
    # key 1: samples in buckets 0, 0, 3 (bucket size 10) — last-in-bucket
    # wins, buckets 1-2 forward-filled; key 2: single sample, no gaps.
    df = _series(
        spark,
        [
            (1, 1, 10.0, 1),
            (1, 9, 11.0, 2),   # same bucket, later seq → wins bucket 0
            (1, 35, 14.0, 3),
            (2, 77, 99.0, 4),
        ],
    )
    out = resample_ffill(
        df, ["k"], F.col("ms"), F.col("v"), F.col("seq"), 10
    ).orderBy("k", "bucket")
    got = [(r["k"], r["bucket"], r["value"], r["observed"]) for r in out.collect()]
    assert got == [
        (1, 0, 11.0, True),
        (1, 1, 11.0, False),
        (1, 2, 11.0, False),
        (1, 3, 14.0, True),
        (2, 7, 99.0, True),
    ]


def test_time_weighted_avg_weights_by_holding_time(spark):
    # key 1: v=10 held 10ms, v=20 held 30ms, final sample unweighted
    # → twa = (10*10 + 20*30) / 40 = 17.5
    df = _series(
        spark,
        [
            (1, 0, 10.0, 1),
            (1, 10, 20.0, 2),
            (1, 40, 99.0, 3),
            (2, 0, 5.0, 4),    # single sample → no interval → dropped
        ],
    )
    out = time_weighted_avg(
        df, ["k"], F.col("ms"), F.col("v").cast("decimal(14,2)"), F.col("seq")
    )
    rows = {r["k"]: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1]["twa"] == 17.5
    assert rows[1]["n_intervals"] == 2
    assert rows[1]["span_ms"] == 40


def test_time_weighted_avg_zero_length_intervals_carry_no_weight(spark):
    # two samples at the same ms: first one's holding time is 0
    df = _series(spark, [(1, 0, 100.0, 1), (1, 0, 10.0, 2), (1, 10, 0.0, 3)])
    out = time_weighted_avg(
        df, ["k"], F.col("ms"), F.col("v").cast("decimal(14,2)"), F.col("seq")
    )
    r = out.collect()[0]
    assert r["twa"] == 10.0  # only v=10 held (10ms); v=100 held 0ms
    assert r["n_intervals"] == 2
