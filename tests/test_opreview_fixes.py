"""Regression tests for the round-2 operator/streaming review fixes:

1. range_join(how='left') preserves unmatched left rows (was silently
   degraded to inner by the post-join filter); unsupported how raises.
2. Batch sessionize splits on delta >= gap (aligned with
   F.session_window / sessionize_with_state end-exclusive semantics).
3. asof_join_sorted ignores NULL-timestamp right rows (parity with
   Strategy A, where right_on <= left_on is never satisfied by NULL).
4. resample_ffill reports a genuine NULL observation as
   (value=NULL, observed=true) instead of forward-filling over it.
5. connected_components raises on non-convergence instead of
   returning intermediate (wrong) labels.
6. decode_assets honors a non-long id column's type.
7. apply_diff keeps the state's declared decimal sum type (no
   precision widening per application).
8. The stateful sessionizer's fold never moves session bounds
   backwards on late cross-batch events.
"""

import datetime

import pytest

from pyspark.sql import Row, functions as F

from matdb_spark.operators.asof import asof_join, asof_join_sorted
from matdb_spark.operators.dedup import connected_components
from matdb_spark.operators.incremental import apply_diff, sum_count_state
from matdb_spark.operators.rangejoin import range_join
from matdb_spark.operators.resample import resample_ffill
from matdb_spark.operators.sessionize import sessionize
from matdb_spark.streaming.stateful import _fold_session_events


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(minutes=minute)


def test_range_join_left_preserves_unmatched(spark):
    left = spark.createDataFrame(
        [Row(k=1, lo=100, hi=200), Row(k=2, lo=100, hi=200)]
    )
    right = spark.createDataFrame([Row(k=1, rv=150, payload="a")])
    out = range_join(
        left, right, "lo", "hi", "rv", on=["k"], bucket_width=50, how="left"
    ).collect()
    assert len(out) == 2
    by_k = {r["k"]: r for r in out}
    assert by_k[1]["payload"] == "a"
    assert by_k[2]["payload"] is None  # unmatched left row survives


def test_range_join_rejects_unsupported_how(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="inner"):
        range_join(df, df, "id", "id", "id", how="full")


def test_sessionize_boundary_matches_session_window(spark):
    # two events exactly gap apart -> ONE session (split is strictly
    # greater-than), matching F.session_window's empirical behavior;
    # one millisecond past the gap -> TWO sessions
    gap = 60_000
    exact = spark.createDataFrame(
        [Row(k=1, ts=_ts(0)), Row(k=1, ts=_ts(1))]  # exactly 60s apart
    )
    past = spark.createDataFrame(
        [Row(k=1, ts=_ts(0)),
         Row(k=1, ts=_ts(1) + datetime.timedelta(milliseconds=1))]
    )
    for df, want in ((exact, 1), (past, 2)):
        got = sessionize(df, "k", "ts", gap_ms=gap).agg(
            (F.max("session_id") + 1).alias("n")
        ).collect()[0]["n"]
        sw = df.groupBy(F.session_window("ts", "60 seconds"), "k").count().count()
        assert got == want and sw == want


def test_asof_sorted_ignores_null_right_timestamps(spark):
    left = spark.createDataFrame([Row(sym="A", ts=_ts(10), side="L")])
    right = spark.createDataFrame(
        [Row(sym="A", ts=None, px=99), Row(sym="A", ts=_ts(20), px=7)]
    )
    b = asof_join_sorted(left, right, on="ts", by=["sym"]).collect()
    assert len(b) == 1
    assert b[0]["px_right"] is None  # no right row at/before 10:00
    a = asof_join(left, right, on="ts", by=["sym"]).collect()
    assert a[0]["px_right"] is None  # parity with Strategy A


def test_resample_ffill_null_observation_not_overwritten(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, ms=0, v=10, ord=0),
            Row(k=1, ms=1000, v=None, ord=1),  # genuine NULL reading
            Row(k=1, ms=3000, v=30, ord=3),
        ]
    )
    out = resample_ffill(
        df, ["k"], F.col("ms"), F.col("v"), F.col("ord"), bucket_ms=1000
    ).orderBy("bucket").collect()
    assert [(r["bucket"], r["value"], r["observed"]) for r in out] == [
        (0, 10, True),
        (1, None, True),  # null observation surfaces, observed
        (2, None, False),  # empty bucket carries the LAST observation (null)
        (3, 30, True),
    ]


def test_connected_components_raises_on_nonconvergence(spark):
    # chain 1-2-3-4: min-label needs >1 round of propagation. The
    # contraction main path resolves chains without iterating, so the
    # convergence guard lives in the label-propagation fallback.
    from matdb_spark.operators.dedup import _label_propagation_cc

    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4)]
    )
    with pytest.raises(RuntimeError, match="converge"):
        _label_propagation_cc(pairs, max_iter=1)
    ok = connected_components(pairs, "id_a", "id_b", driver_threshold=0).collect()
    assert {r["cluster_id"] for r in ok} == {1}


def test_decode_assets_string_id(spark):
    from matdb_spark.operators import multimodal as mm

    docs = spark.createDataFrame([Row(doc_key="u-1", text="hello world")])
    decoded = mm.decode_assets(
        mm.attach_payload(docs, "text"), "doc_key"
    ).collect()
    assert decoded[0]["doc_key"] == "u-1"


def test_apply_diff_sum_type_stable(spark):
    base = spark.createDataFrame(
        [Row(g=1, v=100), Row(g=1, v=200)]
    )
    state = sum_count_state(base, ["g"], ["v"])
    sum_type = state.schema["sum_v"].dataType
    diff = spark.createDataFrame(
        [("insert", 1, 50, None, None)],
        "change_type string, g long, v long, old_g long, old_v long",
    )
    patched = apply_diff(state, diff, ["g"], ["v"])
    assert patched.schema["sum_v"].dataType == sum_type
    # chain a second application: still stable
    patched2 = apply_diff(patched, diff, ["g"], ["v"])
    assert patched2.schema["sum_v"].dataType == sum_type


def test_stateful_fold_never_moves_bounds_backwards():
    gap = 30 * 60 * 1000
    m = 60 * 1000
    # batch 1: events at 0 and 29min -> open session [0, 29min]
    start, last, n, closed = _fold_session_events(
        None, None, 0, 7, [0, 29 * m], gap
    )
    assert (start, last, n, closed) == (0, 29 * m, 2, [])
    # batch 2: late event at 5min plus one at 40min — 40min is within
    # gap of 29min, so NO session closes and bounds only extend
    start, last, n, closed = _fold_session_events(
        start, last, n, 7, [5 * m, 40 * m], gap
    )
    assert closed == []
    assert (start, last, n) == (0, 40 * m, 4)
    # an event at EXACTLY last+gap merges (strict > split, matching
    # F.session_window); one ms past the gap closes the session
    s, l, c, closed = _fold_session_events(0, 0, 1, 7, [gap], gap)
    assert closed == [] and (s, l, c) == (0, gap, 2)
    s, l, c, closed = _fold_session_events(0, 0, 1, 7, [gap + 1], gap)
    assert closed == [(7, 0, gap, 1)] and (s, l, c) == (gap + 1, gap + 1, 1)
