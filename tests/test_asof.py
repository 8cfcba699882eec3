"""As-of join strategies must agree: range-join+max_by (A) vs
single-shuffle union+carry-forward (B), plus tolerance and forward
direction behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from matdb_spark.operators.asof import asof_join, asof_join_sorted
from matdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _sides(spark):
    ev = load_table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    return purchases, clicks


def test_strategies_agree(spark):
    purchases, clicks = _sides(spark)
    a = asof_join(purchases, clicks, on="ts", by=["user_id"])
    b = asof_join_sorted(purchases, clicks, on="ts", by=["user_id"])
    cols = ["user_id", "event_id", "ts", "event_id_right", "ts_right"]
    sa = {tuple(r) for r in a.select(*cols).collect()}
    sb = {tuple(r) for r in b.select(*cols).collect()}
    assert sa == sb and len(sa) > 0


def test_forward_direction_and_tolerance(spark):
    purchases, clicks = _sides(spark)
    fwd = asof_join(purchases, clicks, on="ts", by=["user_id"], direction="forward")
    rows = fwd.filter(F.col("ts_right").isNotNull()).select("ts", "ts_right").collect()
    assert rows and all(r["ts_right"] >= r["ts"] for r in rows)

    tol = asof_join(purchases, clicks, on="ts", by=["user_id"], tolerance_ms=60_000)
    trows = tol.filter(F.col("ts_right").isNotNull()).select("ts", "ts_right").collect()
    for r in trows:
        delta_ms = (r["ts"] - r["ts_right"]).total_seconds() * 1000
        assert 0 <= delta_ms <= 60_000
    # tolerance can only reduce the match set
    n_all = asof_join(purchases, clicks, on="ts", by=["user_id"]).filter(
        F.col("ts_right").isNotNull()
    ).count()
    assert len(trows) <= n_all
