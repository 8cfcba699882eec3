"""Round-7 fixes for the round-6 ADVICE findings.

1. catalog.register_store's default pin must use the out-of-order-safe
   watermark (min outstanding reservation - 1), so a lower-id txn that
   commits AFTER registration can never surface through the view.
2. sampling.assign_splits thresholds must be exact integer hash-space
   units (0.7 -> 700000, never 699999 via float floor-truncation).
3. quantization.sq8_train / read_sq8_ranges must raise a descriptive
   ValueError naming missing dimensions on ragged / all-null input.
4. ranking.global_running_sum / global_row_number must keep rows whose
   bucket is NULL (sentinel bucket, sorts first) instead of silently
   dropping them at the offset join.
5. catalog.register_warehouse must sanitize directory names that are
   not valid SQL identifiers instead of aborting discovery.
"""

import os

import pytest
from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.catalog import _view_name, register_store, register_warehouse
from matdb_spark.operators.quantization import read_sq8_ranges, sq8_train
from matdb_spark.operators.ranking import global_row_number, global_running_sum
from matdb_spark.operators.sampling import assign_splits


def _mk_store(spark, path, n=5):
    db = Database.create(
        spark, path, Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    )
    t = db.begin()
    t.add_rows([[i, i] for i in range(n)])
    t.commit()
    return db


def test_register_store_pins_below_outstanding_reservation(spark, tmp_db_path):
    """A lower-id txn reserved BEFORE registration but committed AFTER
    must stay invisible through the pinned view (the r6 ADVICE race:
    pinning at max(committed) lets a late lower-id manifest slip under
    the horizon)."""
    db = _mk_store(spark, tmp_db_path, n=3)  # txn 1: k=0..2
    # Writer A reserves the next id but does not publish yet.
    pending = db.begin()
    pending.add_row([10, 1000])
    pending_id = pending._ensure_txn_id()
    # Writer B reserves a HIGHER id and commits first (out-of-order).
    later = db.begin()
    later.add_row([20, 2000])
    later.commit()
    assert later.txn_id > pending_id

    register_store(spark, "advice_pin_view", tmp_db_path)
    n0 = spark.sql("SELECT COUNT(*) AS n FROM advice_pin_view").first()["n"]
    # Pin sits BELOW the outstanding reservation: neither writer's rows
    # are visible (safety over freshness while a lower id is in flight).
    assert n0 == 3

    # The straggler publishes with the LOWER id...
    pending.commit()
    # ...and the already-registered view must NOT see it (nor writer B).
    n1 = spark.sql("SELECT COUNT(*) AS n FROM advice_pin_view").first()["n"]
    assert n1 == 3
    spark.catalog.dropTempView("advice_pin_view")


def test_assign_splits_exact_integer_thresholds(spark):
    """weights (0.7, 0.2, 0.1): the SECOND boundary must be exactly
    900000 of the 1e6 hash space — the float cumulative sum 0.7 + 0.2
    is 0.8999999999999999, whose floor-truncated product is 899999, so
    a hash landing on 899999 classified as 'c' under the old code."""
    # the trap this fix closes: floor truncation of the float cumsum
    assert int((0.7 + 0.2) * 1_000_000) == 899_999
    from matdb_spark.operators.sampling import _MOD, hash_hex

    df = spark.range(0, 50_000).withColumnRenamed("id", "doc_id")
    out = assign_splits(
        df, "doc_id", weights=(("a", 0.7), ("b", 0.2), ("c", 0.1))
    )
    h = (
        hash_hex(F.concat(F.lit("split:"), F.col("doc_id").cast("string")), 15)
        % _MOD
    )
    boundary = out.withColumn("h", h).where(F.col("h") == 899_999)
    for r in boundary.collect():
        assert r["split"] == "b", r
    frac = {
        r["split"]: r["n"] / 50_000.0
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["a"] - 0.7) < 0.02 and abs(frac["c"] - 0.1) < 0.01


def test_sq8_train_ragged_vectors_diagnostic(spark):
    # a hole in the index space (dim 1 null in every row) must raise a
    # descriptive error naming the missing dimension, not a KeyError
    holed = spark.createDataFrame(
        [(1, [1.0, None, 3.0]), (2, [2.0, None, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match=r"missing \[1\]"):
        sq8_train(holed, "embedding")
    # contiguous dims still train fine
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    assert len(sq8_train(ok, "embedding")) == 2


def test_read_sq8_ranges_missing_dim_diagnostic(spark, tmp_db_path):
    p = os.path.join(tmp_db_path, "idx")
    spark.createDataFrame(
        [(0, 0.0, 1.0), (2, 0.0, 1.0)], "i INT, lo DOUBLE, hi DOUBLE"
    ).write.parquet(p + "/_sq8")
    with pytest.raises(ValueError, match=r"read_sq8_ranges.*missing \[1\]"):
        read_sq8_ranges(spark, p)


def test_global_running_sum_null_bucket_rows_survive(spark):
    df = spark.createDataFrame(
        [(None, 1, 10), (0, 2, 20), (0, 3, 30), (5, 4, 40)],
        "b int, id int, w int",
    )
    out = global_running_sum(df, ["id"], F.col("b"), "w", out_col="rs").collect()
    assert len(out) == 4  # the NULL-bucket row is NOT dropped
    by_id = {r["id"]: r["rs"] for r in out}
    # NULL bucket sorts first (NULLS FIRST), then bucket 0, then 5.
    assert by_id == {1: 10, 2: 30, 3: 60, 4: 100}


def test_global_row_number_null_bucket_rows_survive(spark):
    df = spark.createDataFrame(
        [(None, "x"), (1, "y"), (None, "a")], "b int, id string"
    )
    out = global_row_number(df, ["id"], F.col("b"), out_col="rn").collect()
    assert {(r["id"], r["rn"]) for r in out} == {("a", 1), ("x", 2), ("y", 3)}


def test_register_warehouse_sanitizes_bad_names(spark, tmp_db_path):
    for d in ["my-store", "1data", "good_one"]:
        _mk_store(spark, os.path.join(tmp_db_path, d), n=1)
    views = register_warehouse(spark, tmp_db_path, prefix="wh_adv_")
    assert set(views) == {"wh_adv_my_store", "wh_adv_1data", "wh_adv_good_one"}
    for v in views:
        assert spark.sql(f"SELECT count(*) AS n FROM {v}").first()["n"] == 1
        spark.catalog.dropTempView(v)


def test_view_name_collision_suffix():
    assert _view_name("a-b", {"a_b"}) == "a_b_2"
    assert _view_name("1x", set()) == "_1x"
    assert _view_name("", set()) == "_store"
