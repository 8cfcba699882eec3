"""Session-catalog views over matdb stores (matdb_spark/catalog.py):
SQL-by-name access, warehouse discovery, and the measured
snapshot-pinning freshness contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.catalog import refresh_store, register_store, register_warehouse


def _mk_store(spark, path, n=20):
    db = Database.create(
        spark, path, Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    )
    t = db.begin()
    t.add_rows([[i, i] for i in range(n)])
    t.commit()
    return db


def test_register_store_sql_by_name(spark, tmp_db_path):
    _mk_store(spark, os.path.join(tmp_db_path, "s1"))
    register_store(spark, "cat_s1", os.path.join(tmp_db_path, "s1"))
    row = spark.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM cat_s1").first()
    assert (row["n"], row["s"]) == (20, 190)
    # joins and filters through the view work like any table
    row2 = spark.sql(
        "SELECT COUNT(*) AS n FROM cat_s1 a JOIN cat_s1 b ON a.k = b.k WHERE a.v >= 10"
    ).first()
    assert row2["n"] == 10


def test_view_pins_snapshot_and_refresh_advances(spark, tmp_db_path):
    """The measured freshness contract: a view pins the
    registration-time snapshot; refresh_store advances it."""
    p = os.path.join(tmp_db_path, "s2")
    db = _mk_store(spark, p)
    register_store(spark, "cat_s2", p)
    t = db.begin()
    t.add_row([5, 999])   # upsert
    t.add_row([100, 1])   # new key
    t.commit()
    pinned = spark.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM cat_s2").first()
    assert (pinned["n"], pinned["s"]) == (20, 190)  # still the old snapshot
    refresh_store(spark, "cat_s2", p)
    fresh = spark.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM cat_s2").first()
    assert fresh["n"] == 21
    assert fresh["s"] == 190 - 5 + 999 + 1


def test_register_store_as_of_time_travel(spark, tmp_db_path):
    p = os.path.join(tmp_db_path, "s3")
    db = _mk_store(spark, p)
    t = db.begin()
    t.add_row([0, 12345])
    t.commit()
    register_store(spark, "cat_s3_old", p, as_of=1)
    register_store(spark, "cat_s3_new", p)
    old = spark.sql("SELECT v FROM cat_s3_old WHERE k = 0").first()["v"]
    new = spark.sql("SELECT v FROM cat_s3_new WHERE k = 0").first()["v"]
    assert (old, new) == (0, 12345)


def test_register_warehouse_discovers_stores(spark, tmp_db_path):
    _mk_store(spark, os.path.join(tmp_db_path, "alpha"), n=5)
    _mk_store(spark, os.path.join(tmp_db_path, "beta"), n=7)
    # non-store noise: a plain dir and a file
    os.makedirs(os.path.join(tmp_db_path, "not_a_store"))
    with open(os.path.join(tmp_db_path, "README"), "w") as f:
        f.write("x")
    names = register_warehouse(spark, tmp_db_path, prefix="wh_")
    assert set(names) == {"wh_alpha", "wh_beta"}
    assert spark.sql("SELECT COUNT(*) AS n FROM wh_alpha").first()["n"] == 5
    assert spark.sql("SELECT COUNT(*) AS n FROM wh_beta").first()["n"] == 7
    # cross-store SQL join through the catalog names
    j = spark.sql(
        "SELECT COUNT(*) AS n FROM wh_alpha a JOIN wh_beta b ON a.k = b.k"
    ).first()
    assert j["n"] == 5
