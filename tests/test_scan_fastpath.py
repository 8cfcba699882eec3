"""Round-7 scan physical-strategy contracts: the packed (txn, seq)
version key must compile version resolution to two-phase HashAggregate
wherever that is SOUND, and must NOT where it is not.

- single value column: always per-column (ties have no cross-column
  atomicity to break) -> HashAggregate;
- multi value, every visible txn stamped unique_keys (tie-free):
  per-column is provably exact -> HashAggregate;
- multi value, any unstamped txn: ties are possible, row atomicity
  wins -> struct payload (SortAggregate), results unchanged.
"""

import re

from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.plans.inspect import physical_plan


def _aggs(df):
    return re.findall(r"\(\d+\) (\w*Aggregate)", physical_plan(df))


def _mk(spark, path, two_vals=True):
    vals = [Value("v"), Value("w")] if two_vals else [Value("v")]
    return Database.create(
        spark, path, Schema(dimensions=[Dimension("k", 100)], values=vals)
    )


def test_single_value_hash_aggregate(spark, tmp_db_path):
    db = _mk(spark, tmp_db_path + "/s1", two_vals=False)
    for base in (0, 100):
        t = db.begin()
        t.add_rows([[i % 7, base + i] for i in range(20)])
        t.commit()
    q = db.begin().query()
    assert set(_aggs(q)) == {"HashAggregate"}
    got = {(r["k"], r["v"]) for r in q.collect()}
    # newest txn wins; within it the highest seq (last add_row) wins
    assert got == {(i, 100 + 14 + i) if i < 6 else (6, 100 + 13) for i in range(7)}


def test_multi_value_tie_free_hash_aggregate(spark, tmp_db_path):
    """Both txns loaded with add_dataframe(dedup=True) -> unique_keys
    stamps -> tie-free -> per-column resolution, hash-aggregated."""
    db = _mk(spark, tmp_db_path + "/s2")
    d1 = spark.createDataFrame(
        [(i, i, 10 * i) for i in range(8)], "k long, v long, w long"
    )
    d2 = spark.createDataFrame(
        [(i, 100 + i, None) for i in range(0, 8, 2)], "k long, v long, w long"
    )
    t1 = db.begin()
    t1.add_dataframe(d1, dedup=True)
    t1.commit()
    t2 = db.begin()
    t2.add_dataframe(d2, dedup=True)
    t2.commit()
    q = db.begin().query()
    assert set(_aggs(q)) == {"HashAggregate"}
    got = {(r["k"], r["v"], r["w"]) for r in q.collect()}
    want = {
        (i, 100 + i, None) if i % 2 == 0 else (i, i, 10 * i) for i in range(8)
    }
    assert got == want  # newest row wins WHOLE-ROW (w nulled by txn2)


def test_multi_value_unstamped_keeps_row_atomicity(spark, tmp_db_path):
    """add_row loads carry no unique_keys stamp -> ties possible ->
    struct payload (SortAggregate), and a genuine intra-call duplicate
    key resolves to ONE coherent row, never a cross-row stitch."""
    db = _mk(spark, tmp_db_path + "/s3")
    t = db.begin()
    t.add_row([1, 10, 100])
    t.add_row([1, 20, 200])  # same key, later seq: whole row wins
    t.commit()
    q = db.begin().query()
    kinds = set(_aggs(q))
    # struct payload: SortAggregate (or ObjectHashAggregate), never the
    # per-column hash path
    assert kinds & {"SortAggregate", "ObjectHashAggregate"}, kinds
    rows = q.collect()
    assert [(r["k"], r["v"], r["w"]) for r in rows] == [(1, 20, 200)]


def test_tie_free_respects_ryow_overlay(spark, tmp_db_path):
    """A transaction with buffered own writes must NOT take the
    per-column path (its overlay is unstamped): results stay coherent
    and include the overlay."""
    db = _mk(spark, tmp_db_path + "/s4")
    t1 = db.begin()
    t1.add_dataframe(
        spark.createDataFrame([(1, 1, 1)], "k long, v long, w long"),
        dedup=True,
    )
    t1.commit()
    t2 = db.begin()
    t2.add_row([1, 5, 50])  # buffered RYOW
    rows = t2.query().collect()
    assert [(r["k"], r["v"], r["w"]) for r in rows] == [(1, 5, 50)]
    t2.rollback()
