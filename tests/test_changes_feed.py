"""Change feed (CDC) tests: Database.changes(since, until).

The feed is the net-write log of a txn window — for every key written
in (since, until], its newest version in the window, tagged 'upsert'
or 'delete'. Reads only the window's segments (manifest-pruned), so
the cost tracks the change volume, not the table size.
"""

import os

from matdb_spark import Database, Dimension, Schema, Value


def _schema():
    return Schema(
        dimensions=[Dimension("k", 10)],
        values=[Value("v")],
    )


def _mk(spark, tmp_db_path, name):
    return Database.create(spark, os.path.join(tmp_db_path, name), _schema())


def _commit(db, rows):
    t = db.begin()
    for r in rows:
        t.add_row(r)
    t.commit()
    return t.txn_id


def test_changes_window_and_net_effect(spark, tmp_db_path):
    db = _mk(spark, tmp_db_path, "cdc")
    t1 = _commit(db, [[1, 10], [2, 20], [3, 30]])
    t2 = _commit(db, [[2, 21], [4, 40]])
    t3 = _commit(db, [[2, 22], [5, 50]])

    # full window: net effect — key 2 appears ONCE with its t3 value
    rows = {r["k"]: r for r in db.changes(since=0).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[2]["v"] == 22 and rows[2]["__txn"] == t3
    assert all(r["change_type"] == "upsert" for r in rows.values())

    # partial window (t1, t3]: keys written by t2/t3 only
    rows = {r["k"]: r for r in db.changes(since=t1).collect()}
    assert set(rows) == {2, 4, 5}
    assert rows[2]["v"] == 22

    # bounded window (t1, t2]: t3's writes invisible
    rows = {r["k"]: r for r in db.changes(since=t1, until=t2).collect()}
    assert set(rows) == {2, 4}
    assert rows[2]["v"] == 21 and rows[2]["__txn"] == t2

    # empty window
    assert db.changes(since=t3).count() == 0


def test_changes_reports_deletes(spark, tmp_db_path):
    db = _mk(spark, tmp_db_path, "cdc_del")
    t1 = _commit(db, [[1, 10], [2, 20]])
    t2 = db.begin()
    t2.delete_row([1])
    t2.add_row([3, 30])
    t2.commit()

    rows = {r["k"]: r for r in db.changes(since=t1).collect()}
    assert rows[1]["change_type"] == "delete" and rows[1]["v"] is None
    assert rows[3]["change_type"] == "upsert" and rows[3]["v"] == 30
    # the snapshot itself no longer has key 1
    assert {r["k"] for r in db.snapshot().collect()} == {2, 3}


def test_changes_excludes_compactions_by_default(spark, tmp_db_path):
    db = _mk(spark, tmp_db_path, "cdc_compact")
    _commit(db, [[1, 10]])
    t2 = _commit(db, [[2, 20]])
    c = db.compact()
    assert c is not None

    # the compaction rewrote keys 1..2 but changed nothing logically
    assert db.changes(since=t2).count() == 0
    # opting in sees the physical rewrite
    phys = {r["k"] for r in db.changes(since=t2, include_compactions=True).collect()}
    assert phys == {1, 2}


def test_follow_changes_tails_new_commits(spark, tmp_db_path):
    db = _mk(spark, tmp_db_path, "cdc_follow")
    t1 = _commit(db, [[1, 10]])

    # since=0: the first pull delivers the existing commit
    gen = db.follow_changes(since=0, poll_interval=0.01, max_empty_polls=2)
    cur, batch = next(gen)
    assert cur == t1 and {r["k"] for r in batch.collect()} == {1}

    # a commit made between pulls arrives in the next batch
    t2 = _commit(db, [[2, 20], [1, 11]])
    cur, batch = next(gen)
    rows = {r["k"]: r["v"] for r in batch.collect()}
    assert cur == t2 and rows == {1: 11, 2: 20}

    # no more commits: the generator drains after max_empty_polls
    import pytest

    with pytest.raises(StopIteration):
        next(gen)

    # since=None starts at the head — only future commits delivered
    gen2 = db.follow_changes(poll_interval=0.01, max_empty_polls=1)
    t3 = _commit(db, [[3, 30]])
    cur, batch = next(gen2)
    assert cur == t3 and {r["k"] for r in batch.collect()} == {3}


def test_changes_with_preimage_classifies_and_carries_old_values(spark, tmp_db_path):
    db = _mk(spark, tmp_db_path, "cdc_pre")
    t1 = _commit(db, [[1, 10], [2, 20]])
    t2 = db.begin()
    t2.add_row([2, 21])     # update
    t2.add_row([3, 30])     # insert
    t2.delete_row([1])      # delete of an existing key
    t2.delete_row([9])      # delete of a key never present
    t2.commit()

    rows = {r["k"]: r for r in db.changes(since=t1, with_preimage=True).collect()}
    assert rows[2]["change_type"] == "update" and (rows[2]["v"], rows[2]["old_v"]) == (21, 20)
    assert rows[3]["change_type"] == "insert" and rows[3]["old_v"] is None
    assert rows[1]["change_type"] == "delete" and rows[1]["old_v"] == 10
    assert rows[9]["change_type"] == "delete" and rows[9]["old_v"] is None

    # since=0: no pre-window snapshot → everything is insert/delete
    rows = {r["k"]: r["change_type"] for r in db.changes(since=0, with_preimage=True).collect()}
    assert rows == {1: "delete", 2: "insert", 3: "insert", 9: "delete"}


def test_preimage_feed_patches_a_running_aggregate(spark, tmp_db_path):
    """The consumer pre-image exists for: patch SUM(v) incrementally
    from (old, new) pairs, never re-reading the base table."""
    from pyspark.sql import functions as F

    db = _mk(spark, tmp_db_path, "cdc_agg")
    t1 = _commit(db, [[k, k * 10] for k in range(1, 6)])
    base_sum = db.snapshot().agg(F.sum("v")).collect()[0][0]
    t2 = db.begin()
    t2.add_row([1, 1000])  # update: +990
    t2.add_row([6, 60])    # insert: +60
    t2.delete_row([5])     # delete: -50
    t2.commit()

    delta = (
        db.changes(since=t1, with_preimage=True)
        .agg(
            F.sum(
                F.coalesce(F.col("v"), F.lit(0)) - F.coalesce(F.col("old_v"), F.lit(0))
            )
        )
        .collect()[0][0]
    )
    assert base_sum + delta == db.snapshot().agg(F.sum("v")).collect()[0][0]


def test_changes_validates_window(spark, tmp_db_path):
    db = _mk(spark, tmp_db_path, "cdc_bad")
    _commit(db, [[1, 10]])
    import pytest

    with pytest.raises(ValueError):
        db.changes(since=5, until=2)


def test_changes_cell_resolution(spark, tmp_db_path):
    """resolution='cell' resolves the window per value cell: two
    partial-column upserts in one window merge instead of the newer
    row nulling the other column; pre-images come cell-merged too."""
    import pytest

    schema = Schema(
        dimensions=[Dimension("k", 10)], values=[Value("a"), Value("b")]
    )
    db = Database.create(spark, os.path.join(tmp_db_path, "cellcdc"), schema)
    t1 = db.begin()
    t1.add_row([1, 1, 2])
    t1.commit()
    t2 = db.begin()
    t2.add_dataframe(
        db.spark.createDataFrame([(1, 10)], "k long, a long"), partial=True
    )
    t2.commit()
    t3 = db.begin()
    t3.add_dataframe(
        db.spark.createDataFrame([(1, 20)], "k long, b long"), partial=True
    )
    t3.commit()

    # row merge: the newer partial row wins wholesale — a is nulled
    row = db.changes(since=1).collect()[0]
    assert row["a"] is None and row["b"] == 20

    # cell merge: each column's newest non-null write in the window
    cell = db.changes(since=1, resolution="cell").collect()[0]
    assert cell["a"] == 10 and cell["b"] == 20
    assert cell["change_type"] == "upsert"

    pre = db.changes(since=1, resolution="cell", with_preimage=True).collect()[0]
    assert pre["a"] == 10 and pre["b"] == 20
    assert pre["old_a"] == 1 and pre["old_b"] == 2
    assert pre["change_type"] == "update"

    with pytest.raises(ValueError, match="resolution"):
        db.changes(since=1, resolution="nope")


def test_changes_raises_through_chained_vacuum(spark, tmp_db_path):
    """A vacuumed INTERMEDIATE rollup must not hide that window
    commits are gone: the covers_lo chain walk reports them."""
    import pytest

    db = _mk(spark, tmp_db_path, "chaincdc")
    for i in range(4):
        _commit(db, [[i, i]])
    assert db.compact(max_txns=2) is not None  # txn5 replaces [1,2]
    _commit(db, [[9, 9]])  # txn6
    assert db.compact() is not None  # txn7 replaces [3,4,5,6], covers_lo=1
    db.vacuum()
    with pytest.raises(ValueError, match="vacuum"):
        db.changes(since=0, until=2)
    with pytest.raises(ValueError, match="vacuum"):
        db.changes(since=3)
    # a window entirely past the lost history stays quiet
    _commit(db, [[1, 111]])  # txn8
    got = {r["k"]: r["v"] for r in db.changes(since=7).collect()}
    assert got == {1: 111}
