"""Cell-level version resolution (the reference's actual write model).

The reference's add_row overwrites individual value cells in place
(src/block.rs:45-49): a write names only the cells it sets, and each
cell keeps its own newest value. query(cell_merge=True) reproduces
that: per value column, the newest NON-NULL write wins; null = "no
write". The default row-level scan stays newest-ROW-wins (which is
what all-null tombstone deletes need).
"""

import os

import pytest

from matdb_spark import Database, Dimension, Schema, Value


def _db(spark, tmp_db_path, name):
    return Database.create(
        spark,
        os.path.join(tmp_db_path, name),
        Schema(
            dimensions=[Dimension("k", 10)],
            values=[Value("a"), Value("b")],
        ),
    )


def test_partial_upsert_cell_merge(spark, tmp_db_path):
    db = _db(spark, tmp_db_path, "cells")
    t1 = db.begin()
    t1.add_row([1, 10, 100])
    t1.add_row([2, 20, 200])
    t1.commit()

    # txn2 updates ONLY column a for key 1 (b omitted entirely)
    t2 = db.begin()
    t2.add_dataframe(spark.createDataFrame([(1, 11)], "k long, a long"), partial=True)
    t2.commit()

    # cell merge: a takes txn2's write, b keeps txn1's
    rows = {r["k"]: (r["a"], r["b"]) for r in db.begin().query(cell_merge=True).collect()}
    assert rows == {1: (11, 100), 2: (20, 200)}

    # row-level default: the partial row IS the newest version (b null)
    rows = {r["k"]: (r["a"], r["b"]) for r in db.begin().query().collect()}
    assert rows == {1: (11, None), 2: (20, 200)}


def test_cell_merge_across_columns_and_txns(spark, tmp_db_path):
    db = _db(spark, tmp_db_path, "interleave")
    t1 = db.begin()
    t1.add_row([1, 10, 100])
    t1.commit()
    t2 = db.begin()  # only b
    t2.add_dataframe(spark.createDataFrame([(1, 999)], "k long, b long"), partial=True)
    t2.commit()
    t3 = db.begin()  # only a
    t3.add_dataframe(spark.createDataFrame([(1, 12)], "k long, a long"), partial=True)
    t3.commit()

    r = db.begin().query(cell_merge=True).collect()[0]
    assert (r["a"], r["b"]) == (12, 999)
    # include_txn reports the newest contributing writer
    r = db.begin().query(cell_merge=True, include_txn=True).collect()[0]
    assert r["__txn"] == 3


def test_partial_requires_flag_and_dims(spark, tmp_db_path):
    db = _db(spark, tmp_db_path, "strict")
    t = db.begin()
    with pytest.raises(ValueError, match="partial=True"):
        t.add_dataframe(spark.createDataFrame([(1, 1)], "k long, a long"))
    with pytest.raises(ValueError, match="dimension"):
        t.add_dataframe(spark.createDataFrame([(1,)], "a long"), partial=True)
    t.rollback()


def test_tombstones_need_row_level_mode(spark, tmp_db_path):
    db = _db(spark, tmp_db_path, "tomb")
    t1 = db.begin()
    t1.add_row([1, 10, 100])
    t1.commit()
    t2 = db.begin()
    t2.delete_row([1])
    t2.commit()
    # row-level: deleted
    assert db.begin().query().count() == 0
    # cell merge: nulls are "no write", so the old cells survive —
    # documented consequence of the reference's no-delete cell model
    r = db.begin().query(cell_merge=True).collect()
    assert [(x["k"], x["a"], x["b"]) for x in r] == [(1, 10, 100)]
