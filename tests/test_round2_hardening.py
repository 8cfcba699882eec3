"""Regression tests for the round-2 whole-file review findings:
pruning arithmetic edges, compaction under concurrent writers,
vacuumed change windows, stale manifest cache, pre-image collisions.
"""

import decimal
import os

import pytest

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.scan import _floor_div


def test_floor_div_decimal_negative():
    # Decimal // truncates toward zero — the helper must floor
    assert _floor_div(decimal.Decimal(-5), 10) == -1
    assert _floor_div(decimal.Decimal(-15), 10) == -2
    assert _floor_div(decimal.Decimal(25), 10) == 2
    assert _floor_div(-5, 10) == -1
    assert _floor_div(25, 10) == 2


def test_chunk_routing_matches_floor_at_long_min(spark):
    """The write-side chunk expression must not overflow at the type
    minimum: floor(LONG_MIN / s), not a wrapped subtraction."""
    from matdb_spark.scan import _chunked

    lo = -(2**63)
    schema = Schema(dimensions=[Dimension("k", 1000)], values=[Value("v")])
    df = spark.createDataFrame([(lo, 1), (lo + 1, 1), (-5, 1), (5, 1)], "k long, v long")
    got = {r["k"]: r["__chunk_k"] for r in _chunked(df, schema).collect()}
    assert got == {k: k // 1000 for k in got}


def test_negative_key_range_scan_roundtrip(spark, tmp_path):
    """Negative keys must survive write-route → chunk-prune → read."""
    db = Database.create(
        spark,
        str(tmp_path / "db"),
        Schema(dimensions=[Dimension("k", 10)], values=[Value("v")]),
    )
    t = db.begin()
    t.add_rows([(-25, 1), (-5, 2), (0, 3), (5, 4), (15, 5)])
    t.commit()
    got = sorted(
        (r["k"], r["v"]) for r in db.begin().query_range({"k": (-25, -1)}).collect()
    )
    assert got == [(-25, 1), (-5, 2)]


def test_compact_aborts_on_concurrent_commit(spark, tmp_path):
    """A commit that lands after the compaction's snapshot was pinned
    (via a second handle) must abort the compaction, not be shadowed."""
    path = str(tmp_path / "db")
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    a = Database.create(spark, path, schema)
    for i in range(2):
        t = a.begin()
        t.add_row((i, i))
        t.commit()
    # second handle commits AFTER a's horizon was last refreshed
    b = Database.open(spark, path)
    tb = b.begin()
    tb.add_row((0, 999))  # newer value for k=0
    tb.commit()
    assert a.compact() is None  # conflict detected → abort
    # b's write survives
    got = {r["k"]: r["v"] for r in Database.open(spark, path).begin().query().collect()}
    assert got[0] == 999
    # once the handle refreshes (reopen), compaction proceeds
    a2 = Database.open(spark, path)
    assert a2.compact() is not None
    got = {r["k"]: r["v"] for r in Database.open(spark, path).begin().query().collect()}
    assert got[0] == 999


def test_changes_raises_on_vacuumed_window(spark, tmp_path):
    db = Database.create(
        spark,
        str(tmp_path / "db"),
        Schema(dimensions=[Dimension("k", 10)], values=[Value("v")]),
    )
    for i in range(3):
        t = db.begin()
        t.add_row((i, i))
        t.commit()
    assert db.compact() is not None
    db.vacuum()
    with pytest.raises(ValueError, match="vacuumed"):
        db.changes(since=1).collect()
    # the compaction-inclusive feed is still readable
    assert db.changes(since=1, include_compactions=True).count() == 3


def test_manifest_cache_cleared_on_recreate(spark, tmp_path):
    """Re-creating a store at the same path must not prune scans with
    the OLD store's cached manifest stats."""
    import shutil

    path = str(tmp_path / "db")
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, path, schema)
    t = db.begin()
    t.add_rows([(i, i) for i in range(10)])
    t.commit()
    # prime the stats cache through a bounded scan
    assert db.begin().query_range({"k": (0, 9)}).count() == 10
    shutil.rmtree(path)
    db2 = Database.create(spark, path, schema)
    t = db2.begin()
    t.add_rows([(1000 + i, i) for i in range(10)])
    t.commit()
    assert db2.begin().query_range({"k": (1000, 1009)}).count() == 10


def test_preimage_column_collision_raises(spark, tmp_path):
    db = Database.create(
        spark,
        str(tmp_path / "db"),
        Schema(
            dimensions=[Dimension("k", 10)],
            values=[Value("x"), Value("old_x")],
        ),
    )
    t = db.begin()
    t.add_row((1, 2, 3))
    t.commit()
    with pytest.raises(ValueError, match="old_"):
        db.changes(since=0, with_preimage=True)
