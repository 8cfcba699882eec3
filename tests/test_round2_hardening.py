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


def test_compact_safe_under_concurrent_commit(spark, tmp_path):
    """A commit that lands after the compaction's snapshot was pinned
    (via a second handle) must never be shadowed. The version_rank
    anchor makes this safe WITHOUT aborting: the rewrite ranks at the
    folded history's version, so the interloper outranks it."""
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
    assert a.compact() is not None  # proceeds — interloper outranks it
    # b's write survives the compaction and a vacuum
    got = {r["k"]: r["v"] for r in Database.open(spark, path).begin().query().collect()}
    assert got == {0: 999, 1: 1}
    Database.open(spark, path).vacuum()
    got = {r["k"]: r["v"] for r in Database.open(spark, path).begin().query().collect()}
    assert got == {0: 999, 1: 1}


def test_compact_aborts_on_pending_low_reservation(spark, tmp_path):
    """A concurrent writer still holding a reservation at-or-below the
    fold's rank is the one genuine conflict: its eventual commit would
    be shadowed by the rewrite. The compaction must abort."""
    from matdb_spark import manifest as m

    path = str(tmp_path / "db")
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    a = Database.create(spark, path, schema)
    t1 = a.begin()
    t1.add_row((0, 0))
    t1.commit()
    # a concurrent writer reserves the next id and flushes, but has not
    # published yet — then two more txns commit above it
    b = Database.open(spark, path)
    tb = b.begin()
    tb.add_row((0, 555))
    tb.flush()
    for i in (1, 2):
        t = a.begin()
        t.add_row((i, i))
        t.commit()
    assert a.compact() is None  # pending id <= rank → abort
    tb.commit()  # writer publishes; its value must win (newest txn... no:
    # tb reserved id 2 BEFORE txns 3 and 4 committed, so 3/4 outrank it
    got = {r["k"]: r["v"] for r in Database.open(spark, path).begin().query().collect()}
    assert got[0] == 555  # k=0 only written by txn1 (v=0) and tb (v=555)
    # with nothing pending any more, compaction proceeds
    a2 = Database.open(spark, path)
    assert a2.compact() is not None
    got2 = {r["k"]: r["v"] for r in Database.open(spark, path).begin().query().collect()}
    assert got2 == got


def test_query_range_rejects_value_column_bounds(spark, tmp_path):
    """A pre-dedup filter on a value column would silently change
    version resolution; bounds must name dimensions only."""
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, str(tmp_path / "db"), schema)
    t = db.begin()
    t.add_row((1, 5))
    t.commit()
    with pytest.raises(ValueError, match="non-dimension"):
        db.begin().query_range({"v": (0, 10)})
    with pytest.raises(ValueError, match="non-dimension"):
        db.begin().query_range({"k": (0, 10), "nope": (0, 1)})


def test_time_travel_raises_after_vacuum_not_partial(spark, tmp_path):
    """A historical snapshot whose constituent txns were compacted away
    and vacuumed must RAISE, not silently return the partial survivors;
    a horizon at-or-after the compaction keeps working (the rollup
    carries the content)."""
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, str(tmp_path / "db"), schema)
    for i in range(3):
        t = db.begin()
        t.add_row((i, i))
        t.commit()
    cid = db.compact()  # txn 4 replaces 1..3
    assert cid is not None
    # pre-vacuum: history still readable
    assert db.begin(as_of=2).query(ordered=False).count() == 2
    db.vacuum()
    with pytest.raises(ValueError, match="vacuum"):
        db.begin(as_of=2)
    # at/after the compaction the rollup itself covers the content
    assert db.begin(as_of=cid).query(ordered=False).count() == 3
    assert db.snapshot().count() == 3


def test_time_travel_raises_through_chained_compactions(spark, tmp_path):
    """A vacuumed INTERMEDIATE rollup must not hide history loss: the
    final rollup's covers_lo lets the readability check see through
    the chain. Also guards the change feed's pre-image snapshot."""
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, str(tmp_path / "db"), schema)
    for i in range(3):
        t = db.begin()
        t.add_row((i, i))
        t.commit()
    assert db.compact(max_txns=2) is not None  # txn4 replaces [1,2]
    t = db.begin()
    t.add_row((9, 9))
    t.commit()  # txn5
    assert db.compact() is not None  # txn6 replaces [3,4,5], covers_lo=1
    db.vacuum()  # removes 1..5 including the intermediate rollup 4
    with pytest.raises(ValueError, match="vacuum"):
        db.begin(as_of=1)
    with pytest.raises(ValueError, match="vacuum"):
        db.begin(as_of=3)
    assert db.begin(as_of=6).query(ordered=False).count() == 4

    # pre-image feed: window readable but the since-snapshot is gone
    t = db.begin()
    t.add_row((0, 100))
    t.commit()  # txn7
    with pytest.raises(ValueError, match="vacuum"):
        db.changes(since=5, with_preimage=True)
    # readable horizon: the single update classifies with its pre-image
    rows = db.changes(since=6, with_preimage=True).collect()
    assert len(rows) == 1
    assert rows[0]["change_type"] == "update" and rows[0]["old_v"] == 0


def test_stream_compact_every_one_rejected(spark, tmp_path):
    """compact_every=1 cannot fold (needs >= 2 txns) and previously
    crashed the stream inside foreachBatch; reject it up front."""
    from matdb_spark.streaming.ingest import stream_into_database

    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, str(tmp_path / "db"), schema)
    src = spark.readStream.format("rate").load().selectExpr(
        "value as k", "value as v"
    )
    with pytest.raises(ValueError, match="compact_every"):
        stream_into_database(src, db, str(tmp_path / "ckpt"), compact_every=1)
    with pytest.raises(ValueError, match="major_every"):
        stream_into_database(
            src, db, str(tmp_path / "ckpt2"), compact_every=2, major_every=1
        )


def test_newest_window_fold_preserves_tombstones_and_versions(spark, tmp_path):
    """compact(fold='newest') folds only the newest contiguous window —
    the streaming maintenance mode whose cost must track the window,
    not the table. The window rollup must KEEP tombstones (dropping
    one would resurrect versions below the interval) and must not
    touch the older txns at all."""
    from matdb_spark import manifest as m

    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, str(tmp_path / "db"), schema)
    t1 = db.begin()
    t1.add_rows([(i, 1) for i in range(10)])
    t1.commit()
    t2 = db.begin()
    t2.add_row((0, 2))
    t2.delete_row((5,))
    t2.commit()
    t3 = db.begin()
    t3.add_row((1, 3))
    t3.delete_row((6,))
    t3.commit()
    before = {r["k"]: r["v"] for r in db.snapshot().collect()}
    assert before == {0: 2, 1: 3, 2: 1, 3: 1, 4: 1, 7: 1, 8: 1, 9: 1}

    cid = db.compact(max_txns=2, fold="newest")  # folds txn2+txn3 only
    assert cid is not None
    mf = m.read_manifest(db.path, cid)
    assert mf["replaces"] == [2, 3] and mf["version_rank"] == 3
    # txn1 untouched; the rollup's tombstones keep k=5 and k=6 deleted
    assert {r["k"]: r["v"] for r in db.snapshot().collect()} == before
    db.vacuum()
    assert {r["k"]: r["v"] for r in db.snapshot().collect()} == before
    # the rollup physically carries the two tombstone rows
    rollup = spark.read.parquet(m.txn_data_dir(db.path, cid))
    assert rollup.filter("v is null").count() == 2
    # the rollup is now a contiguous OLDEST pair with txn1: a full fold
    # collapses them and finally drops the tombstones physically
    assert db.compact() is not None
    db.vacuum()
    final = {r["k"]: r["v"] for r in db.snapshot().collect()}
    assert final == before
    last = db.history()[0]
    data = spark.read.parquet(m.txn_data_dir(db.path, last["txn"]))
    assert data.filter("v is null").count() == 0


def test_bulk_load_dedup_stamp_gives_dedup_free_scans(spark, tmp_path):
    """add_dataframe(dedup=...) earns the unique_keys manifest stamp at
    write time, so a single-txn bulk-loaded store reads dedup-free
    without a compaction; any other write history must NOT stamp."""
    from matdb_spark import manifest as m
    from matdb_spark.plans import exchange_count

    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    src = spark.createDataFrame([(i % 5, i) for i in range(20)], "k long, v long")

    db = Database.create(spark, str(tmp_path / "db"), schema)
    t = db.begin()
    t.add_dataframe(src, dedup=True)
    t.commit()
    assert m.read_manifest(db.path, 1).get("unique_keys") is True
    snap = db.snapshot()
    assert exchange_count(snap) == 0
    assert {r["k"] for r in snap.collect()} == set(range(5))
    assert snap.count() == 5

    # two writes in one txn can hold cross-segment duplicates: no stamp
    db2 = Database.create(spark, str(tmp_path / "db2"), schema)
    t2 = db2.begin()
    t2.add_dataframe(src, dedup=True)
    t2.add_dataframe(src, dedup=True)
    t2.commit()
    assert m.read_manifest(db2.path, 1).get("unique_keys") is None
    assert exchange_count(db2.snapshot()) == 1
    assert db2.snapshot().count() == 5

    # "assume" trusts the caller: stamp without the write-side shuffle
    uniq = spark.createDataFrame([(i, i) for i in range(5)], "k long, v long")
    db3 = Database.create(spark, str(tmp_path / "db3"), schema)
    t3 = db3.begin()
    t3.add_dataframe(uniq, dedup="assume")
    t3.commit()
    assert m.read_manifest(db3.path, 1).get("unique_keys") is True
    assert exchange_count(db3.snapshot()) == 0

    # buffered add_row writes in the same txn disable the stamp
    db4 = Database.create(spark, str(tmp_path / "db4"), schema)
    t4 = db4.begin()
    t4.add_row((99, 1))
    t4.add_dataframe(uniq, dedup=True)
    t4.commit()
    assert m.read_manifest(db4.path, 1).get("unique_keys") is None
    assert db4.snapshot().count() == 6

    # truthy-but-not-True values must be rejected, not half-honored
    # (dedup=1 would skip the dropDuplicates yet still stamp), and
    # whole-row dedup cannot combine with partial-column upserts
    t5 = db4.begin()
    with pytest.raises(ValueError, match="dedup"):
        t5.add_dataframe(uniq, dedup=1)
    with pytest.raises(ValueError, match="partial"):
        t5.add_dataframe(uniq.select("k"), dedup=True, partial=True)
    t5.rollback()


def test_minor_compaction_folds_oldest_and_preserves_versions(spark, tmp_path):
    """compact(max_txns=k) folds only the oldest k txns; newer txns
    keep winning version resolution over the rewrite (version_rank),
    tombstones inside the fold stay deleted, and a chained minor
    compaction absorbs the previous one by effective version order."""
    path = str(tmp_path / "db")
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, path, schema)
    # txn1: keys 0..9 = 1; txn2: keys 0..4 = 2 and delete key 9
    t1 = db.begin()
    t1.add_rows([(i, 1) for i in range(10)])
    t1.commit()
    t2 = db.begin()
    t2.add_rows([(i, 2) for i in range(5)])
    t2.delete_row((9,))
    t2.commit()
    # txn3: key 0 = 3; txn4: key 1 = 4
    t3 = db.begin()
    t3.add_row((0, 3))
    t3.commit()
    t4 = db.begin()
    t4.add_row((1, 4))
    t4.commit()
    before = {r["k"]: r["v"] for r in db.snapshot().collect()}
    assert before == {0: 3, 1: 4, 2: 2, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1, 8: 1}

    cid = db.compact(max_txns=2)  # folds txn1+txn2 only
    assert cid is not None
    from matdb_spark import manifest as m

    mf = m.read_manifest(path, cid)
    assert mf["replaces"] == [1, 2] and mf["version_rank"] == 2
    after = {r["k"]: r["v"] for r in db.snapshot().collect()}
    assert after == before  # txn3/txn4 still outrank the rewrite
    db.vacuum()
    assert {r["k"]: r["v"] for r in db.snapshot().collect()} == before

    # chained: fold the minor-compacted txn (effective version 2) with
    # txn3 (version 3) — the next-oldest pair by effective order
    cid2 = db.compact(max_txns=2)
    assert cid2 is not None
    mf2 = m.read_manifest(path, cid2)
    assert mf2["replaces"] == sorted([cid, 3]) and mf2["version_rank"] == 3
    assert {r["k"]: r["v"] for r in db.snapshot().collect()} == before

    # full compaction on top: single txn left → dedup-free scans
    assert db.compact() is not None
    db.vacuum()
    assert {r["k"]: r["v"] for r in db.snapshot().collect()} == before
    from matdb_spark.plans import exchange_count

    assert exchange_count(db.snapshot()) == 0


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
