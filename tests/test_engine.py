"""End-to-end engine semantics, mirroring the reference test suite:

- grid roundtrip (reference tests/matdb.rs:14-75 / FIXTURES.md F1):
  insert a 100x100 grid with periodic flushes, assert 10,000 rows in
  key order inside the txn and from a fresh post-commit txn.
- MVCC / upsert overlap (FIXTURES.md F5): snapshot isolation,
  newest-txn-wins, within-txn last-write-wins, read-your-own-writes,
  rollback invisibility.
"""

import os

import pytest

from matdb_spark import Database, Dimension, Schema, Value


def grid_schema():
    return Schema(
        dimensions=[Dimension("time", 50), Dimension("sensor_id", 10)],
        values=[Value("value")],
    )


GRID_N = 30  # reference uses 100x100; 30x30 keeps local runtime sane


def test_grid_roundtrip(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "grid"), grid_schema())
    txn = db.begin()
    for i in range(GRID_N):
        for j in range(GRID_N):
            txn.add_row([i, j, i * 1000 + j])
        if i % 10 == 9:
            txn.flush()

    # visible inside the writing transaction (read-your-own-writes,
    # both flushed segments and the in-memory tail)
    rows = txn.query().collect()
    assert len(rows) == GRID_N * GRID_N
    # ordered by (time, sensor_id)
    keys = [(r.time, r.sensor_id) for r in rows]
    assert keys == sorted(keys)
    assert rows[0].value == 0
    assert rows[-1].value == (GRID_N - 1) * 1000 + GRID_N - 1

    txn.commit()

    # a fresh transaction sees the committed data
    txn2 = db.begin()
    assert txn2.query(ordered=False).count() == GRID_N * GRID_N

    # reopening the database also sees it
    db2 = Database.open(spark, db.path)
    assert db2.snapshot().count() == GRID_N * GRID_N


def test_mvcc_fixture_f5(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "f5"), grid_schema())

    # 1. txn1 inserts (10,1,100), commits
    t1 = db.begin()
    t1.add_row([10, 1, 100])
    t1.commit()

    # 3-pre: txn3 opened before txn2 commits
    t3 = db.begin()

    # 2. txn2 upserts (10,1,200) and inserts (10,2,300), commits
    t2 = db.begin()
    t2.add_row([10, 1, 200])
    t2.add_row([10, 2, 300])
    t2.commit()

    # 3. txn3 sees only txn1's state (snapshot isolation)
    r3 = {(r.time, r.sensor_id): r.value for r in t3.query().collect()}
    assert r3 == {(10, 1): 100}

    # 4. a txn opened after sees newest-wins results
    t4 = db.begin()
    r4 = {(r.time, r.sensor_id): r.value for r in t4.query().collect()}
    assert r4 == {(10, 1): 200, (10, 2): 300}

    # 5. within-txn duplicate key: last write wins
    t5 = db.begin()
    t5.add_row([10, 3, 1])
    t5.add_row([10, 3, 2])
    r5 = {(r.time, r.sensor_id): r.value for r in t5.query().collect()}
    assert r5[(10, 3)] == 2
    # also across a flush boundary
    t5.flush()
    t5.add_row([10, 3, 5])
    r5b = {(r.time, r.sensor_id): r.value for r in t5.query().collect()}
    assert r5b[(10, 3)] == 5

    # 6. uncommitted rows are invisible to others; rollback discards
    t6 = db.begin()
    assert (10, 3) not in {
        (r.time, r.sensor_id) for r in t6.query().collect()
    }
    t5.rollback()
    t7 = db.begin()
    r7 = {(r.time, r.sensor_id): r.value for r in t7.query().collect()}
    assert r7 == {(10, 1): 200, (10, 2): 300}


def test_txn_id_in_result(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "txnid"), grid_schema())
    t1 = db.begin()
    t1.add_row([1, 1, 10])
    t1.commit()
    t2 = db.begin()
    t2.add_row([1, 2, 20])
    t2.commit()
    rows = db.begin().query(include_txn=True).collect()
    by_key = {(r.time, r.sensor_id): r["__txn"] for r in rows}
    assert by_key[(1, 1)] == 1
    assert by_key[(1, 2)] == 2


def test_bulk_add_dataframe(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "bulk"), grid_schema())
    df = spark.range(1000).selectExpr(
        "id % 100 as time", "id div 100 as sensor_id", "id as value"
    )
    t = db.begin()
    t.add_dataframe(df)
    t.commit()
    out = db.snapshot()
    assert out.count() == 1000
    # later call wins over earlier call for the same key
    t2 = db.begin()
    t2.add_dataframe(spark.createDataFrame([(0, 0, 999999)], "time long, sensor_id long, value long"))
    t2.commit()
    winner = db.snapshot().filter("time = 0 and sensor_id = 0").collect()
    assert [r.value for r in winner] == [999999]


def test_rollback_context_manager(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "cm"), grid_schema())
    with db.begin() as t:
        t.add_row([1, 1, 1])
        t.flush()
        # no commit → rollback on exit
    assert db.snapshot().count() == 0
    # staged dir is gone
    assert not os.path.isdir(os.path.join(db.path, "data", "txn=1"))


def test_recovery_cleans_orphans(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "rec"), grid_schema())
    t = db.begin()
    t.add_row([1, 1, 1])
    t.flush()  # staged but never committed — simulated crash
    db2 = Database.open(spark, db.path)
    assert db2.snapshot().count() == 0
    assert db2.next_txn_id >= 2


def test_chunk_partition_layout(spark, tmp_db_path):
    """Chunk routing (reference schema.rs:28-38) must materialize as
    Hive partition directories → Catalyst partition pruning."""
    db = Database.create(spark, os.path.join(tmp_db_path, "chunks"), grid_schema())
    t = db.begin()
    for i in range(0, 100, 10):
        t.add_row([i, i // 10, i])
    t.commit()
    seg = os.path.join(db.path, "data", "txn=1", "seg=0")
    subdirs = sorted(os.listdir(seg))
    assert any(d.startswith("__chunk_time=") for d in subdirs)
    # pruning: a filter on the chunked dim range should read a subset
    df = db.snapshot().filter("time >= 50")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == 5


def test_compact_and_vacuum(spark, tmp_db_path):
    """Compaction folds many txns into one superseding txn; the
    snapshot is byte-identical before/after; vacuum removes the
    superseded data; future upserts still win over compacted rows."""
    from matdb_spark import manifest

    db = Database.create(spark, os.path.join(tmp_db_path, "compact"), grid_schema())
    t1 = db.begin()
    t1.add_rows([[i, 0, i] for i in range(20)])
    t1.commit()
    t2 = db.begin()
    t2.add_rows([[i, 0, i + 100] for i in range(0, 20, 2)])  # upsert evens
    t2.commit()
    t3 = db.begin()
    t3.add_rows([[i, 1, i] for i in range(5)])
    t3.commit()

    before = sorted(tuple(r) for r in db.snapshot().collect())
    cid = db.compact()
    assert cid == 4
    assert manifest.visible_txn_ids(db.path, db.next_txn_id) == [cid]
    after = sorted(tuple(r) for r in db.snapshot().collect())
    assert after == before

    # compacted store still accepts upserts that win over folded rows
    t5 = db.begin()
    t5.add_row([0, 0, 777])
    t5.commit()
    assert db.snapshot().filter("time = 0 and sensor_id = 0").first()["value"] == 777

    # vacuum removes superseded txn data + manifests; reopen still sane
    removed = db.vacuum()
    assert removed == [1, 2, 3]
    for t in removed:
        assert not os.path.isdir(os.path.join(db.path, "data", f"txn={t}"))
    db2 = Database.open(spark, db.path)
    again = sorted(tuple(r) for r in db2.snapshot().collect())
    assert [r for r in again if r[:2] != (0, 0)] == [r for r in after if r[:2] != (0, 0)]

    # two visible txns remain (compaction + the later upsert): a second
    # compaction folds them and chains the replaces resolution
    cid2 = db2.compact()
    assert cid2 == 6
    assert manifest.visible_txn_ids(db2.path, db2.next_txn_id) == [cid2]
    assert db2.snapshot().filter("time = 0 and sensor_id = 0").first()["value"] == 777


def test_time_travel_snapshots(spark, tmp_db_path):
    """begin(as_of=t) sees exactly commits <= t; time-travel txns are
    read-only; as_of in the future is rejected."""
    import pytest as _pytest

    db = Database.create(spark, os.path.join(tmp_db_path, "tt"), grid_schema())
    t1 = db.begin(); t1.add_row([0, 0, 1]); t1.commit()
    t2 = db.begin(); t2.add_row([0, 0, 2]); t2.commit()
    t3 = db.begin(); t3.add_row([1, 0, 3]); t3.commit()

    assert db.snapshot(as_of=1).collect() == [(0, 0, 1)] or \
        [tuple(r) for r in db.snapshot(as_of=1).collect()] == [(0, 0, 1)]
    assert {tuple(r) for r in db.snapshot(as_of=2).collect()} == {(0, 0, 2)}
    assert {tuple(r) for r in db.snapshot(as_of=3).collect()} == {(0, 0, 2), (1, 0, 3)}
    assert {tuple(r) for r in db.snapshot().collect()} == {(0, 0, 2), (1, 0, 3)}

    ro = db.begin(as_of=2)
    with _pytest.raises(RuntimeError, match="read-only"):
        ro.add_row([9, 9, 9])
    with _pytest.raises(ValueError, match="future"):
        db.begin(as_of=99)


def test_delete_via_null_upsert(spark, tmp_db_path):
    """The reference has NO delete (SURVEY §1.5); this engine gets one
    for free from the data model: unset cells never appear as rows
    (block.rs:277-279 → drop-all-null-values filter), so upserting a
    key with all-null values tombstones it — newest version wins, and
    the winning version is invisible."""
    db = Database.create(spark, os.path.join(tmp_db_path, "del"), grid_schema())
    t1 = db.begin()
    t1.add_rows([[1, 1, 10], [2, 2, 20], [3, 3, 30]])
    t1.commit()

    t2 = db.begin()
    t2.add_row([2, 2, None])  # tombstone
    t2.commit()

    keys = {(r.time, r.sensor_id) for r in db.snapshot().collect()}
    assert keys == {(1, 1), (3, 3)}

    # re-inserting the key resurrects it (newest version wins again)
    t3 = db.begin()
    t3.add_row([2, 2, 99])
    t3.commit()
    assert db.snapshot().filter("time = 2 and sensor_id = 2").first()["value"] == 99

    # tombstones survive compaction? by design they are dropped during
    # compaction (the snapshot omits them) — the fold is still correct
    # because everything it replaces is folded with them applied
    db.compact()
    keys = {(r.time, r.sensor_id) for r in db.snapshot().collect()}
    assert keys == {(1, 1), (2, 2), (3, 3)}


def test_delete_api_and_stats(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "delapi"), grid_schema())
    t1 = db.begin()
    t1.add_rows([[1, 1, 10], [2, 2, 20]])
    t1.commit()
    t2 = db.begin()
    t2.delete_row([1, 1])
    t2.commit()
    assert {(r.time, r.sensor_id) for r in db.snapshot().collect()} == {(2, 2)}

    s = db.stats()
    assert s["committed_txns"] == 2 and s["visible_txns"] == 2
    assert s["data_files"] > 0 and s["data_bytes"] > 0
    db.compact()
    db.vacuum()
    s2 = db.stats()
    assert s2["visible_txns"] == 1 and s2["replaced_txns"] == 0


def test_db_sql_surface(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "sqlv"), grid_schema())
    t = db.begin()
    t.add_rows([[i, i % 3, i * 10] for i in range(30)])
    t.commit()
    out = db.sql("SELECT sensor_id, COUNT(*) AS n, SUM(value) AS s FROM matdb GROUP BY sensor_id")
    rows = {r["sensor_id"]: (r["n"], r["s"]) for r in out.collect()}
    assert rows[0][0] == 10 and len(rows) == 3


def test_multi_value_columns(spark, tmp_db_path):
    """The reference declares N value columns but physically collapses
    them onto one grid slot (block.rs:45-49); we support them properly
    (SURVEY §7.4.6). Versioning is row-level: an upsert replaces ALL
    value cells of the key; a row is visible while ANY value is
    non-null; tombstoning needs all-null."""
    schema = Schema(
        dimensions=[Dimension("k", 10)],
        values=[Value("a"), Value("b", type="double")],
    )
    db = Database.create(spark, os.path.join(tmp_db_path, "mv"), schema)
    t1 = db.begin()
    t1.add_row([1, 10, 1.5])
    t1.add_row([2, 20, 2.5])
    t1.commit()

    t2 = db.begin()
    t2.add_row([1, 11, None])  # row-level replace: b becomes NULL
    t2.commit()

    rows = {r["k"]: (r["a"], r["b"]) for r in db.snapshot().collect()}
    assert rows == {1: (11, None), 2: (20, 2.5)}

    # all-null tombstone removes; partial null does not
    t3 = db.begin()
    t3.delete_row([2])
    t3.commit()
    assert {r["k"] for r in db.snapshot().collect()} == {1}


def test_merge_dataframe_modes(spark, tmp_db_path):
    """MERGE composed from engine primitives: update/ignore/delete on
    match, insert/ignore on no-match."""
    def fresh(name):
        db = Database.create(spark, os.path.join(tmp_db_path, name), grid_schema())
        t = db.begin()
        t.add_rows([[1, 1, 10], [2, 2, 20]])
        t.commit()
        return db

    src = spark.createDataFrame(
        [(2, 2, 999), (3, 3, 30)], "time long, sensor_id long, value long"
    )

    def state(db):
        return {(r.time, r.sensor_id): r.value for r in db.snapshot().collect()}

    # update + insert == plain upsert
    db = fresh("m_ui")
    t = db.begin(); t.merge_dataframe(src); t.commit()
    assert state(db) == {(1, 1): 10, (2, 2): 999, (3, 3): 30}

    # ignore matched, insert unmatched (insert-if-absent)
    db = fresh("m_ii")
    t = db.begin(); t.merge_dataframe(src, when_matched="ignore"); t.commit()
    assert state(db) == {(1, 1): 10, (2, 2): 20, (3, 3): 30}

    # delete matched, ignore unmatched (targeted delete)
    db = fresh("m_di")
    t = db.begin()
    t.merge_dataframe(src, when_matched="delete", when_not_matched="ignore")
    t.commit()
    assert state(db) == {(1, 1): 10}

    # update matched only (no inserts)
    db = fresh("m_uo")
    t = db.begin()
    t.merge_dataframe(src, when_not_matched="ignore")
    t.commit()
    assert state(db) == {(1, 1): 10, (2, 2): 999}


def test_recovery_removes_stale_manifest_tmp(spark, tmp_db_path):
    """A crash between manifest tmp-write and rename leaves a .tmp in
    _commits/: reopening must remove it and not treat it as a commit."""
    db = Database.create(spark, os.path.join(tmp_db_path, "mtmp"), grid_schema())
    t = db.begin()
    t.add_row([1, 1, 1])
    t.commit()
    stray = os.path.join(db.path, "_commits", "00000099.json.tmp")
    with open(stray, "w") as f:
        f.write("{}")
    # age the debris past the recovery grace window (fresh files are
    # presumed to belong to a live concurrent writer and survive)
    os.utime(stray, (0, 0))
    db2 = Database.open(spark, db.path)
    assert not os.path.exists(stray)
    assert db2.snapshot().count() == 1


def test_history_and_export(spark, tmp_db_path):
    import duckdb

    db = Database.create(spark, os.path.join(tmp_db_path, "hist"), grid_schema())
    with db.begin() as t1:
        t1.add_row([1, 1, 10])
        t1.commit()
    with db.begin() as t2:
        t2.add_row([1, 1, 20])
        t2.add_row([2, 2, 30])
        t2.commit()
    h = db.history()
    assert [e["txn"] for e in h] == [2, 1]
    assert h[0]["rows"] == 2 and h[1]["rows"] == 1
    assert all(e["segments"] == 1 for e in h)

    out = os.path.join(tmp_db_path, "export")
    db.export_snapshot(out)
    # a foreign engine reads the export without matdb knowledge
    got = duckdb.sql(
        f"SELECT time, sensor_id, value FROM read_parquet('{out}/*.parquet') ORDER BY 1,2"
    ).fetchall()
    assert got == [(1, 1, 20), (2, 2, 30)]
    # historical export sees the pre-upsert state
    out1 = os.path.join(tmp_db_path, "export_v1")
    db.export_snapshot(out1, as_of=1)
    got1 = duckdb.sql(
        f"SELECT time, sensor_id, value FROM read_parquet('{out1}/*.parquet')"
    ).fetchall()
    assert got1 == [(1, 1, 10)]


def test_vacuum_retention_window(spark, tmp_db_path):
    db = Database.create(spark, os.path.join(tmp_db_path, "ret"), grid_schema())
    for i in range(2):
        with db.begin() as t:
            t.add_row([i, 0, i])
            t.commit()
    assert db.compact() is not None
    # a huge retention window keeps the superseded txns alive
    assert db.vacuum(min_age_seconds=3600) == []
    assert db.stats()["replaced_txns"] == 2
    # immediate vacuum removes them
    assert db.vacuum() == [1, 2]
    assert db.snapshot().count() == 2


def test_add_value_column_evolution(spark, tmp_db_path):
    db = Database.create(
        spark,
        os.path.join(tmp_db_path, "evo"),
        Schema(dimensions=[Dimension("k", 100)], values=[Value("v")]),
    )
    with db.begin() as t1:
        t1.add_dataframe(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
        t1.commit()

    db.add_value_column("w", "double")
    with pytest.raises(ValueError):
        db.add_value_column("v")

    # history (pre-evolution segments) reads the new column as null
    rows = {r.k: (r.v, r.w) for r in db.snapshot().collect()}
    assert rows == {1: (10, None), 2: (20, None)}

    # new writes carry it; upsert replaces the whole row (newest wins)
    with db.begin() as t2:
        t2.add_dataframe(
            spark.createDataFrame([(2, 22, 2.5), (3, 30, 3.5)], "k long, v long, w double")
        )
        t2.commit()
    rows = {r.k: (r.v, r.w) for r in db.snapshot().collect()}
    assert rows == {1: (10, None), 2: (22, 2.5), 3: (30, 3.5)}

    # reopen sees the evolved schema; compaction rewrites history to it
    db2 = Database.open(spark, db.path)
    assert [v.name for v in db2.schema.values] == ["v", "w"]
    assert db2.schema.epoch == 1
    db2.compact()
    db2.vacuum()
    rows = {r.k: (r.v, r.w) for r in db2.snapshot().collect()}
    assert rows == {1: (10, None), 2: (22, 2.5), 3: (30, 3.5)}
    # point + range paths work on the evolved store
    assert db2.begin().query_range({"k": (2, 3)}).count() == 2
    assert db2.begin().query_points([(3,)]).collect()[0].w == 3.5


def test_as_of_sees_foreign_commits(spark, tmp_db_path):
    """Time travel must validate as_of against the ON-DISK horizon, not
    the handle-local txn counter: a handle that never committed has a
    stale counter, yet commits made through other handles are real and
    readable (the current-snapshot path already honors them)."""
    import os

    path = os.path.join(tmp_db_path, "foreign_asof")
    a = Database.create(spark, path, Schema(
        dimensions=[Dimension("k", 10)], values=[Value("v")]
    ))
    b = Database.open(spark, path)
    with b.begin() as t:
        t.add_rows([[1, 10]])
        t.commit()
    with b.begin() as t:
        t.add_rows([[2, 20]])
        t.commit()
    # handle a's counter is stale (it never allocated a txn id), but
    # txn 1 is committed on disk and must be time-travelable
    with a.begin(as_of=1) as t:
        assert {r.k: r.v for r in t.query().collect()} == {1: 10}
    # the future is still rejected, against the on-disk horizon
    import pytest

    with pytest.raises(ValueError, match="future"):
        a.begin(as_of=99)


def test_sql_time_travel(spark, tmp_db_path):
    import os

    path = os.path.join(tmp_db_path, "sql_asof")
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("k", 10)], values=[Value("v")]
    ))
    with db.begin() as t:
        t.add_rows([[1, 10], [2, 20]])
        t.commit()
    with db.begin() as t:
        t.add_rows([[2, 99]])
        t.commit()
    now = {r.k: r.v for r in db.sql("SELECT k, v FROM matdb").collect()}
    then = {r.k: r.v for r in db.sql("SELECT k, v FROM matdb", as_of=1).collect()}
    assert now == {1: 10, 2: 99}
    assert then == {1: 10, 2: 20}
