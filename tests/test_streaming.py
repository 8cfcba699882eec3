"""Streaming surface tests: batch/stream parity for window aggs,
micro-batch MVCC ingest, and cross-batch stateful sessionization."""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.sources.tables import load_table
from matdb_spark.streaming import (
    events_stream,
    session_agg,
    sessionize_with_state,
    stream_into_database,
    tumbling_agg,
)
from matdb_spark.streaming.windows import run_to_memory_sink

SF = "/root/testdata/sf0.001"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def _fresh(*parts: str) -> str:
    p = os.path.join(SCRATCH, *parts)
    shutil.rmtree(p, ignore_errors=True)
    return p


def test_tumbling_stream_matches_batch(spark):
    batch = tumbling_agg(
        load_table(spark, SF, "events"), "ts", "5 minutes", keys=["event_type"]
    )
    expected = {tuple(r) for r in batch.collect()}

    stream = tumbling_agg(events_stream(spark, SF), "ts", "5 minutes", keys=["event_type"])
    assert stream.isStreaming
    run_to_memory_sink(stream, "t_tumbling", _fresh("ckpt_tumbling"), "complete")
    got = {tuple(r) for r in spark.table("t_tumbling").collect()}
    assert got == expected and len(got) > 0


def test_stream_ingest_commits_microbatches(spark):
    ev = load_table(spark, SF, "events")
    n_events = ev.count()

    db_path = _fresh("stream_db")
    schema = Schema(
        dimensions=[Dimension("user_id", 100), Dimension("event_id", 100_000)],
        values=[Value("value", type="double")],
    )
    db = Database.create(spark, db_path, schema)

    stream = events_stream(spark, SF).select("user_id", "event_id", "value")
    q = stream_into_database(stream, db, _fresh("ckpt_ingest"))
    q.awaitTermination(120)

    snap = db.begin().query(ordered=False)
    assert snap.count() == n_events


def test_compaction_carries_stream_batch_ids(spark, tmp_path):
    """compact() + vacuum() deletes the folded stream manifests; the
    carried-forward stream_batch_ids map must keep replay suppression
    working (max_committed_batch_id survives), including through a
    chained minor compaction."""
    from matdb_spark import manifest as m

    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, str(tmp_path / "db"), schema)
    for b in range(3):
        t = db.begin()
        t.add_row((b, b))
        t.commit(extra={"stream_source": "srcA", "batch_id": b})
    t = db.begin()
    t.add_row((9, 9))
    t.commit(extra={"stream_source": "srcB", "batch_id": 7})
    assert m.max_committed_batch_id(db.path, "srcA") == 2
    assert db.compact(max_txns=3) is not None  # folds the three srcA txns
    db.vacuum()
    assert m.max_committed_batch_id(db.path, "srcA") == 2
    assert m.max_committed_batch_id(db.path, "srcB") == 7
    assert db.compact() is not None  # absorbs the rollup + the rest
    db.vacuum()
    assert m.max_committed_batch_id(db.path, "srcA") == 2
    assert m.max_committed_batch_id(db.path, "srcB") == 7
    assert m.max_committed_batch_id(db.path, "other") is None
    got = {r["k"]: r["v"] for r in db.snapshot().collect()}
    assert got == {0: 0, 1: 1, 2: 2, 9: 9}


def test_stream_ingest_auto_minor_compaction(spark):
    """compact_every folds ingest txns as batches land; results match
    the plain ingest, visible txn count stays bounded, and the replay
    stamps survive the folds."""
    from matdb_spark import manifest as m

    src = _fresh("auto_compact_src")
    os.makedirs(src)
    ev = load_table(spark, SF, "events").select("user_id", "event_id", "value")
    n_events = ev.count()
    # four files → four micro-batches with maxFilesPerTrigger=1
    ev.withColumn("part", F.col("event_id") % 4).coalesce(1).write.partitionBy(
        "part"
    ).parquet(src, mode="overwrite")

    from matdb_spark.streaming.sources import parquet_stream

    db_path = _fresh("auto_compact_db")
    schema = Schema(
        dimensions=[Dimension("user_id", 100), Dimension("event_id", 100_000)],
        values=[Value("value", type="double")],
    )
    db = Database.create(spark, db_path, schema)
    stream = parquet_stream(
        spark, src, max_files_per_trigger=1
    ).select("user_id", "event_id", "value")
    q = stream_into_database(
        stream,
        db,
        _fresh("ckpt_auto_compact"),
        source_name="autoc",
        compact_every=2,
        vacuum_superseded=True,
    )
    q.awaitTermination(180)

    snap = db.begin().query(ordered=False)
    assert snap.count() == n_events
    stats = db.stats()
    # 4 ingest txns folded every 2 → at most ingest-tail + one rollup
    assert stats["visible_txns"] <= 3
    assert m.max_committed_batch_id(db.path, "autoc") == 3


def test_stateful_sessionize_across_batches(spark):
    # two files processed as separate micro-batches: the session opened
    # in batch 1 must close (and emit) only when batch 2's late event
    # arrives beyond the gap — state carries across batches.
    src = _fresh("sess_src")
    os.makedirs(src)
    t0 = 1_000_000_000_000  # ms
    min_ = 60_000

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))
        for root, _, files in os.walk(os.path.join(src, name)):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    ts = lambda ms: F.timestamp_millis(F.lit(ms))
    import datetime as dt

    mk = lambda ms: dt.datetime.utcfromtimestamp(ms / 1000)
    write_file("b1", [(1, mk(t0)), (1, mk(t0 + 10 * min_))], time.time() - 100)
    write_file("b2", [(1, mk(t0 + 15 * min_)), (1, mk(t0 + 90 * min_))], time.time())

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    out = sessionize_with_state(stream, gap_ms=30 * min_)
    run_to_memory_sink(out, "t_sessions", _fresh("ckpt_sess"), "append")
    rows = spark.table("t_sessions").collect()
    assert [tuple(r) for r in rows] == [(1, t0, t0 + 45 * min_, 3)]


def test_session_agg_batch(spark):
    ev = load_table(spark, SF, "events")
    out = session_agg(ev, "ts", "30 minutes", keys=["user_id"])
    # every event is in exactly one session
    total = out.agg(F.sum("n")).first()[0]
    assert total == ev.count()
    # session windows of one user never overlap
    w = out.filter(F.col("user_id") == out.first()["user_id"]).orderBy("window_start")
    prev_end = None
    for r in w.collect():
        if prev_end is not None:
            assert r["window_start"] >= prev_end
        prev_end = r["window_end"]


def test_stream_static_broadcast_join(spark):
    """Stream-static enrichment join: the static dim is broadcast into
    every micro-batch; results equal the batch join."""
    ev_batch = load_table(spark, SF, "events")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        "event_type string, type_id long",
    )
    expected = {
        (r["event_id"], r["type_id"])
        for r in ev_batch.join(F.broadcast(dim), "event_type").select("event_id", "type_id").collect()
    }
    stream = events_stream(spark, SF).join(F.broadcast(dim), "event_type").select(
        "event_id", "type_id"
    )
    run_to_memory_sink(stream, "t_enrich", _fresh("ckpt_enrich"), "append")
    got = {tuple(r) for r in spark.table("t_enrich").collect()}
    assert got == expected and len(got) > 0


def test_running_totals_with_state(spark, tmp_path_factory):
    """transformWithStateInPandas (Spark 4 arbitrary-state API).
    Requires google.protobuf for the TWS worker protocol — absent in
    the build container, active wherever it exists."""
    pytest.importorskip("google.protobuf")
    from matdb_spark.streaming import running_totals_with_state
    from matdb_spark.streaming.sources import events_stream
    from matdb_spark.streaming.windows import run_to_memory_sink

    ckpt = str(tmp_path_factory.mktemp("ckpt_tws"))
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = running_totals_with_state(
            events_stream(spark, "/root/testdata/sf0.001").select("user_id", "value")
        )
        run_to_memory_sink(out, "tws_totals_test", ckpt, "update")
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
    got = {r["user_id"]: (r["n_events"], r["sum_cents"])
           for r in spark.table("tws_totals_test").collect()}
    import duckdb
    exp = {u: (n, c) for u, n, c in duckdb.connect().execute(
        "SELECT user_id, COUNT(*), CAST(SUM(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) "
        "FROM '/root/testdata/sf0.001/events.parquet' GROUP BY user_id"
    ).fetchall()}
    assert got == exp
