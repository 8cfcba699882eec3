"""Regression tests for the round-1 ADVICE.md findings.

Each test pins one boundary the advisor flagged:
- manifest ids >= 10^8 stay visible (no orphan-sweep data loss),
- streaming replay after checkpoint loss does not double-commit,
- chunk routing and chunk-range pruning share one arithmetic for
  negative keys (write-side div-vs-floor divergence),
- chunk_size is rejected on non-integral dims,
- asof_join strategy A preserves duplicate left rows (pandas
  merge_asof / DuckDB ASOF JOIN semantics) and agrees with strategy B.
"""

import os
import shutil

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark import manifest
from matdb_spark.operators.asof import asof_join, asof_join_sorted
from matdb_spark.streaming.ingest import stream_into_database

import pytest


def test_manifest_ids_past_eight_digits(tmp_db_path):
    """txn_id=10^8 emits a 9-digit manifest name; it must be listed as
    committed, and recover() must NOT sweep its data as orphaned."""
    db_path = os.path.join(tmp_db_path, "bigid")
    manifest.init_layout(db_path)
    big = 10**8
    os.makedirs(manifest.txn_data_dir(db_path, big))
    manifest.publish(db_path, big, segment_count=1)
    assert manifest.committed_txn_ids(db_path) == [big]
    nxt = manifest.recover(db_path)
    assert os.path.isdir(manifest.txn_data_dir(db_path, big)), (
        "recover() deleted data of a committed 9-digit txn"
    )
    assert nxt == big + 1


def test_streaming_replay_is_skipped(spark, tmp_db_path):
    """Replaying the same batch ids (checkpoint lost after manifests
    landed — the at-least-once window of foreachBatch) must not create
    new transactions."""
    schema = Schema(dimensions=[Dimension("k")], values=[Value("v")])
    db = Database.create(spark, os.path.join(tmp_db_path, "sdb"), schema)
    src_dir = os.path.join(tmp_db_path, "src")
    os.makedirs(src_dir)
    spark.createDataFrame([(i, i * 10) for i in range(100)], "k long, v long") \
        .coalesce(1).write.mode("overwrite").parquet(src_dir)

    ckpt = os.path.join(tmp_db_path, "ckpt")
    stream = spark.readStream.schema("k long, v long").parquet(src_dir)
    q = stream_into_database(stream, db, ckpt, source_name="replay-test")
    q.awaitTermination()
    committed_before = manifest.committed_txn_ids(db.path)
    assert db.snapshot().count() == 100

    # Simulate losing the checkpoint: Spark restarts batch ids at 0 and
    # redelivers everything. The manifest-recorded batch ids must
    # suppress the duplicate commits.
    shutil.rmtree(ckpt)
    stream2 = spark.readStream.schema("k long, v long").parquet(src_dir)
    q2 = stream_into_database(stream2, db, ckpt, source_name="replay-test")
    q2.awaitTermination()
    assert manifest.committed_txn_ids(db.path) == committed_before
    assert db.snapshot().count() == 100


def test_negative_key_chunk_range_scan(spark, tmp_db_path):
    """Keys straddling zero: write-side routing (Spark integral
    arithmetic) and read-side pruning (Python //) must agree, or rows
    near chunk boundaries vanish from range scans."""
    schema = Schema(dimensions=[Dimension("k", chunk_size=10)], values=[Value("v")])
    db = Database.create(spark, os.path.join(tmp_db_path, "neg"), schema)
    keys = list(range(-25, 26))  # chunks -3..2 under floor semantics
    with db.begin() as txn:
        txn.add_dataframe(spark.createDataFrame([(k, k) for k in keys], "k long, v long"))
        txn.commit()
    txn = db.begin()
    got = sorted(r.k for r in txn.query_range({"k": (-25, 25)}).collect())
    assert got == keys
    # a narrow all-negative range crossing a chunk edge
    got2 = sorted(r.k for r in txn.query_range({"k": (-12, -8)}).collect())
    assert got2 == list(range(-12, -7))


def test_chunk_size_requires_integral_dim():
    with pytest.raises(ValueError, match="integral"):
        Schema(
            dimensions=[Dimension("name", chunk_size=5, type="string")],
            values=[Value("v")],
        )
    with pytest.raises(ValueError, match="integral"):
        Schema(
            dimensions=[Dimension("t", chunk_size=5, type="double")],
            values=[Value("v")],
        )


def test_asof_join_preserves_duplicate_left_rows(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [("a", t(5)), ("a", t(5)), ("a", t(9))],  # duplicate left row
        "sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t(4), 1.0), ("a", t(8), 2.0)],
        "sym string, ts timestamp, px double",
    )
    out_a = asof_join(left, right, on="ts", by=["sym"]).collect()
    assert len(out_a) == 3, "strategy A must keep every left row"
    out_b = asof_join_sorted(left, right, on="ts", by=["sym"]).collect()
    assert len(out_b) == 3
    a = sorted([(r.ts, r.px_right) for r in out_a])
    b = sorted([(r.ts, r.px_right) for r in out_b])
    assert a == b == [(t(5), 1.0), (t(5), 1.0), (t(9), 2.0)]
