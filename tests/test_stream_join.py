"""Stream-stream interval join: batch/stream parity and semantics."""

import datetime as dt
import os
import shutil

from pyspark.sql import functions as F

from matdb_spark.streaming.joins import interval_join
from matdb_spark.streaming.windows import run_to_memory_sink

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_interval_join_batch_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(0)), (1, 101, _t(30)), (2, 102, _t(0))],
        "user_id long, click_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _t(5)), (1, 901, _t(20)), (2, 902, _t(50))],
        "user_id long, purchase_id long, ts timestamp",
    )
    out = interval_join(left, right, keys=["user_id"], upper="10 minutes")
    got = sorted(
        (r.user_id, r.click_id, r.purchase_id_r) for r in out.collect()
    )
    # click@0 matches purchase@5 only (20 is outside 10min? no: 20>10 → out);
    # click@30 matches nothing; user2 click@0 vs purchase@50 → out
    assert got == [(1, 100, 900)]


def test_interval_join_stream_matches_batch(spark):
    src = os.path.join(SCRATCH, "ssj_src")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    rows = [(u, i, _t(i % 50)) for u in range(5) for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    def split(frame):
        clicks = frame.filter(F.col("event_id") % 2 == 0).select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        purch = frame.filter(F.col("event_id") % 2 == 1).select(
            "user_id", F.col("event_id").alias("purchase_id"), "ts"
        )
        return clicks, purch

    bc, bp = split(spark.read.parquet(src))
    batch = interval_join(bc, bp, keys=["user_id"], upper="7 minutes")
    expected = sorted((r.user_id, r.click_id, r.purchase_id_r) for r in batch.collect())

    stream = spark.readStream.schema("user_id long, event_id long, ts timestamp").parquet(src)
    sc, sp = split(stream)
    out = interval_join(sc, sp, keys=["user_id"], upper="7 minutes", watermark="1 hour")
    ckpt = os.path.join(SCRATCH, "ssj_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    run_to_memory_sink(out, "ssj_test", ckpt, "append")
    got = sorted(
        (r.user_id, r.click_id, r.purchase_id_r)
        for r in spark.table("ssj_test").collect()
    )
    assert got == expected and len(got) > 0
