"""Streaming tour of matdb_spark: continuous ingest with exactly-once
commits, event-time windows, and a stream-stream interval join.

The reference's only 'streaming' notion is periodic flush during a
long batch ingest (reference: examples/sensor-log.rs:290-295); this
demo shows the Structured-Streaming extension surface built on top of
the same MVCC store.

Run:  PYTHONPATH=/root/repo python examples/streaming_demo.py
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value, get_spark
from matdb_spark.streaming import interval_join, stream_into_database, tumbling_agg
from matdb_spark.streaming.sources import parquet_stream
from matdb_spark.streaming.windows import run_to_memory_sink

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="matdb_spark_streaming_demo", cpus=8)
    base = "/tmp/matdb_spark_streaming_demo"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    events = f"{SF_DIR}/events.parquet"

    # 1. continuous ingest: every micro-batch commits as ONE MVCC txn;
    #    replays after checkpoint loss are suppressed by the batch-id
    #    stamp in each manifest (exactly-once)
    db = Database.create(spark, f"{base}/db", Schema(
        dimensions=[Dimension("user_id", 50), Dimension("event_id", 10_000)],
        values=[Value("value", type="double")],
    ))
    stream = parquet_stream(spark, events, ts_cols=["ts"]).select(
        "user_id", "event_id", "value"
    )
    q = stream_into_database(stream, db, f"{base}/ckpt_ingest", source_name="demo")
    q.awaitTermination()
    print("ingested rows:", db.snapshot().count())
    print("history:", db.history())

    # 2. event-time tumbling windows with a watermark
    agg = tumbling_agg(
        parquet_stream(spark, events, ts_cols=["ts"]),
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    run_to_memory_sink(agg, "demo_windows", f"{base}/ckpt_win", "complete")
    spark.table("demo_windows").orderBy("window_start", "event_type").show(5)

    # 3. stream-stream interval join: purchases within 6 h of a click
    clicks = parquet_stream(spark, events, ts_cols=["ts"]).filter(
        F.col("event_type") == "click"
    ).select("user_id", F.col("event_id").alias("click_id"), "ts")
    purchases = parquet_stream(spark, events, ts_cols=["ts"]).filter(
        F.col("event_type") == "purchase"
    ).select("user_id", F.col("event_id").alias("purchase_id"), "ts")
    joined = interval_join(
        clicks, purchases, keys=["user_id"], upper="6 hours", watermark="12 hours"
    )
    run_to_memory_sink(joined, "demo_join", f"{base}/ckpt_join", "append")
    print("click→purchase pairs:", spark.table("demo_join").count())

    # 4. continuous embedding ingest into a persisted IVF index: seed
    #    an index, then stream a batch of new vectors into its cells
    from matdb_spark.operators.similarity import ivf_topk_indexed, write_ivf_index
    from matdb_spark.streaming import stream_ivf_append

    emb = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (j + 3)) % 53 / 26.5 - 1.0) for j in range(8)]).alias(
            "embedding"
        ),
    )
    cents = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    index = f"{base}/ivf_index"
    write_ivf_index(emb, cents, index)
    arriving = emb.select((F.col("vec_id") + 100).alias("vec_id"), "embedding")
    arriving.coalesce(1).write.json(f"{base}/vec_src")
    vec_stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).json(f"{base}/vec_src")
    q = stream_ivf_append(vec_stream, index, f"{base}/ckpt_vec")
    q.awaitTermination(120)
    q.stop()
    probe = ivf_topk_indexed(
        spark, index, emb.filter(F.col("vec_id") == 5), k=3, nprobe=2
    )
    print("IVF probe over seed + streamed vectors:")
    probe.show(3)

    # 5. the same continuous-ingest lifecycle for the multi-table LSH
    #    index: batches bucket under the STORED hash family
    from matdb_spark.operators.similarity import lsh_topk_indexed, write_lsh_index
    from matdb_spark.streaming import stream_lsh_append

    lsh_index = f"{base}/lsh_index"
    write_lsh_index(emb, lsh_index, planes_per_table=3, tables=4, dim=8)
    q = stream_lsh_append(
        spark.readStream.schema("vec_id long, embedding array<double>").json(
            f"{base}/vec_src"
        ),
        lsh_index,
        f"{base}/ckpt_lsh",
    )
    q.awaitTermination(120)
    q.stop()
    print("LSH probe over seed + streamed vectors:")
    lsh_topk_indexed(
        spark, lsh_index, emb.filter(F.col("vec_id") == 5), k=3
    ).show(3)


if __name__ == "__main__":
    main()
