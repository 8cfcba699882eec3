"""Streaming embedding ingest into a persisted IVF index
(streaming/vectors.py) — the vector twin of text admission: batches
land via append_ivf_index, probes see old and new vectors uniformly,
and maintenance reclaims crash-replay debris."""

import os

import pyspark.sql.functions as F


def _emb(spark, ids):
    comps = [
        (((F.col("id") * (j * 2 + 3)) % 197) / 98.5 - 1.0) for j in range(8)
    ]
    return (
        spark.createDataFrame([(i,) for i in ids], "id long")
        .select(F.col("id").alias("vec_id"), F.array(*comps).alias("embedding"))
    )


def test_stream_ivf_append_and_compaction(spark, tmp_path_factory):
    from matdb_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_indexed,
        write_ivf_index,
    )
    from matdb_spark.streaming.vectors import (
        compact_stream_ivf_index,
        stream_ivf_append,
    )

    base = str(tmp_path_factory.mktemp("stream_ivf"))
    index = os.path.join(base, "index")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")

    seed = _emb(spark, range(0, 40))
    cents = seed.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    write_ivf_index(seed, cents, index)

    # two source files so availableNow runs >1 micro-batch
    _emb(spark, range(100, 120)).coalesce(1).write.json(src)
    _emb(spark, range(120, 140)).coalesce(1).write.mode("append").json(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = stream_ivf_append(stream, index, ckpt)
    try:
        assert q.awaitTermination(240), "availableNow stream did not finish"
    finally:
        q.stop()

    rows = spark.read.parquet(index)
    assert rows.count() == 80  # 40 seed + 40 streamed
    got = {
        r["neighbor_id"]
        for r in ivf_topk_indexed(
            spark, index, _emb(spark, [100]), k=5, nprobe=2
        ).collect()
    }
    assert any(n >= 100 for n in got)  # streamed vectors are probe-able

    # crash-window replay: the same batch appended twice leaves
    # byte-identical duplicates; maintenance reclaims them
    append_ivf_index(spark, _emb(spark, range(200, 210)), index)
    append_ivf_index(spark, _emb(spark, range(200, 210)), index)
    assert spark.read.parquet(index).count() == 100
    compact_stream_ivf_index(spark, index)
    assert spark.read.parquet(index).count() == 90
    assert (
        spark.read.parquet(index).select("vec_id").distinct().count() == 90
    )
    # centroids sidecar survived the swap byte-for-byte
    assert spark.read.parquet(index + "/_centroids").count() == 4
