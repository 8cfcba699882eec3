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


def test_stream_lsh_append_and_compaction(spark, tmp_path_factory):
    from matdb_spark.operators.similarity import (
        append_lsh_index,
        lsh_topk,
        lsh_topk_indexed,
        write_lsh_index,
    )
    from matdb_spark.streaming.vectors import (
        compact_stream_lsh_index,
        stream_lsh_append,
    )

    base = str(tmp_path_factory.mktemp("stream_lsh"))
    index = os.path.join(base, "index")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")

    seed = _emb(spark, range(0, 40))
    write_lsh_index(seed, index, planes_per_table=3, tables=4, dim=8)

    _emb(spark, range(100, 120)).coalesce(1).write.json(src)
    _emb(spark, range(120, 140)).coalesce(1).write.mode("append").json(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = stream_lsh_append(stream, index, ckpt)
    try:
        assert q.awaitTermination(240), "availableNow stream did not finish"
    finally:
        q.stop()

    # every vector carries one row per table
    assert spark.read.parquet(index).count() == 80 * 4
    # the streamed corpus is probe-able and equals the live path over
    # the same 80 vectors
    all_vecs = _emb(spark, list(range(0, 40)) + list(range(100, 140)))
    queries = _emb(spark, [100])

    def key(df):
        return {
            (r["query_id"], r["rank"]): r["neighbor_id"] for r in df.collect()
        }

    assert key(lsh_topk_indexed(spark, index, queries, k=5)) == key(
        lsh_topk(all_vecs, queries, k=5, planes_per_table=3, tables=4, dim=8)
    )

    # crash-window replay duplicates are reclaimed by maintenance,
    # and the _params sidecar survives the swap
    append_lsh_index(spark, _emb(spark, range(200, 210)), index)
    append_lsh_index(spark, _emb(spark, range(200, 210)), index)
    assert spark.read.parquet(index).count() == 90 * 4 + 10 * 4
    compact_stream_lsh_index(spark, index)
    assert spark.read.parquet(index).count() == 90 * 4
    assert spark.read.parquet(index + "/_params").count() == 1
    # probes still work after the swap
    assert len(key(lsh_topk_indexed(spark, index, queries, k=5))) == 5
