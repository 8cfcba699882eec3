"""Streaming embedding ingest into a persisted IVF index — the vector
twin of streaming/admission.py's text-side admission: each micro-batch
of (id, embedding) rows is assigned to its nearest STORED centroid and
appended into that cell's partition directory (`append_ivf_index`), so
a continuously arriving embedding corpus stays probe-able without ever
rebuilding the index.

Delivery semantics mirror admission's: the index append is NOT
transactional with the streaming checkpoint. A crash between append
and checkpoint write replays the batch and appends its cell rows a
second time. Because the assignment is deterministic (stored unit
centroids, `centroids_unit=True`), the replayed rows are byte-identical
duplicates — they would surface the SAME neighbor twice in a top-k, so
probes over an index that may carry replay debris should either run
maintenance first or dedup ids (`ivf_topk_indexed` scores whatever
rows exist; duplicates do not change WHICH vectors are near, only row
multiplicity). `compact_ivf_index(..., dedup_cols=["vec_id",
"cell_id"])` — wired here as `compact_stream_ivf_index` — reclaims the
debris during offline maintenance, exactly like the MinHash path.
"""

from __future__ import annotations


def stream_ivf_append(
    stream_df,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Start a streaming query appending ``stream_df`` micro-batches
    of embeddings into the persisted IVF index at ``index_path`` (must
    already exist — centroids are read from its `_centroids/`
    sidecar). Returns the StreamingQuery. One broadcast assignment +
    one partitioned append per batch; no corpus-sized work ever."""
    from matdb_spark.operators.similarity import append_ivf_index

    spark = stream_df.sparkSession

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_ivf_index(spark, batch_df, index_path, id_col, vec_col)

    return (
        stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        if available_now
        else stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_lsh_append(
    stream_df,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Streaming twin for the persisted multi-table LSH index: each
    micro-batch is bucketed under the STORED hash family (`_params`
    sidecar — bit-identical planes) and appended into its (table,
    bucket) partitions. Same delivery semantics as stream_ivf_append:
    the append is not transactional with the checkpoint, a
    crash-window replay appends byte-identical duplicate rows, and
    `compact_stream_lsh_index` reclaims them offline. Unlike IVF
    cells the hash family never drifts, so there is no rebuild
    trigger to watch."""
    from matdb_spark.operators.similarity import append_lsh_index

    spark = stream_df.sparkSession

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_lsh_index(spark, batch_df, index_path, id_col, vec_col)

    writer = stream_df.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_stream_lsh_index(spark, path: str) -> tuple[int, int]:
    """Offline maintenance for a stream-fed LSH index: collapse
    per-batch append debris and drop crash-replay duplicate rows
    (dedup on (vec_id, table, bucket) — bucketing is deterministic,
    so a replayed vector can only land in the same partitions). The
    `_params` sidecar is preserved byte-for-byte."""
    from matdb_spark.operators.index_maint import compact_index

    return compact_index(
        spark,
        path,
        ["table", "bucket"],
        ["vec_id"],
        sidecars=("_params",),
        dedup_cols=["vec_id", "table", "bucket"],
    )


def stream_sq8_append(
    stream_df,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Streaming twin for the persisted CODES-ONLY IVF-SQ8 index:
    each micro-batch is assigned against the stored unit centroids
    and encoded with the STORED `_sq8` ranges (out-of-range
    components saturate — a drifting stream degrades recall smoothly,
    it never corrupts scores). Same delivery semantics as
    stream_ivf_append: the append is not transactional with the
    checkpoint, a crash-window replay appends byte-identical
    duplicate code rows (assignment AND encoding are deterministic),
    and `compact_stream_sq8_index` reclaims them offline."""
    from matdb_spark.operators.quantization import append_ivf_sq8_index

    spark = stream_df.sparkSession

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_ivf_sq8_index(spark, batch_df, index_path, id_col, vec_col)

    writer = stream_df.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_stream_sq8_index(spark, path: str) -> tuple[int, int]:
    """Offline maintenance for a stream-fed IVF-SQ8 index: collapse
    per-batch append debris and drop crash-replay duplicate code rows
    (dedup on (vec_id, cell_id)); `_centroids` and `_sq8` sidecars
    are preserved byte-for-byte."""
    from matdb_spark.operators.index_maint import compact_index

    return compact_index(
        spark,
        path,
        "cell_id",
        ["vec_id"],
        sidecars=("_centroids", "_sq8"),
        dedup_cols=["vec_id", "cell_id"],
    )


def compact_stream_ivf_index(spark, path: str) -> tuple[int, int]:
    """Offline maintenance for a stream-fed IVF index: collapse the
    per-batch append debris AND drop the byte-identical duplicate rows
    a crash-window replay leaves behind (dedup on (vec_id, cell_id) —
    assignment is deterministic, so a replayed vector can only land in
    the same cell). `_centroids` is preserved byte-for-byte."""
    from matdb_spark.operators.index_maint import compact_index

    return compact_index(
        spark,
        path,
        "cell_id",
        ["vec_id"],
        dedup_cols=["vec_id", "cell_id"],
    )
