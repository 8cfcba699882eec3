"""Continuous ingest into the MVCC store.

The reference's closest notion is periodic ``flush`` during a long
ingest (examples/sensor-log.rs:290-295: flush every 10M rows). The
Spark-first equivalent: a Structured Streaming query whose every
micro-batch commits as ONE matdb transaction — readers running
snapshot scans concurrently always observe batch-aligned state, never
a torn batch, because visibility flips atomically at manifest publish
(matdb_spark.manifest).

Exactly-once: the streaming checkpoint guarantees each source batch is
delivered once to ``foreachBatch``; the manifest commit is atomic. If
the process dies between segment write and manifest publish, recovery
discards the orphaned segment (Database.open) and the batch replays —
the store never double-counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from matdb_spark.database import Database


def stream_into_database(
    stream_df: DataFrame,
    db: Database,
    checkpoint: str,
    available_now: bool = True,
):
    """Start a streaming query writing ``stream_df`` into ``db``.

    Each micro-batch: begin txn → add_dataframe (distributed chunk
    routing + segment write) → commit (manifest publish). Returns the
    StreamingQuery; caller awaits/stops it.
    """

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        txn = db.begin()
        txn.add_dataframe(batch_df)
        txn.commit()

    writer = (
        stream_df.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
