"""Streaming corpus admission: dedup-at-the-door for a standing corpus.

The batch form (`operators.dedup.admit_batch`) rejects near-duplicates
of everything previously admitted by probing the persisted MinHash
index, then appends the survivors' banding rows. This module wires it
to Structured Streaming: each micro-batch is admitted against the
index (and optionally committed into an MVCC store), so a continuously
arriving corpus stays near-dup-free without ever re-mining it.

Delivery semantics: the index append is NOT transactional with the
checkpoint — a crash between append and checkpoint write replays the
batch and appends its banding rows a second time. That is
CORRECTNESS-harmless (candidate pairs are de-duplicated, so duplicate
index rows only cost storage — reclaim with
`operators.index_maint.compact_minhash_index` during maintenance), but
a store hooked via ``db`` gets the usual exactly-once treatment by
committing through the batch-id-stamped transaction path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from matdb_spark import manifest
from matdb_spark.database import Database
from matdb_spark.operators.dedup import admit_batch


def stream_admission(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str,
    text_col: str,
    db: Database | None = None,
    db_columns: list[str] | None = None,
    available_now: bool = True,
    source_name: str | None = None,
    **lsh_kwargs,
):
    """Start a streaming query admitting ``stream_df`` batches against
    the MinHash index at ``index_path``. Admitted rows (novel vs
    everything admitted so far) are appended to the index and, if
    ``db`` is given, committed into the MVCC store exactly-once
    (replayed batch ids are recognized and skipped — only the
    idempotent index append re-runs). Returns the StreamingQuery."""
    spark = stream_df.sparkSession
    source = source_name or checkpoint
    seen: list = [None, False]  # [max committed batch id, scanned?]

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        # Replay-idempotent by construction: if a crashed attempt
        # already appended this batch's banding rows, the replay's
        # probe matches each document to ITSELF in the index — and
        # self-pairs (new_id == corpus_id) are filtered — so the
        # pairwise rejection rule re-derives the same admitted set.
        admitted = admit_batch(
            spark, index_path, batch_df, id_col, text_col, **lsh_kwargs
        )
        if db is None:
            return
        if not seen[1]:
            seen[0] = manifest.max_committed_batch_id(db.path, source)
            seen[1] = True
        if seen[0] is not None and batch_id <= seen[0]:
            return  # replayed batch: already committed to the store
        rows = admitted.select(*db_columns) if db_columns else admitted
        with db.begin() as txn:
            txn.add_dataframe(rows)
            txn.commit(extra={"stream_source": source, "batch_id": int(batch_id)})
        seen[0] = batch_id if seen[0] is None else max(seen[0], batch_id)

    writer = stream_df.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
