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
correctness-harmless because the probe counts DISTINCT doc ids per
bucket and de-duplicates index rows before pairing (duplicate rows
can neither inflate a bucket past the skew cap nor duplicate pairs);
they only cost storage until
`operators.index_maint.compact_minhash_index` drops the duplicate
(doc_id, band, key) rows during maintenance. A store hooked via
``db`` gets the usual exactly-once treatment through the
batch-id-stamped transaction path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from matdb_spark.database import Database
from matdb_spark.operators.dedup import admit_batch
from matdb_spark.streaming.ingest import BatchReplayGuard


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
    idempotent index append re-runs). Returns the StreamingQuery.

    Upstream redelivery caveat: ``reject_identity=False`` makes SPARK
    checkpoint replays re-derive the admitted set, but a document the
    SOURCE re-delivers with the same id in a LATER micro-batch (an
    at-least-once upstream, not a checkpoint replay) matches only its
    own index entry, so it is RE-admitted, its banding rows appended
    again, and it is committed to the store again. The store stays
    correct — the MVCC upsert is newest-wins on the key, so the
    re-commit supersedes rather than duplicates — and the extra
    banding rows are removed by ``compact_minhash_index``; but a
    pipeline that must not re-admit (e.g. admission feeds a side
    effect) should deduplicate ids upstream or key batches so
    redelivery lands in the same batch id."""
    spark = stream_df.sparkSession
    source = source_name or checkpoint
    guard = BatchReplayGuard(db.path, source, "stream_admission") if db is not None else None

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        # Guard FIRST: a batch whose commit landed has necessarily
        # already appended its banding rows (append precedes commit),
        # so a post-commit replay can skip the whole admission pass —
        # no wasted jobs, no duplicate banding rows in the index.
        if guard is not None and guard.already_committed(batch_id):
            return
        # reject_identity=False is load-bearing: if a crashed attempt
        # already appended this batch's banding rows (crash BETWEEN
        # append and commit — the guard above can't see that case),
        # the replay's probe matches each document to ITSELF in the
        # index — with identity matches ignored, the pairwise
        # rejection rule RE-DERIVES the same admitted set, so the db
        # commit below still receives the batch's rows. (The one-shot
        # default reject_identity=True would admit nothing on replay
        # and lose the batch between index append and store commit.)
        admitted = admit_batch(
            spark,
            index_path,
            batch_df,
            id_col,
            text_col,
            reject_identity=False,
            **lsh_kwargs,
        )
        if db is None:
            return
        rows = admitted.select(*db_columns) if db_columns else admitted
        with db.begin() as txn:
            txn.add_dataframe(rows)
            txn.commit(extra={"stream_source": source, "batch_id": int(batch_id)})
        guard.record(batch_id)

    writer = stream_df.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
