"""Sequence packing for training-data pipelines: lay documents out as
a deterministic token stream and chunk it into fixed-budget packs
(GPT-style pretraining packing — documents are concatenated in a
reproducible order, and each training sequence is one ``budget``-token
window of the stream).

Design for 100 TB:
- The layout order is (shard, hash, id): shard = hash(id) mod
  n_shards, so the stream is split into ``n_shards`` independent
  streams — each shard's cumulative-sum window is its own partition
  (no global single-task window), and n_shards scales with the
  cluster while keeping every shard's order reproducible from the
  data alone (no RNG, no driver state).
- Everything is JVM expressions: one md5-derived hash, one window
  cumsum per shard = ONE shuffle total; full codegen.
- Deterministic & engine-portable: the same md5 hash and prefix-sum
  are expressible in ANSI SQL, so packing decisions can be
  oracle-verified and reproduced by any engine that reads the corpus.

The reference has no notion of this operator (it is an LLM-pipeline
addition per the build brief); the hash trick is shared with
operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from matdb_spark.functions.text import hash_hex, normalize


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Assign every document a position in the packed token stream.

    Returns the input plus:
      ``shard``     — which independent stream (hash(id) mod n_shards)
      ``start_tok`` — the document's first-token offset in its shard's
                      concatenated stream (prefix sum of earlier docs)
      ``pack_id``   — floor(start_tok / budget): the training sequence
                      in which this document STARTS (documents may
                      straddle pack boundaries, exactly like
                      concatenate-then-chunk pretraining pipelines)
      ``pack_pos``  — start_tok mod budget: offset within that pack

    Choose ``n_shards`` ≈ a few × cluster cores: each shard's window
    is one task, and packs never cross shards (shard boundaries are
    the only place the stream "restarts").
    """
    if budget < 1:
        raise ValueError(f"budget={budget}; expected >= 1")
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards}; expected >= 1")
    # NULLs fail the job on the first offending row (per-row
    # expression, no extra validation pass): a NULL id would hash to a
    # NULL shard — an undeclared extra stream with nondeterministic
    # internal order — and a NULL token count would be SKIPPED by the
    # window sum, silently assigning two documents the same
    # (pack_id, pack_pos) slot.
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"pack_documents: NULL {id_col}")),
    ).otherwise(F.col(id_col))
    checked_toks = F.when(
        F.col(token_col).isNull(),
        F.raise_error(F.lit(f"pack_documents: NULL {token_col}")),
    ).otherwise(F.col(token_col))
    h = hash_hex(checked_id, 12)
    with_shard = df.withColumn("__ph", h).withColumn(
        "shard", F.pmod(F.col("__ph"), F.lit(n_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__ph").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(checked_toks).over(w), F.lit(0)).cast("long")
    return (
        with_shard.withColumn("start_tok", start)
        # integer DIV, never floor(double/double): double division is
        # inexact past 2^53 token offsets (same rule as scan.py's
        # chunk arithmetic) and would diverge from integer-div oracles
        .withColumn("pack_id", F.expr(f"start_tok DIV {int(budget)}"))
        .withColumn("pack_pos", (F.col("start_tok") % F.lit(budget)).cast("long"))
        .drop("__ph")
    )


def pack_manifest(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-pack manifest: documents starting in each pack and the
    token mass they contribute (boundary-straddling tails are counted
    with the pack where their document STARTS, matching how a loader
    slices the stream). One aggregation on the packed relation."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("tok_mass"),
        F.min("pack_pos").cast("long").alias("first_pos"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into fixed-budget training chunks with
    optional token overlap: one output row per chunk — (id, chunk_idx,
    n_chunk_tokens, chunk_text). Chunk starts advance by
    ``chunk_tokens - overlap``; a final window that would be wholly
    contained in the previous chunk is not emitted (the HF-tokenizer
    ``return_overflowing_tokens`` stride convention). Documents with
    no tokens produce no rows; a document shorter than the budget is
    its own single chunk.

    All JVM expressions: the token array materializes once per row
    (two-phase projection — see dedup.shingle_rows), starts are a
    ``sequence``, and chunks slice the attribute; posexplode keeps the
    chunk index. No shuffle, no UDF — the plan is scan → generate,
    and the same slice arithmetic is expressible in ANSI SQL for
    oracle verification."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    words = df.select(
        F.col(id_col),
        F.filter(
            F.split(normalize(F.coalesce(F.col(text_col), F.lit(""))), " "),
            lambda x: x != F.lit(""),
        ).alias("__w"),
    ).filter(F.size("__w") > 0)
    n = F.size("__w")
    # last useful start: the largest k*step that still adds tokens
    # beyond the previous chunk's end (start == 0 always useful)
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(step)),
        lambda s: (s == 0) | (s + F.lit(overlap) < n),
    )
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(
            " ", F.slice(F.col("__w"), s + 1, F.lit(chunk_tokens))
        ),
    )
    sizes = F.transform(
        starts, lambda s: F.least(F.lit(chunk_tokens), F.size("__w") - s)
    )
    return (
        words.select(
            id_col,
            F.posexplode(F.arrays_zip(chunks.alias("t"), sizes.alias("n"))),
        )
        .select(
            id_col,
            F.col("pos").cast("int").alias("chunk_idx"),
            F.col("col.n").cast("long").alias("n_chunk_tokens"),
            F.col("col.t").alias("chunk_text"),
        )
    )
