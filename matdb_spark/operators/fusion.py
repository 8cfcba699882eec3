"""Rank fusion for hybrid retrieval.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
fuse N per-query rankings (e.g. a lexical BM25/TF-IDF list and a
vector-similarity list) by scoring each candidate
``sum_r 1/(k0 + rank_r)`` and re-ranking. RRF is the standard hybrid
combiner because it needs no score calibration across systems — only
ranks — which is also what makes it exactly replayable by an oracle.

Determinism contract: the reciprocal is computed as EXACT integer
division ``SCALE div (k0 + rank)`` (micro-scaled, the repo's
integer-quantization convention — selection.py's micro-nats), so the
fused score is an exact BIGINT sum: order-independent, identical on
any engine. A double ``1/(k0+r)`` sum would be fold-order-dependent
across partitions.

Scale shape: UNION the rankings and hash-aggregate on
(query, candidate) — one shuffle keyed by the fused pair, linear in
total ranking rows. No N-way outer join (which would shuffle N times
and null-pad): absent candidates simply contribute nothing, exactly
RRF's semantics. The final per-query top-k is the ranking-window
top-k (WindowGroupLimit: each map task ships <= k rows per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from matdb_spark.operators.topk import top_k_per_group

RRF_SCALE = 1_000_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Fuse per-query rankings into (query, id, rrf_micro, n_sources,
    rank). ``rrf_micro`` is the exact integer-scaled RRF score;
    ``n_sources`` counts how many input rankings proposed the
    candidate (the agreement signal hybrid pipelines threshold on).
    Ties break by id ascending — fully deterministic."""
    if not rankings:
        raise ValueError("need at least one ranking")
    scored = None
    for r in rankings:
        part = r.select(
            F.col(query_col),
            F.col(id_col),
            F.expr(f"{RRF_SCALE}L div ({k0} + {rank_col})").alias("__s"),
        )
        scored = part if scored is None else scored.unionByName(part)
    fused = scored.groupBy(query_col, id_col).agg(
        F.sum("__s").alias("rrf_micro"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    return top_k_per_group(
        fused,
        [query_col],
        [F.col("rrf_micro").desc(), F.col(id_col).asc()],
        k,
    )
