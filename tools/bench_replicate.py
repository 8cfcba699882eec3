"""Replicated benchmark: run one representative query per family N
times (default 10) and report median / IQR — the noise-resistant
regression signal the single-shot suite can't give (±20% run-to-run
on a shared box swamps per-query deltas; a median of 10 doesn't).

Usage: PYTHONPATH=/root/repo python tools/bench_replicate.py [N]
Results recorded in SCALE.md §11. Run on an otherwise-idle box.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from matdb_spark.session import get_spark

# one query per family, chosen as each family's slowest stable member
FAMILY_REPS = {
    "relational": "q21_waiting_suppliers",
    "window": "q_window_running",
    "dedup": "q_dedup_minhash_lsh",
    "similarity": "q_similarity_topk",
    "text": "q_tfidf_topk",
    "mvcc_scan": "q_mvcc_scan",
    "mvcc_lifecycle": "q_mvcc_time_travel",
    "streaming": "q_stream_dedup",
    "udf": "q_cogroup_stats",
    "multimodal": "q_multimodal_decode",
    # round-3 single-shot movers (>1.5x vs r2) put under medians to
    # separate suite-order noise from real regressions
    "dedup_simhash": "q_dedup_simhash",
    "schema_evolution": "q_schema_evolution",
    "sketch_merge": "q_hll_sketch_merge",
    # round-4 additions: the standing-corpus lifecycle (slowest suite
    # entry — 3 sequential batches by construction) and the selection
    # family
    "admission": "q_dedup_admission",
    "selection": "q_importance_weights",
    "multimodal_audio": "q_multimodal_audio",
    "pipeline": "q_llm_pipeline",
    "pq": "q_similarity_pq",
    # round-4 single-shot movers (>1.2x vs r3, both mechanism-less)
    # put under medians per the round-4 verdict's bench-hygiene item
    "tfidf_topterms": "q_tfidf_topterms",
    "supplier_count": "q16_supplier_count",
    # round-5 additions: recall gates + BPE-budget packing
    "ann_recall": "q_ann_recall_ivfpq",
    "pack_bpe": "q_pack_bpe",
    # round-5 late additions: the quality-gate family (LSH ANN recall
    # is the suite's 4th-slowest single shot — two legs by
    # construction: 8-table candidates + exact baseline) and the new
    # dedup tiers
    "ann_recall_lsh": "q_ann_recall_lsh",
    "dedup_spans": "q_dedup_spans",
    "dedup_lsh_recall": "q_dedup_lsh_recall",
    "semantic_dedup": "q_semantic_dedup",
    "dedup_canonical": "q_dedup_canonical",
    "simhash_pairs": "q_dedup_simhash_pairs",
    # round-6 addition: the one unexplained r4->r5 single-shot mover
    # (3.21 -> 4.49 s, 1.40x) put under a replicated median per the
    # round-5 verdict item 3
    "stream_stream_join": "q_stream_stream_join",
    # round-6 curation additions: one representative per new family
    "pii": "q_pii_scrub",
    "line_dedup": "q_line_dedup",
    "sq8": "q_similarity_sq8",
    "sq8_indexed": "q_similarity_sq8_indexed",
    "hybrid_rrf": "q_hybrid_rrf",
    "catalog": "q_catalog_sql",
    "split_leakage": "q_split_leakage_safe",
    "bpe_roundtrip": "q_bpe_roundtrip",
    # round-8 addition: the SQL DML surface (MERGE is the family's
    # heaviest statement — dup-check aggregation + three legs + txn)
    "ddl_dml": "q_ddl_merge",
}


def main() -> None:
    # usage: bench_replicate.py [N] [family1,family2,...]
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_replicate")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    qs = entrymod.queries()
    out = {}
    reps = {f: q for f, q in FAMILY_REPS.items() if only is None or f in only}
    for family, name in reps.items():
        fn = qs[name]
        times = []
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        med = statistics.median(times)
        if len(times) >= 2:
            quartiles = statistics.quantiles(times, n=4)
            q1, q3 = quartiles[0], quartiles[2]
        else:
            q1 = q3 = med
        out[family] = {
            "query": name,
            "median_s": round(med, 3),
            "iqr_s": round(q3 - q1, 3),
            "min_s": round(min(times), 3),
            "n": n,
        }
        print(f"{family:15s} {name:28s} median {med:6.2f} s  "
              f"IQR {q3 - q1:5.2f}  min {min(times):5.2f}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "replicates": n, "families": out}))


if __name__ == "__main__":
    main()
