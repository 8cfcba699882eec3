"""q_loader_pipeline sf1.0 ratio attribution (r7 verdict item 5).

SCALE.md §14 measured the loader capstone at 3.13× wall for 10× data —
the suite's largest ratio. Hypothesis (r7 verdict): the sf1.0
derivation (tools/sf1_cert.py) salts EVERY token of every non-zero
replica ("word" → "word3"), so the derived corpus carries ~10× the
DISTINCT VOCABULARY of sf0.1 — and the BPE trainer's word-count
relation grows with vocabulary, a growth the fixture CONSTRUCTS rather
than one real 10× corpora exhibit (replicated/crawled text grows in
tokens, not proportionally in vocabulary).

This probe separates the two effects by timing q_loader_pipeline on
three corpora:
  - sf0.1 (baseline),
  - VP10 : a VOCABULARY-PRESERVING 10× derivation (same replica
    structure and doc-identity salting as sf1_cert, text left
    verbatim — tokens ×10, vocabulary ×1),
  - sf1.0 : the token-salted derivation (tokens ×10, vocabulary ×10).

ratio(VP10) is the honest 10×-data scaling of the operator chain;
ratio(sf1.0) − ratio(VP10) is the constructed-vocabulary surcharge.
Numbers land in SCALE.md §14.2.

Usage: PYTHONPATH=/root/repo python tools/loader_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from matdb_spark.session import get_spark
from matdb_spark.sources.formats import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch")
SRC = "/root/testdata/sf0.1"
SF1 = os.path.join(SCRATCH, "sf1.0")
VP10 = os.path.join(SCRATCH, "sf1.0vp")
REPS = 10


def gen_vp(spark) -> None:
    marker = os.path.join(VP10, "_GENERATED")
    if os.path.exists(marker):
        return
    shutil.rmtree(VP10, ignore_errors=True)
    os.makedirs(VP10, exist_ok=True)
    rep = spark.range(REPS).select(F.col("id").alias("__r"))
    docs = load_table(spark, SRC, "documents")
    big = docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("__r") * F.lit(10_000_000)).alias("doc_id"),
        "text",  # verbatim: tokens x10, vocabulary x1
        "lang",
        "source",
    )
    big = big.withColumn("n_chars", F.length("text").cast("long"))
    big.write.mode("overwrite").parquet(os.path.join(VP10, "documents.parquet"))
    with open(marker, "w") as f:
        f.write("ok")


def main() -> None:
    spark = get_spark(
        app_name="loader_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    if not os.path.exists(os.path.join(SF1, "_GENERATED")):
        print("derived sf1.0 missing — run tools/sf1_cert.py gen first")
        return
    gen_vp(spark)

    import __spark_entry__ as entry

    # distinct-vocabulary check: confirms what each corpus constructs
    vocab = {}
    for tag, d in (("sf0.1", SRC), ("vp10", VP10), ("sf1.0", SF1)):
        docs = load_table(spark, d, "documents")
        vocab[tag] = (
            docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .agg(F.approx_count_distinct("w").alias("v"))
            .first()["v"]
        )

    fn = entry.queries()["q_loader_pipeline"]
    # two protocols, both best-of-2 (stall-robust on a noisy box):
    #   with_train : memo cleared per timed run — BPE training included
    #   steady     : memo warm — the §14 sf1_cert protocol (train excluded)
    times: dict[str, dict[str, tuple[float, int]]] = {"with_train": {}, "steady": {}}
    for tag, d in (("sf0.1", SRC), ("vp10", VP10), ("sf1.0", SF1)):
        entry._BPE16_MEMO.clear()
        fn(spark, d).count()  # warm: JIT + shuffles (also trains+memoizes)
        for mode in ("steady", "with_train"):
            best, rows = None, 0
            for _ in range(2):
                if mode == "with_train":
                    entry._BPE16_MEMO.clear()
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[mode][tag] = (round(best, 2), rows)
            print(
                f"  {tag:6s} {mode:10s} {best:7.2f} s  rows={rows}  "
                f"vocab~{vocab[tag]}"
            )

    out = {
        "vocab_approx": vocab,
        "rows": {k: v[1] for k, v in times["steady"].items()},
    }
    for mode in ("steady", "with_train"):
        out[f"loader_s_{mode}"] = {k: v[0] for k, v in times[mode].items()}
        base = times[mode]["sf0.1"][0]
        out[f"ratio_vp10_{mode}"] = round(times[mode]["vp10"][0] / base, 2)
        out[f"ratio_sf1_salted_{mode}"] = round(times[mode]["sf1.0"][0] / base, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
