"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full plan execution,
no driver materialization cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from matdb_spark.session import get_spark

#: Idle-box reference for the canary query (q_mvcc_scan best-of-3 at
#: sf0.1): the replicated idle-history minimum from rounds 6-7
#: (SCALE.md §11). The emitted ``box_factor`` is
#: max(1, measured_canary / CANARY_REF_SEC) — a cross-round grader can
#: divide the headline by it instead of reconstructing the box state
#: from load-average archaeology (r8 verdict items 2 and 8).
CANARY_REF_SEC = 0.43
CANARY_QUERY = "q_mvcc_scan"


def _canary(spark, sf_dir: str) -> float:
    """Best-of-3 wall time of the fixed canary query, forced
    end-to-end through the noop sink — the box-state probe."""
    fn = entrymod.queries().get(CANARY_QUERY)
    if fn is None:  # registry drift must not kill the bench
        return -1.0
    best = None
    for _ in range(3):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark(app_name="matdb_spark_bench")

    # warm the JVM/session so the first measured query isn't paying
    # one-time init: codegen compilation, noop-sink classloading, and
    # the parquet reader path (footer/decoder classes; region is ~KB)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Box-state canary BEFORE the suite (after warmup so it measures
    # the box, not JVM init): load average + a fixed query's best-of-3.
    load_pre = round(os.getloadavg()[0], 2)
    canary_pre = _canary(spark, sf_dir)

    # Per query: best of 2 consecutive runs. The first run often pays
    # one-time JVM costs (whole-stage codegen compilation, JIT warmup)
    # that are noise at any real scale; the best-of-2 is the
    # steady-state throughput number. Failures record -1.
    times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        # label the jobs (guide §1.5) so UI/event-log work is
        # attributable per query; no effect on timing methodology
        spark.sparkContext.setJobDescription(f"bench:{name}")
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                el = round(time.time() - t0, 3)
                best = el if best is None else min(best, el)
            except Exception as e:  # record failures without killing the run
                # keep a successful first-run time if we have one — a
                # transient second-run error shouldn't erase a real
                # end-to-end measurement
                if best is None:
                    best = -1.0
                print(f"# bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)
                break
        times[name] = best

    # Canary AFTER the suite: a stall mid-run shows up as pre/post
    # divergence even when both endpoints look quiet.
    spark.sparkContext.setJobDescription(None)
    load_post = round(os.getloadavg()[0], 2)
    canary_post = _canary(spark, sf_dir)

    failed = sorted(n for n, t in times.items() if t < 0)
    total = round(sum(t for t in times.values() if t >= 0), 3)
    n_ok = max(1, len(times) - len(failed))
    # Box factor comes from the POST canary only: the pre canary in a
    # cold process is dominated by JIT/codegen warm-up (measured: all
    # three back-to-back cold runs ~2 s while the same query reaches
    # ~0.5 s after the suite), so it records process state, not box
    # state. Pre is still emitted — a pre far above its own ~2 s
    # cold-process norm flags a loaded box at start.
    box_factor = (
        round(max(1.0, canary_post / CANARY_REF_SEC), 3)
        if canary_post > 0
        else None
    )
    out = {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(times),
        # box-state canary (r8 verdict items 2/8): the headline number
        # carries its own calibration context.
        "canary": {
            "query": CANARY_QUERY,
            "ref_sec": CANARY_REF_SEC,
            "pre_sec": canary_pre,
            "post_sec": canary_post,
            "load_pre": load_pre,
            "load_post": load_post,
        },
        "box_factor": box_factor,
        "sec_per_query": round(total / n_ok, 3),
        "sec_per_query_calibrated": (
            round(total / n_ok / box_factor, 3) if box_factor else None
        ),
    }
    if failed:
        # failures must be LOUD in the headline line: a crashing query
        # is excluded from the sum, which would otherwise make a broken
        # run look faster than a healthy one.
        out["failed"] = failed
        out["n_failed"] = len(failed)

    # The driver keeps only the TAIL of stdout (last ~2000 chars): a
    # 147-entry queries map overflows that and the whole line becomes
    # unparseable (BENCH_r02 recorded parsed:null). Persist the full
    # UNCAPPED object to a side file FIRST (it must survive a mass
    # failure intact), then shrink the printed line to a
    # guaranteed-to-fit budget by capping the failed list and keeping
    # the SLOWEST queries (the ones perf grading cares about), flagging
    # the truncation.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if failed:
        # cap only the PRINTED name list so a mass failure cannot
        # overflow the line budget (the side file above keeps them all)
        out["failed"] = failed[:15]
    line = json.dumps(out, separators=(",", ":"))
    budget = 1800
    if len(line) > budget:
        ranked = sorted(times.items(), key=lambda kv: -kv[1])
        out["queries_truncated"] = True
        out["detail_file"] = "BENCH_FULL.json"
        keep = len(ranked)
        while keep > 0:
            out["queries"] = dict(ranked[:keep])
            line = json.dumps(out, separators=(",", ":"))
            if len(line) <= budget:
                break
            keep = max(0, keep - max(1, (len(line) - budget) // 24))
        if keep == 0:
            # even an empty map overflows (e.g. a huge failed list) —
            # print the bare headline, which always fits
            out["queries"] = {}
            line = json.dumps(out, separators=(",", ":"))
        # the decrement overshoots (assumes max-width entries); claw
        # back entries while they still fit
        while keep < len(ranked):
            out["queries"] = dict(ranked[: keep + 1])
            cand = json.dumps(out, separators=(",", ":"))
            if len(cand) > budget:
                out["queries"] = dict(ranked[:keep])
                break
            line, keep = cand, keep + 1
    print(line)


if __name__ == "__main__":
    main()
