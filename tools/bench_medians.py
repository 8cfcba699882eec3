"""Combine N full-suite bench runs (BENCH_FULL.json shape) into
per-query replicated medians/minima and compare against a reference
round's per-query times — the r8-verdict item-1 artifact: idle-box
re-certification with every >1.4x mover flagged for investigation.

usage:
  python tools/bench_medians.py ref.json run1.json run2.json [...] \
      [--out BENCH_MEDIANS.json] [--threshold 1.4]

The reference is a driver BENCH_rNN.json or a prior BENCH_FULL.json
(anything with a "queries" map). Canary fields from each run are
carried into the output so the box state travels with the numbers.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        a.split("=", 1)[0]: a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    threshold = float(opts.get("--threshold", 1.4))
    out_path = opts.get("--out")
    ref = json.load(open(args[0]))
    runs = [json.load(open(p)) for p in args[1:]]
    ref_q = ref.get("queries", {})

    names = sorted(
        set().union(*[set(r.get("queries", {})) for r in runs])
    )
    per_q = {}
    movers = []
    for name in names:
        ts = [
            r["queries"][name]
            for r in runs
            if r.get("queries", {}).get(name, -1) >= 0
        ]
        if not ts:
            continue
        med = round(statistics.median(ts), 3)
        mn = round(min(ts), 3)
        entry = {"median": med, "min": mn, "n": len(ts)}
        rv = ref_q.get(name)
        if rv is not None and rv > 0:
            entry["ref"] = rv
            entry["ratio_med"] = round(med / rv, 2)
            entry["ratio_min"] = round(mn / rv, 2)
            # a mover is judged on its MINIMUM (stall-free statistic):
            # if even the best replicate exceeds threshold x ref, the
            # code — not the box — changed
            if mn / rv > threshold:
                movers.append(name)
        per_q[name] = entry

    med_total = round(sum(v["median"] for v in per_q.values()), 3)
    min_total = round(sum(v["min"] for v in per_q.values()), 3)
    out = {
        "n_runs": len(runs),
        "n_queries": len(per_q),
        "suite_median_total": med_total,
        "suite_min_total": min_total,
        "sec_per_query_median": round(med_total / max(1, len(per_q)), 3),
        "sec_per_query_min": round(min_total / max(1, len(per_q)), 3),
        "ref_total": ref.get("value"),
        "threshold": threshold,
        "movers_over_threshold_on_min": sorted(movers),
        "canaries": [r.get("canary") for r in runs],
        "box_factors": [r.get("box_factor") for r in runs],
        "queries": per_q,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    brief = {k: v for k, v in out.items() if k != "queries"}
    print(json.dumps(brief, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
