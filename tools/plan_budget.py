"""Plan-shape budget for EVERY gated query — the plan-quality twin of
the value oracle.

For each ``__spark_entry__.queries()`` entry, build the DataFrame at
sf0.001 and record its physical-plan shape: shuffle-exchange count,
parquet-scan count, broadcast-join count, shuffled-join count. The
snapshot lives in ``PLAN_BUDGET.json`` at the repo root; ``--check``
recompares the live plans against it and FAILS if any query's
exchange / scan / shuffled-join count EXCEEDS its recorded budget (a
broadcast that degrades to a shuffle, a lost ReusedExchange, a filter
that stops pruning all show up here long before they show up as
seconds at scale). New queries without a recorded budget are reported
and must be added with ``--update``.

Decreases are allowed on check (an improvement), but tighten the
budget with ``--update`` so the gain is locked in.

Usage:
  PYTHONPATH=/root/repo python tools/plan_budget.py --update   # record
  PYTHONPATH=/root/repo python tools/plan_budget.py --check    # enforce

The hand-written plan tests (tests/test_plans.py) assert the WHY for
the load-bearing operators; this file asserts the WHAT for all of
them, so an innocent-looking refactor can't silently double a shuffle
in a query nobody was watching.

Counting convention (r9 verdict "what's wrong" #3 — stated so the
numbers here can be reconciled against committed plan dumps):
- plans are built at **sf0.001** (SF_DIR below). Dumps under plans/rNN
  are captured at sf0.1, where ``load_table`` adds a round-robin
  repartition Exchange per 100 KB+ table that sf0.001 never has — so a
  dump can legitimately show MORE exchanges than the budget records.
- ``exchanges`` counts ``(n) Exchange`` nodes in the PRE-EXECUTION
  formatted plan (AdaptiveSparkPlan initial plan). BroadcastExchange
  nodes are *not* counted (they are driver-side broadcasts, not
  cluster shuffles); ReusedExchange is not counted (costs nothing).
The same convention is embedded in the JSON under ``_convention``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from matdb_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    scan_counts,
    shuffle_join_count,
)
from matdb_spark.session import get_spark

BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_BUDGET.json"
)
SF_DIR = "/root/testdata/sf0.001"

# the counts where an INCREASE is a regression; broadcast_joins is
# recorded for context only (more broadcasts can be an improvement)
ENFORCED = ("exchanges", "scans", "shuffle_joins")


def shape(df) -> dict:
    return {
        "exchanges": exchange_count(df),
        "scans": scan_counts(df),
        "broadcast_joins": broadcast_join_count(df),
        "shuffle_joins": shuffle_join_count(df),
    }


def snapshot(spark) -> tuple[dict, list[str]]:
    shapes, errors = {}, []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            shapes[name] = shape(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — record, keep going
            errors.append(f"{name}: {type(e).__name__}: {e}")
    return shapes, errors


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    spark = get_spark(app_name="plan_budget")
    shapes, errors = snapshot(spark)
    for e in errors:
        print(f"BUILD-ERROR {e}")
    if mode == "--update":
        out = dict(shapes)
        out["_convention"] = (
            "built at sf0.001 (no load_table repartition exchange); "
            "exchanges = '(n) Exchange' nodes in the pre-execution "
            "formatted plan; BroadcastExchange and ReusedExchange not "
            "counted — see tools/plan_budget.py docstring"
        )
        with open(BUDGET_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"recorded {len(shapes)} plan budgets -> {BUDGET_PATH}")
        return 1 if errors else 0

    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    regressions, new, improved = [], [], []
    for name, got in shapes.items():
        want = budget.get(name)
        if want is None:
            new.append(name)
            continue
        for k in ENFORCED:
            if got[k] > want[k]:
                regressions.append(f"{name}: {k} {want[k]} -> {got[k]}")
            elif got[k] < want[k]:
                improved.append(f"{name}: {k} {want[k]} -> {got[k]}")
    for r in regressions:
        print(f"REGRESSION {r}")
    for n in new:
        print(f"NEW (no budget — run --update) {n}")
    for i in improved:
        print(f"improved {i}")
    ok = not regressions and not errors
    print(
        f"{len(shapes)} checked, {len(regressions)} regressions, "
        f"{len(new)} new, {len(improved)} improved, {len(errors)} build errors"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
