"""Round-9 isolation profiler: time named queries in ONE warm session
through the noop sink (guide §1.4) and optionally dump their
``explain("formatted")`` plans.

Usage:
  PYTHONPATH=/root/repo python tools/profile_query.py q_ann_lsh q_pq_train \
      [--n=3] [--plans=plans/r09] [--suffix=_before] [--sf=/root/testdata/sf0.1]

Prints one line per query: name, per-run seconds, min. Jobs are
labelled via setJobDescription so UI/event-log work is attributable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from matdb_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        a.split("=", 1)[0]: a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    n = int(opts.get("--n", "3"))
    plans_dir = opts.get("--plans")
    suffix = opts.get("--suffix", "_before")
    sf_dir = opts.get("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    spark = get_spark(app_name="profile_query")
    # same warmup as bench.py so run 1 is comparable
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    reg = entrymod.queries()
    results = {}
    for name in names:
        fn = reg.get(name)
        if fn is None:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"runs": runs, "min": min(runs)}
        print(f"{name:32s} min={min(runs):7.3f}  runs={runs}", flush=True)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
    print(json.dumps(results, separators=(",", ":")))


if __name__ == "__main__":
    main()
