"""Driver-environment insurance: the correctness gate runs our
queries in a FOREIGN SparkSession (the driver harness's, not
get_spark's) — potentially non-UTC and without the nanosAsLong conf.
load_table/parse paths set those defensively at call time; this test
proves timestamp-sensitive queries return identical results from a
session born in another timezone, in a real subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

# a driver-like session: NOT get_spark — JVM inherits TZ from the env,
# session timezone left at its (non-UTC) default
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "America/New_York")
    .appName("foreign_gate")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
out = {}
for name in ("q01_pricing_summary", "q06_forecast_revenue", "q_mvcc_scan",
             "q_date_extract"):
    df = qs[name](spark, "/root/testdata/sf0.001")
    rows = [[str(v) for v in r] for r in df.collect()]
    cols = sorted(df.columns)
    idx = [df.columns.index(c) for c in cols]
    out[name] = sorted([[row[i] for i in idx] for row in rows])
print("RESULT" + json.dumps(out))
"""


def test_queries_identical_under_foreign_timezone(spark):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, TZ="America/New_York")
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT, repo],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")][-1]
    foreign = json.loads(line[len("RESULT"):])

    import __spark_entry__ as e

    qs = e.queries()
    for name, fval in foreign.items():
        df = qs[name](spark, "/root/testdata/sf0.001")
        cols = sorted(df.columns)
        idx = [df.columns.index(c) for c in cols]
        rows = [[str(v) for v in r] for r in df.collect()]
        local = sorted([[row[i] for i in idx] for row in rows])
        assert local == fval, (
            f"{name}: foreign-timezone session diverged "
            f"(first local={local[:1]}, foreign={fval[:1]})"
        )
