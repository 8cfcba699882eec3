"""Driver-contract guards: registry consistency and storage claims."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from matdb_spark import Database, Dimension, Schema, Value

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def test_gate_registry_consistent():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    # every registered query has an oracle (the sketch queries use
    # tolerance-banded oracles: exact counts + in-band verdicts)
    assert set(o) <= set(q)
    # rows-only gates: genuinely non-SQL-expressible (the driver
    # records the weaker rows-only check for these, documented in each
    # query's docstring). Keep this list EXPLICIT so a missing oracle
    # is always a conscious decision, never an accident. EMPTY since
    # round 8: q_ann_recall_opq's oracle replays the probe from the
    # persisted _opq/codebook sidecars (training stays un-replayable,
    # the probe is deterministic given the sidecars).
    rows_only: set[str] = set()
    assert set(q) - set(o) == rows_only
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_segments_written_zstd(spark):
    """The storage layer's compression parity claim (reference uses
    zstd level 1, segment.rs:166): our segments must be zstd parquet."""
    import shutil

    path = os.path.join(SCRATCH, "zstd_check")
    shutil.rmtree(path, ignore_errors=True)
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("k", 10)], values=[Value("v")]
    ))
    t = db.begin()
    t.add_rows([[i, i] for i in range(100)])
    t.commit()
    files = glob.glob(os.path.join(path, "data", "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        meta = pq.ParquetFile(f).metadata
        codecs = {meta.row_group(i).column(0).compression for i in range(meta.num_row_groups)}
        assert codecs == {"ZSTD"}, f


def test_no_duplicate_registry_keys_in_source():
    """Python dict literals accept duplicate keys silently (later
    wins) — a re-added query would shadow the original and shrink the
    effective registry without any error. Scan the source statically."""
    import collections
    import re

    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    with open(src) as f:
        text = f.read()
    # no trailing-comma requirement: a duplicate added as the dict's
    # LAST entry must still be caught
    reg = re.findall(r'"(q[0-9a-zA-Z_]+)":\s*q[0-9a-zA-Z_]', text)
    dup_reg = [n for n, c in collections.Counter(reg).items() if c > 1]
    assert dup_reg == [], f"duplicate queries() keys: {dup_reg}"
    orc = re.findall(r'"(q[0-9a-zA-Z_]+)":\s*f?"""', text)
    dup_orc = [n for n, c in collections.Counter(orc).items() if c > 1]
    assert dup_orc == [], f"duplicate oracle_sql() keys: {dup_orc}"


def test_banded_sketch_gates_have_teeth(spark):
    """The tolerance bands must actually fail on a bad estimate: a
    deliberately coarse sketch (accuracy=1 approx_percentile over a
    wide-spread skewed distribution) must flip the in-band verdict to
    False — proving the gate detects broken estimators rather than
    passing vacuously."""
    from pyspark.sql import functions as F

    # long-tailed: p50 of [0..999] ~ 500 but a coarse GK sketch with
    # accuracy=1 collapses to a handful of retained samples
    df = spark.range(100_000).select(
        (F.col("id") % 1000).cast("double").alias("x")
    )
    row = df.agg(
        F.percentile(F.col("x"), F.lit(0.5)).alias("exact"),
        F.percentile_approx(F.col("x"), F.lit(0.5), F.lit(1)).alias("coarse"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    ).first()
    in_band = abs(row["coarse"] - row["exact"]) <= 0.02 * (row["hi"] - row["lo"])
    assert not in_band, (
        f"coarse sketch unexpectedly in band: exact={row['exact']} "
        f"coarse={row['coarse']}"
    )
    # and the production setting (accuracy=10000) is comfortably inside
    row2 = df.agg(
        F.percentile(F.col("x"), F.lit(0.5)).alias("exact"),
        F.percentile_approx(F.col("x"), F.lit(0.5), F.lit(10000)).alias("good"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    ).first()
    assert abs(row2["good"] - row2["exact"]) <= 0.02 * (row2["hi"] - row2["lo"])


def test_plan_budget_covers_every_query():
    """PLAN_BUDGET.json (tools/plan_budget.py) must stay in lockstep
    with queries(): every gated query has a recorded plan-shape
    budget with the enforced keys. The expensive live --check runs
    per round as a tool; this contract keeps the snapshot from
    silently going stale when queries are added."""
    import json
    import os

    import __spark_entry__ as entrymod

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_BUDGET.json")
    with open(path) as f:
        budget = json.load(f)
    qs = set(entrymod.queries())
    # keys starting with "_" are file metadata (e.g. "_convention",
    # the node-counting convention note), not query budgets
    recorded = {k for k in budget if not k.startswith("_")}
    assert recorded == qs, (
        f"missing budgets: {sorted(qs - recorded)}; "
        f"stale budgets: {sorted(recorded - qs)} — run tools/plan_budget.py --update"
    )
    for name, s in budget.items():
        if name.startswith("_"):
            continue
        assert {"exchanges", "scans", "broadcast_joins", "shuffle_joins"} <= set(s), name
