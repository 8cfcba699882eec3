"""Sensor TSV ingest tests: format/gzip parity, skip-unparsable,
dictionary stability across loads, CLI-equivalent count/list."""

from __future__ import annotations

import gzip
import os
import shutil

from pyspark.sql import functions as F

from matdb_spark.database import Database
from matdb_spark.sources import sensor_tsv

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

LINES_A = [
    "14/02/2023 3:05:09 p.m.\tboiler\ttemp\tcelsius\t21.5",
    "14/02/2023 3:05:09 p.m.\tboiler\tpressure\tbar\t1.013",
    "14/02/2023 3:05:10 a.m.\tpump\ttemp\tcelsius\t",
    "garbage line without tabs",
    "15/02/2023 11:59:59 p.m.\tboiler\ttemp\tcelsius\t-3.25",
]
LINES_B = [
    "16/02/2023 1:00:00 a.m.\tboiler\ttemp\tcelsius\t30.001",
    "16/02/2023 1:00:01 a.m.\tnew_unit\tflow\tlpm\t5.5",
]


def _fresh(name: str) -> str:
    p = os.path.join(SCRATCH, name)
    shutil.rmtree(p, ignore_errors=True)
    os.makedirs(p, exist_ok=True)
    return p


def test_load_list_count_roundtrip(spark):
    d = _fresh("sensor_ingest")
    tsv = os.path.join(d, "a.tsv")
    with open(tsv, "w") as f:
        f.write("\n".join(LINES_A) + "\n")
    gz = os.path.join(d, "b.tsv.gz")
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(LINES_B) + "\n")

    db_path = os.path.join(d, "db")
    n1 = sensor_tsv.load(spark, db_path, [tsv])
    assert n1 == 4  # garbage line skipped; empty value kept as 0

    # dictionary: 3 sensors so far, deterministic ids from 1
    dim1 = sensor_tsv.load_sensors_dim(spark, db_path)
    ids1 = {tuple(r[k] for k in ("component", "sensor", "kind")): r["sensor_id"]
            for r in dim1.collect()}
    assert len(ids1) == 3 and set(ids1.values()) == {1, 2, 3}

    # second load (gzip): existing ids stable, new sensor appended
    n2 = sensor_tsv.load(spark, db_path, [gz])
    assert n2 == 2
    dim2 = sensor_tsv.load_sensors_dim(spark, db_path)
    ids2 = {tuple(r[k] for k in ("component", "sensor", "kind")): r["sensor_id"]
            for r in dim2.collect()}
    assert all(ids2[k] == v for k, v in ids1.items())
    assert len(ids2) == 4

    # count across both committed transactions
    db = Database.open(spark, db_path)
    scan = db.begin().query(ordered=True)
    assert scan.count() == 6

    # value encoding: ×1000 fixed point, truncation toward zero.
    # 1.013*1000 == 1012.999…, truncating to 1012 — exactly what the
    # reference's `(num * 1000f64) as usize` yields for the same input
    rows = scan.collect()
    values = {r["value"] for r in rows}
    assert {21500, 1012, 0, 30001} <= values
    # times ascend (ordered scan contract)
    times = [r["time"] for r in rows]
    assert times == sorted(times)


def test_fixed_point_and_time_encoding(spark):
    df = spark.createDataFrame([("14/02/2023 3:05:09 p.m.", "9.999")], "t string, v string")
    from matdb_spark.functions.encoders import fixed_point_encode, parse_sensor_time

    row = df.select(
        parse_sensor_time(F.col("t")).alias("ms"), fixed_point_encode(F.col("v")).alias("fp")
    ).first()
    # 2023-02-14T15:05:09Z
    assert row["ms"] == 1676387109000
    assert row["fp"] == 9999


def test_dictionary_encode_distributed_1m_keys(spark):
    """ADVICE/VERDICT r2: dictionary id assignment must be
    distributed — 1M distinct keys numbered without a driver collect
    or a single-task global window, deterministically in sorted key
    order, and continuation from an existing dictionary keeps old ids
    stable."""
    from pyspark.sql import Window
    from matdb_spark.functions.encoders import dictionary_encode

    n = 1_000_000
    keys = spark.range(n).select(
        F.concat(F.lit("c"), F.format_string("%07d", F.col("id"))).alias("component"),
        (F.col("id") % 13).cast("string").alias("sensor"),
        F.lit("kind0").alias("kind"),
    )
    dim = dictionary_encode(keys, ["component", "sensor", "kind"], id_col="sensor_id")
    stats = dim.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("sensor_id").alias("nd"),
        F.min("sensor_id").alias("lo"),
        F.max("sensor_id").alias("hi"),
    ).first()
    assert (stats["n"], stats["nd"], stats["lo"], stats["hi"]) == (n, n, 1, n)
    # ids follow sorted key order: ranking by key must equal the id
    # (window here is test-side verification only)
    w = Window.orderBy("component", "sensor", "kind")
    bad = (
        dim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") != F.col("sensor_id"))
        .count()
    )
    assert bad == 0

    # continuation: re-encode a superset — existing ids must not move
    extra = spark.range(5).select(
        F.concat(F.lit("zzz"), F.col("id").cast("string")).alias("component"),
        F.lit("s").alias("sensor"),
        F.lit("kind0").alias("kind"),
    )
    dim2 = dictionary_encode(
        keys.unionByName(extra),
        ["component", "sensor", "kind"],
        existing=dim,
        id_col="sensor_id",
    )
    assert dim2.count() == n + 5
    assert dim2.agg(F.max("sensor_id")).first()[0] == n + 5
    moved = (
        dim2.join(dim.withColumnRenamed("sensor_id", "old_id"),
                  ["component", "sensor", "kind"])
        .filter(F.col("sensor_id") != F.col("old_id"))
        .count()
    )
    assert moved == 0


def test_sensor_cli_end_to_end(tmp_path):
    """Reference CLI parity (sensor-log.rs:307-353): load | count |
    list as real subprocess invocations of the module entry point."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, SPARK_GRAFT_CPUS="4")
    tsv = tmp_path / "cli.tsv"
    tsv.write_text("\n".join(LINES_A) + "\n")
    db_dir = str(tmp_path / "clidb")

    def run(*args):
        r = subprocess.run(
            [_sys.executable, "-m", "matdb_spark.sources.sensor_tsv", *args],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    out = run("load", db_dir, str(tsv))
    assert "Loaded 4 rows" in out
    assert run("count", db_dir).strip().splitlines()[-1] == "4"
    listing = [l for l in run("list", db_dir).splitlines() if l and l[0].isdigit()]
    assert len(listing) == 4
    # time sensor_id value triplets, times ascending
    times = [int(l.split()[0]) for l in listing]
    assert times == sorted(times)


def test_dictionary_swap_crash_recovery(spark):
    """A crash between rename-aside and rename-in leaves NO dictionary
    at the final path; _recover_dims must restore the .old (last
    published) state so ids never restart from 1 (restart would
    silently cross-wire sensor_ids of previously committed facts)."""
    d = _fresh("sensor_crashdim")
    tsv = os.path.join(d, "a.tsv")
    with open(tsv, "w") as f:
        f.write("\n".join(LINES_A) + "\n")
    db_path = os.path.join(d, "db")
    sensor_tsv.load(spark, db_path, [tsv])
    dim_path = sensor_tsv._sensors_dim_path(db_path)
    ids_before = {
        tuple(r[k] for k in ("component", "sensor", "kind")): r["sensor_id"]
        for r in sensor_tsv.load_sensors_dim(spark, db_path).collect()
    }

    # simulate the crash window: published dict moved aside, tmp never
    # renamed in
    os.rename(dim_path, dim_path + ".old")
    dim = sensor_tsv.load_sensors_dim(spark, db_path)
    assert dim is not None, "recovery failed to restore the .old dictionary"
    ids_after = {
        tuple(r[k] for k in ("component", "sensor", "kind")): r["sensor_id"]
        for r in dim.collect()
    }
    assert ids_after == ids_before
    assert not os.path.exists(dim_path + ".old")

    # a follow-up load keeps ids stable and appends new keys above max
    gz = os.path.join(d, "b.tsv")
    with open(gz, "w") as f:
        f.write("\n".join(LINES_B) + "\n")
    sensor_tsv.load(spark, db_path, [gz])
    ids2 = {
        tuple(r[k] for k in ("component", "sensor", "kind")): r["sensor_id"]
        for r in sensor_tsv.load_sensors_dim(spark, db_path).collect()
    }
    assert all(ids2[k] == v for k, v in ids_before.items())
    assert len(ids2) == len(ids_before) + 1
