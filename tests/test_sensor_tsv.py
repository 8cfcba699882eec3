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
