"""Sensor-log TSV ingest — parity with the reference example ETL
(examples/sensor-log.rs), rebuilt as a distributed pipeline:

- O18 TSV source w/ decompression (sensor-log.rs:144-233): Spark's csv
  reader handles tab separation, transparent gzip, and glob expansion
  natively, parallelized by file split instead of parser threads.
- O19 timestamp parse (:123-128) and O20 fixed-point encode (:130-136):
  JVM column expressions (functions/encoders.py).
- O21 dictionary encoding (:19-105): the (component, sensor, kind) →
  sensor_id mapping is a parquet dimension table under the database
  directory, extended on each load (ids allocated on first sight) and
  broadcast-joined into the fact stream — the big side never shuffles.
- O22 parallel ingest (:241-305): parser threads → channel → writer
  becomes parallel read tasks + one distributed segment write per
  transaction commit.

Reference schema parity (sensor-log.rs:110-120): dimensions time
(chunk = 24h of millis) and sensor_id (chunk 100), one value column;
values are ×1000 fixed-point longs; unparsable lines are skipped
(:199-204).

CLI (mirrors :307-353):
    python -m matdb_spark.sources.sensor_tsv load <db_dir> <tsv...>
    python -m matdb_spark.sources.sensor_tsv list <db_dir>
    python -m matdb_spark.sources.sensor_tsv count <db_dir>
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from matdb_spark.database import Database
from matdb_spark.schema import Dimension, Schema, Value
from matdb_spark.functions.encoders import (
    dictionary_encode,
    fixed_point_encode,
    parse_sensor_time,
)

DAY_MS = 24 * 60 * 60 * 1000

RAW_SCHEMA = StructType(
    [
        StructField("time_str", StringType()),
        StructField("component", StringType()),
        StructField("sensor", StringType()),
        StructField("kind", StringType()),
        StructField("value_str", StringType()),
    ]
)


def sensor_schema() -> Schema:
    """The reference example's database schema (sensor-log.rs:110-120)."""
    return Schema(
        dimensions=[Dimension("time", DAY_MS), Dimension("sensor_id", 100)],
        values=[Value("value")],
    )


def open_or_create(spark: SparkSession, db_path: str) -> Database:
    if os.path.exists(os.path.join(db_path, "schema.json")):
        return Database.open(spark, db_path)
    return Database.create(spark, db_path, sensor_schema())


def read_sensor_tsv(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Raw 5-column TSV relation (gzip + glob handled by the source)."""
    return spark.read.options(sep="\t", mode="PERMISSIVE").schema(RAW_SCHEMA).csv(paths)


def _sensors_dim_path(db_path: str) -> str:
    return os.path.join(db_path, "_dims", "sensors")


def load_sensors_dim(spark: SparkSession, db_path: str) -> DataFrame | None:
    """Existing dictionary, or None on first load (sensors.json analog)."""
    p = _sensors_dim_path(db_path)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)


def encode_sensor_rows(
    raw: DataFrame, sensors_dim: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """(fact rows [time, sensor_id, value], updated dictionary).

    Skips rows whose timestamp fails to parse, like the reference's
    per-line error path; an empty/invalid value encodes as 0."""
    keys = ["component", "sensor", "kind"]
    # malformed (<5 field) lines surface as NULL columns — drop them
    # before they pollute the dictionary (reference: skip bad lines)
    ok = raw.filter(
        F.col("component").isNotNull() & F.col("sensor").isNotNull() & F.col("kind").isNotNull()
    )
    dim_lazy = dictionary_encode(ok, keys, existing=sensors_dim, id_col="sensor_id")
    # Materialize the dictionary on the driver (it is small by contract
    # — it gets broadcast — and the reference holds it in memory as
    # sensors.json). This also breaks the lazy-plan dependency on the
    # previous on-disk dictionary, which load() is about to overwrite.
    dim = raw.sparkSession.createDataFrame(dim_lazy.collect(), dim_lazy.schema)
    parsed = ok.withColumn("time", parse_sensor_time(F.col("time_str"))).withColumn(
        "value", fixed_point_encode(F.col("value_str"))
    )
    parsed = parsed.filter(F.col("time").isNotNull())
    facts = parsed.join(F.broadcast(dim), keys).select("time", "sensor_id", "value")
    return facts, dim


def load(spark: SparkSession, db_path: str, paths: list[str]) -> int:
    """Ingest files as ONE transaction (the reference uses one txn with
    periodic flushes; Spark's distributed write replaces the flush
    cadence). Returns the ingested row count."""
    db = open_or_create(spark, db_path)
    raw = read_sensor_tsv(spark, paths)
    sensors = load_sensors_dim(spark, db_path)
    facts, dim = encode_sensor_rows(raw, sensors)
    # persist dictionary first (small; overwrite is idempotent) —
    # write to temp then swap would make this atomic on object stores
    dim_out = _sensors_dim_path(db_path)
    dim.coalesce(1).write.mode("overwrite").parquet(dim_out)
    txn = db.begin()
    txn.add_dataframe(facts)
    # row count from the written segment's parquet footers — counting
    # the *input* DataFrame would re-run the whole decompress + parse +
    # dictionary-join pipeline a second time (gzip TSV is
    # non-splittable; the re-read doubled ingest wall-clock)
    stats = txn._txn_stats
    n = stats["rows"] if stats else facts.count()
    txn.commit()
    return n


def main(argv: list[str]) -> int:
    from matdb_spark.session import get_spark

    if len(argv) < 2:
        print(__doc__)
        return 2
    cmd, db_path, files = argv[0], argv[1], argv[2:]
    spark = get_spark(app_name="sensor_tsv")
    if cmd == "load":
        n = load(spark, db_path, files)
        print(f"Loaded {n} rows")
    elif cmd == "count":
        print(Database.open(spark, db_path).begin().query(ordered=False).count())
    elif cmd == "list":
        for row in Database.open(spark, db_path).begin().query_rows():
            print(row["time"], row["sensor_id"], row["value"])
    else:
        print(f"unknown command {cmd}")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
