"""Parquet table loaders for the driver's synthetic star schema.

The testdata writes timestamps as parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). With
``spark.sql.legacy.parquet.nanosAsLong=true`` those columns surface as
nanosecond longs; this loader converts them back to TimestampType
(microsecond precision, UTC — matching what DuckDB reports for the
same files), so every downstream query sees proper timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# ns-encoded timestamp columns per table (everything else is plain).
_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def _force_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC. NOTE: ``conf.get(key, "")``
    is NOT safe here — Spark 4 validates the supplied default against
    the conf's checker when the key is unset, and '' is an invalid
    timezone, so that call CRASHES on any session that never set the
    key explicitly (exactly the foreign-session case this guards)."""
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, min_parallelism: int | None = None
) -> DataFrame:
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Defensive for foreign sessions (e.g. a driver harness that did
    # not use matdb_spark.get_spark): timestamp extraction (year(),
    # casts) evaluates in the session timezone — anything but UTC
    # shifts results off the DuckDB oracle, which reads naive UTC.
    _force_utc(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    # A parquet file is splittable only at row-group boundaries; a
    # single-row-group file pins the whole scan (and everything up to
    # the first shuffle) to ONE task no matter how many cores exist.
    # Round-robin repartition restores parallelism; Catalyst still
    # pushes later filters/pruning through the exchange down to the
    # scan, so the shuffle carries post-pushdown rows only. Tiny dim
    # tables are left alone (they get broadcast anyway).
    import os as _os

    try:
        fsize = _os.path.getsize(path)
    except OSError:
        fsize = 0
    for c in _TS_COLS.get(name, []):
        if c not in df.columns:
            continue
        dt = dict(df.dtypes)[c]
        if dt == "bigint":
            # integer division: ns values (~1.7e18) exceed double's
            # 53-bit mantissa, so float division drifts by ±1 µs
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dt == "timestamp_ntz":
            # TIMESTAMP_NTZ parquet encoding: reinterpret the naive
            # wall-clock as UTC (session tz is pinned to UTC above) so
            # instant functions (unix_micros, window) apply and values
            # match DuckDB's naive read of the same file.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if fsize > 100 * 1024 and df.rdd.getNumPartitions() < target:
        # ts conversion above is applied BEFORE this exchange so later
        # filters on converted columns are pushed below the shuffle
        # (evaluated scan-side) instead of filtering post-shuffle.
        df = df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
