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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer division: ns values (~1.7e18) exceed double's
            # 53-bit mantissa, so float division drifts by ±1 µs
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
