"""Bucketed tables: co-located joins without shuffles.

The single biggest repeated cost in a 100 TB star-schema workload is
re-shuffling the fact tables on the join key for every query. Spark's
answer is bucketing: write both sides hash-partitioned (and sorted)
by the key into N buckets; every later equi-join on that key becomes
a zero-exchange (and with sortBy, zero-sort) sort-merge join — the
shuffle is paid once at write time, amortized over every query.

This module is the thin write-side discipline; the read side is just
``spark.table``. tests/test_plans.py asserts the join plan really has
no Exchange under it.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) managed parquet table.

    ``num_buckets`` sizing at scale: total_size / num_buckets should be
    a healthy task input (~128-512 MB); both join sides MUST use the
    same bucket count and columns for the exchange-free plan.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # drop + clear the managed location ONLY when overwriting; an
        # unconditional drop would silently destroy existing data under
        # mode='append'. The location may survive a previous session
        # whose in-memory catalog entry is gone — clear it, or
        # saveAsTable refuses with LOCATION_ALREADY_EXISTS.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
        parts = table.split(".")
        if len(parts) >= 2:
            # database-qualified: managed location is <wh>/<db>.db/<name>
            stale = os.path.join(wh, parts[-2] + ".db", parts[-1])
        else:
            stale = os.path.join(wh, parts[-1])
        if os.path.isdir(stale):
            shutil.rmtree(stale, ignore_errors=True)
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata flows into planning)."""
    return spark.table(table)
