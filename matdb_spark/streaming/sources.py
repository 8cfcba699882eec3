"""Streaming sources over the driver's parquet test tables.

A Structured Streaming file source needs an explicit schema; we take
it from a zero-cost batch read of the same path, then apply the same
nanosecond-timestamp normalization as ``sources.tables.load_table``
so batch and stream pipelines see identical column types.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from matdb_spark.sources.tables import _TS_COLS

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch"
)


def _as_stream_dir(path: str) -> str:
    """FileStreamSource requires a directory; for a single-file input,
    expose it through a scratch directory of symlinks (read-only view,
    no data copied)."""
    if not os.path.isfile(path):
        return path
    tag = hashlib.md5(path.encode()).hexdigest()[:10]
    d = os.path.join(_SCRATCH, "stream_src", f"{os.path.basename(path)}-{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    if not os.path.exists(link):
        os.symlink(path, link)
    return d


def parquet_stream(
    spark: SparkSession,
    path: str,
    ts_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a parquet path (file or directory glob).

    At scale this is the standing-ingest entry point: new files landing
    under ``path`` become micro-batches; ``maxFilesPerTrigger`` bounds
    batch size (and therefore per-batch state/shuffle footprint).
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # same foreign-session guard as sources.tables.load_table: window
    # starts/collected timestamps render in the session timezone
    # (_force_utc — conf.get with a '' default crashes on bare sessions)
    from matdb_spark.sources.tables import _force_utc, cached_schema

    _force_utc(spark)
    # same LRU schema cache as the batch loader (~80 ms of footer
    # inference per stream construction otherwise, paid by every
    # streaming gate twice per bench entry)
    schema = cached_schema(spark, path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(_as_stream_dir(path))
    for c in ts_cols or []:
        if c not in df.columns:
            continue
        dt = dict(df.dtypes)[c]
        if dt == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dt == "timestamp_ntz":
            # TIMESTAMP_NTZ encoding: naive wall-clock → UTC instant
            # (session tz pinned above), same as the batch loader.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events table as a stream (same shape as the batch loader)."""
    return parquet_stream(
        spark,
        f"{sf_dir}/events.parquet",
        ts_cols=_TS_COLS.get("events", []),
        max_files_per_trigger=max_files_per_trigger,
    )
