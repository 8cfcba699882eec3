"""Foreign-format sources: JSONL and ORC readers with explicit schemas.

The reference ingests exactly one foreign format (gzip TSV,
examples/sensor-log.rs:144-233). A Spark-native engine gets the rest
of the format zoo from the DataSource API — these helpers pin the two
disciplines that matter at 100 TB:

- ALWAYS pass an explicit schema. Schema inference reads the data
  twice (a full extra pass over JSON) and can silently widen types
  between runs; at scale it is both a 2x cost and a correctness
  hazard.
- JSONL and ORC are splittable as stored here (line-delimited text,
  ORC stripes), so parallelism comes from file splits — no
  repartition needed on real datasets.

The ``*_fixture`` builders materialize deterministic copies of the
driver's parquet testdata in the foreign format (build-once, marker
cached) so the gate can prove the read path against the same oracle
tables. Only exactly-representable columns are carried (strings,
longs; ORC carries binary doubles losslessly — JSON would print
decimal doubles, so the JSON fixture sticks to integers/strings).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from matdb_spark.sources.tables import load_table

_FIXTURE_VERSION = "v1"


def _build_once(path: str, build, version: str = _FIXTURE_VERSION) -> None:
    """Versioned build-once fixture: rebuild from scratch unless the
    version's marker file exists; the marker lands only after a
    successful ``build``, so a crashed build is retried cleanly. The
    single build-once mechanism for every cached fixture (format
    fixtures here, the MVCC gate stores in __spark_entry__) — bump the
    caller's version string whenever its recipe changes."""
    marker = os.path.join(path, f"._built_{version}")
    if os.path.exists(marker):
        return
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    build(path)
    with open(marker, "w") as f:
        f.write("ok")


def documents_jsonl_fixture(spark: SparkSession, sf_dir: str, scratch: str) -> str:
    """Materialize documents as line-delimited JSON (exact columns
    only: strings + longs)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(scratch, f"fixture_docs_jsonl_{tag}")

    def build(p: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars", "text"
        )
        docs.write.mode("overwrite").json(p)

    _build_once(out, build)
    return out


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(
        "doc_id bigint, lang string, source string, n_chars bigint, text string"
    ).json(path)


def lineitem_orc_fixture(spark: SparkSession, sf_dir: str, scratch: str) -> str:
    """Materialize a lineitem column subset as ORC (doubles are binary
    in ORC — lossless roundtrip)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(scratch, f"fixture_lineitem_orc_{tag}")

    def build(p: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
        )
        li.write.mode("overwrite").orc(p)

    _build_once(out, build)
    return out


def read_lineitem_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(
        "l_orderkey bigint, l_returnflag string, l_quantity double, "
        "l_extendedprice double, l_discount double"
    ).orc(path)


def lineitem_tsv_gz_fixture(spark: SparkSession, sf_dir: str, scratch: str) -> str:
    """Materialize a lineitem subset as gzip TSV — the reference's one
    foreign format (examples/sensor-log.rs:144-233: tab-separated
    lines, transparent gzip). Numeric columns only, so no quoting
    ambiguity; Java prints doubles in shortest-roundtrip form, so the
    text → double read is value-exact."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(scratch, f"fixture_lineitem_tsv_{tag}")

    def build(p: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        li.write.mode("overwrite").option("sep", "\t").option(
            "compression", "gzip"
        ).csv(p)

    _build_once(out, build)
    return out


def read_lineitem_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Gzip-TSV reader with explicit schema (gzip files are not
    splittable — at 100 TB the parallelism unit is the file, so ingest
    jobs should receive many moderate files rather than few huge ones,
    exactly like the reference's one-parser-thread-per-file design,
    sensor-log.rs:241-253)."""
    return (
        spark.read.option("sep", "\t")
        .schema(
            "l_orderkey bigint, l_partkey bigint, l_quantity double, "
            "l_extendedprice double"
        )
        .csv(path)
    )
