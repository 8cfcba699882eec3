"""DataSource V2 surface (matdb_spark/sources/dsv2.py): the MVCC
snapshot through ``spark.read.format("matdb")`` must match the library
scan bit-for-bit, honor time travel, prune partitions from pushed
filters, and handle evolution/compaction/unchunked layouts."""

import os

import pytest
from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.sources.dsv2 import (
    MatdbSnapshotReader,
    register_matdb_source,
)


@pytest.fixture(scope="module")
def dsv2_db(spark, tmp_path_factory):
    register_matdb_source(spark)
    p = str(tmp_path_factory.mktemp("dsv2") / "db")
    schema = Schema(
        dimensions=[Dimension("k", 10), Dimension("j", 0)],
        values=[Value("v", type="double"), Value("w")],
    )
    db = Database.create(spark, p, schema)
    t1 = db.begin()
    t1.add_rows([(i, i % 3, float(i), i * 10) for i in range(50)])
    t1.commit()
    t2 = db.begin()
    t2.add_rows([(i, i % 3, float(i) + 1000.0, None) for i in range(0, 50, 5)])
    t2.commit()
    t3 = db.begin()
    t3.delete_row([7, 1])
    t3.commit()
    return db, p


def _key(df):
    return sorted(tuple(r) for r in df.collect())


def test_dsv2_matches_library_scan(spark, dsv2_db):
    db, p = dsv2_db
    lib = _key(db.begin().query(ordered=False))
    got = _key(spark.read.format("matdb").load(p))
    assert got == lib
    assert len(got) == 49  # 50 rows, one tombstoned


def test_dsv2_time_travel(spark, dsv2_db):
    db, p = dsv2_db
    for as_of in (1, 2):
        got = _key(spark.read.format("matdb").option("as_of", as_of).load(p))
        lib = _key(db.begin(as_of=as_of).query(ordered=False))
        assert got == lib
    with pytest.raises(Exception, match="future"):
        spark.read.format("matdb").option("as_of", 99).load(p).collect()


def test_dsv2_filter_matches_range_scan(spark, dsv2_db):
    db, p = dsv2_db
    got = _key(
        spark.read.format("matdb")
        .load(p)
        .filter((F.col("k") >= 20) & (F.col("k") <= 29))
    )
    lib = _key(db.begin().query_range({"k": (20, 29)}, ordered=False))
    assert got == lib and len(got) == 10


def test_dsv2_pushed_filters_prune_partitions(spark, dsv2_db):
    _, p = dsv2_db
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThanOrEqual

    r = MatdbSnapshotReader(p, None)
    all_parts = r.partitions()
    r2 = MatdbSnapshotReader(p, None)
    r2.pushFilters([GreaterThanOrEqual(("k",), 20), LessThanOrEqual(("k",), 29)])
    pruned = r2.partitions()
    # k chunk_size=10 -> bounds hit exactly chunk 2 of 5
    assert len(pruned) < len(all_parts)
    assert all(
        any("__chunk_k=2" in f for f, _ in part.files) for part in pruned
    )
    r3 = MatdbSnapshotReader(p, None)
    r3.pushFilters([EqualTo(("k",), 7)])
    assert len(r3.partitions()) == 1
    # filters are all returned for Spark re-application
    r4 = MatdbSnapshotReader(p, None)
    fs = [EqualTo(("k",), 7), EqualTo(("v",), 7.0)]
    assert list(r4.pushFilters(fs)) == fs


def test_dsv2_compacted_store_parallel_per_file(spark, tmp_path_factory):
    register_matdb_source(spark)
    p = str(tmp_path_factory.mktemp("dsv2c") / "db")
    schema = Schema(
        dimensions=[Dimension("k", 10)], values=[Value("v", type="double")]
    )
    db = Database.create(spark, p, schema)
    t1 = db.begin()
    t1.add_rows([(i, float(i)) for i in range(40)])
    t1.commit()
    t2 = db.begin()
    t2.add_rows([(i, float(i) + 100.0) for i in range(0, 40, 4)])
    t2.commit()
    lib = _key(db.begin().query(ordered=False))
    assert db.compact() is not None
    db.vacuum()
    got = _key(spark.read.format("matdb").load(p))
    assert got == lib
    r = MatdbSnapshotReader(p, None)
    parts = r.partitions()
    assert all(pt.dedup_free and len(pt.files) == 1 for pt in parts)


def test_dsv2_schema_evolution_nulls(spark, tmp_path_factory):
    register_matdb_source(spark)
    p = str(tmp_path_factory.mktemp("dsv2e") / "db")
    schema = Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    db = Database.create(spark, p, schema)
    t1 = db.begin()
    t1.add_rows([(i, i * 2) for i in range(10)])
    t1.commit()
    db.add_value_column("extra", type="double")
    db2 = Database.open(spark, p)
    t2 = db2.begin()
    t2.add_rows([(10, 20, 3.5)])
    t2.commit()
    got = {r["k"]: (r["v"], r["extra"]) for r in
           spark.read.format("matdb").load(p).collect()}
    assert got[10] == (20, 3.5)
    assert got[3] == (6, None)  # pre-evolution file reads typed null
    lib = _key(db2.begin().query(ordered=False))
    assert _key(spark.read.format("matdb").load(p)) == lib


def test_dsv2_unchunked_schema_single_partition(spark, tmp_path_factory):
    register_matdb_source(spark)
    p = str(tmp_path_factory.mktemp("dsv2u") / "db")
    schema = Schema(dimensions=[Dimension("k", 0)], values=[Value("v")])
    db = Database.create(spark, p, schema)
    t1 = db.begin()
    t1.add_rows([(i, i) for i in range(10)])
    t1.commit()
    t2 = db.begin()
    t2.add_rows([(3, 999)])
    t2.commit()
    r = MatdbSnapshotReader(p, None)
    assert len(r.partitions()) == 1  # no chunk axis: global resolution
    got = {r2["k"]: r2["v"] for r2 in spark.read.format("matdb").load(p).collect()}
    assert got[3] == 999 and len(got) == 10


def test_dsv2_empty_store(spark, tmp_path_factory):
    register_matdb_source(spark)
    p = str(tmp_path_factory.mktemp("dsv2z") / "db")
    Database.create(
        spark, p, Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    )
    df = spark.read.format("matdb").load(p)
    assert df.count() == 0
    assert df.columns == ["k", "v"]


def test_dsv2_sql_over_catalog_view(spark, dsv2_db):
    db, p = dsv2_db
    register_matdb_source(spark)
    spark.read.format("matdb").load(p).createOrReplaceTempView("dsv2_t")
    n = spark.sql("SELECT count(*) AS n FROM dsv2_t WHERE k >= 20").collect()[0]["n"]
    assert n == 30
