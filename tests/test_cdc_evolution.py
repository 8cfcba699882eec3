"""CDC schema evolution (r6 verdict item 7): the DSv2 write-side
``evolve`` option and the cross-restart replication contract.

The full roundtrip (source grows a column mid-stream, replica
hash-matches the evolved source) is the driver-gated
q_cdc_schema_evolution; these tests hold the sharp edges:
- strict default: extra DataFrame columns RAISE, with the evolve
  option named in the error;
- evolve=true: extra columns are added to the store as value columns
  (epoch bump), then the write proceeds; old rows read the new column
  as NULL;
- missing store columns raise even under evolve (a write may not
  silently drop promised columns);
- non-evolvable Spark types are rejected with a diagnostic.
"""

import pytest
from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.sources.dsv2 import register_matdb_source


def _mk(spark, path):
    return Database.create(
        spark,
        path,
        Schema(dimensions=[Dimension("k", 100)], values=[Value("v")]),
    )


def test_strict_default_raises_and_names_the_option(spark, tmp_db_path):
    register_matdb_source(spark)
    _mk(spark, tmp_db_path)
    df = spark.createDataFrame([(1, 10, 0.5)], "k long, v long, score double")
    with pytest.raises(Exception, match="evolve"):
        df.write.format("matdb").mode("append").save(tmp_db_path)


def test_evolve_adds_value_column_and_old_rows_read_null(spark, tmp_db_path):
    register_matdb_source(spark)
    db = _mk(spark, tmp_db_path)
    t = db.begin()
    t.add_row([1, 10])
    t.commit()
    df = spark.createDataFrame([(2, 20, 0.5)], "k long, v long, score double")
    (
        df.write.format("matdb")
        .mode("append")
        .option("evolve", "true")
        .save(tmp_db_path)
    )
    db2 = Database.open(spark, tmp_db_path)
    assert [v.name for v in db2.schema.values] == ["v", "score"]
    assert db2.schema.epoch == 1
    rows = {
        (r["k"], r["v"], r["score"])
        for r in db2.begin().query().collect()
    }
    assert rows == {(1, 10, None), (2, 20, 0.5)}


def test_evolve_never_drops_missing_columns(spark, tmp_db_path):
    register_matdb_source(spark)
    _mk(spark, tmp_db_path)
    df = spark.createDataFrame([(1,)], "k long")  # missing v
    with pytest.raises(Exception, match="schema mismatch"):
        (
            df.write.format("matdb")
            .mode("append")
            .option("evolve", "true")
            .save(tmp_db_path)
        )


def test_evolve_rejects_unsupported_types(spark, tmp_db_path):
    register_matdb_source(spark)
    _mk(spark, tmp_db_path)
    df = spark.createDataFrame(
        [(1, 10, [1.0])], "k long, v long, emb array<double>"
    )
    with pytest.raises(Exception, match="cannot evolve"):
        (
            df.write.format("matdb")
            .mode("append")
            .option("evolve", "true")
            .save(tmp_db_path)
        )


def test_cdc_reader_surfaces_new_column_after_restart(spark, tmp_db_path):
    """Old-window segments read the evolved column as NULL through the
    CDC source (Arrow schema unification), new-window segments carry
    it — the read half of the roundtrip gate."""
    import os
    import shutil

    register_matdb_source(spark)
    db = _mk(spark, tmp_db_path + "/src")
    t = db.begin()
    t.add_row([1, 10])
    t.commit()
    db.add_value_column("score", "double")
    t2 = db.begin()
    t2.add_row([2, 20, 2.5])
    t2.commit()
    ckpt = tmp_db_path + "/ckpt"
    name = "cdc_evo_read_probe"
    q = (
        spark.readStream.format("matdb")
        .option("feed", "changes")
        .option("since", 0)
        .load(tmp_db_path + "/src")
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        (r["k"], r["v"], r["score"], r["change_type"])
        for r in spark.table(name).collect()
    }
    assert rows == {(1, 10, None, "upsert"), (2, 20, 2.5, "upsert")}
