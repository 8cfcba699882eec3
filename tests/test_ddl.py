"""SQL DDL for matdb stores (matdb_spark/ddl.py) — r6 verdict item 4.

Two halves:
- PIN the native limitation: ``spark.sql("CREATE TABLE ... USING
  matdb")`` parses (the session catalog accepts any provider name) but
  the first read fails because Spark 4.1's Python Data Source API does
  not forward table OPTIONS/LOCATION to the reader. The test asserts
  the failure AND that the error message auto-suggests the shim — if a
  Spark upgrade starts forwarding options, this test fails loudly and
  the shim can be retired.
- The shim itself: matdb_spark.ddl.sql / execute_ddl implement the
  documented CREATE/DROP dialect against real stores + catalog views.
"""

import os

import pytest
from pyspark.sql import functions as F

from matdb_spark import Database, ddl
from matdb_spark.sources.dsv2 import register_matdb_source


def _create_stmt(name, loc, cols="k BIGINT, v BIGINT", chunks="k=10", ine=""):
    return (
        f"CREATE TABLE {ine}{name} ({cols}) USING matdb "
        f"LOCATION '{loc}' TBLPROPERTIES ('chunks' = '{chunks}')"
    )


def test_native_spark_sql_ddl_limitation_pinned(spark, tmp_db_path):
    register_matdb_source(spark)
    spark.sql("DROP TABLE IF EXISTS ddl_native_probe")
    spark.sql(
        f"CREATE TABLE ddl_native_probe (k BIGINT, v BIGINT) USING matdb "
        f"LOCATION '{tmp_db_path}/native'"
    )
    try:
        with pytest.raises(Exception) as ei:
            spark.sql("SELECT * FROM ddl_native_probe").collect()
        msg = str(ei.value)
        assert "does not forward table OPTIONS/LOCATION" in msg
        assert "matdb_spark.ddl.sql" in msg  # the auto-suggested shim
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_native_probe")


def test_create_fresh_store_and_query(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "s1")
    df = ddl.execute_ddl(spark, _create_stmt("ddl_t1", loc))
    assert df.columns == ["k", "v"]
    assert spark.sql("SELECT COUNT(*) AS n FROM ddl_t1").first()["n"] == 0
    # write through the engine, refresh the pinned view, SQL sees rows
    db = Database.open(spark, loc)
    t = db.begin()
    t.add_rows([[i, i * 2] for i in range(7)])
    t.commit()
    from matdb_spark.catalog import refresh_store

    refresh_store(spark, "ddl_t1", loc)
    row = spark.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM ddl_t1").first()
    assert (row["n"], row["s"]) == (7, 42)
    ddl.execute_ddl(spark, "DROP TABLE ddl_t1")


def test_if_not_exists_opens_and_validates(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "s2")
    ddl.execute_ddl(spark, _create_stmt("ddl_t2", loc))
    db = Database.open(spark, loc)
    t = db.begin()
    t.add_row([1, 10])
    t.commit()
    # plain CREATE on an existing store is an error
    with pytest.raises(ValueError, match="already exists"):
        ddl.execute_ddl(spark, _create_stmt("ddl_t2b", loc))
    # IF NOT EXISTS opens + registers, and sees the committed data
    df = ddl.execute_ddl(
        spark, _create_stmt("ddl_t2b", loc, ine="IF NOT EXISTS ")
    )
    assert df.count() == 1
    # ...but declared columns must match the persisted schema
    with pytest.raises(ValueError, match="do not match"):
        ddl.execute_ddl(
            spark,
            _create_stmt(
                "ddl_t2c", loc, cols="k BIGINT, w BIGINT", ine="IF NOT EXISTS "
            ),
        )
    ddl.execute_ddl(spark, "DROP TABLE ddl_t2")
    ddl.execute_ddl(spark, "DROP TABLE ddl_t2b")


def test_dialect_errors(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "s3")
    with pytest.raises(ValueError, match="chunks"):
        ddl.execute_ddl(
            spark,
            f"CREATE TABLE ddl_t3 (k BIGINT, v BIGINT) USING matdb LOCATION '{loc}'",
        )
    with pytest.raises(ValueError, match="unsupported column type"):
        ddl.execute_ddl(
            spark, _create_stmt("ddl_t3", loc, cols="k BIGINT, v UUID")
        )
    with pytest.raises(ValueError, match="not a declared column"):
        ddl.execute_ddl(
            spark, _create_stmt("ddl_t3", loc, chunks="zz=10")
        )
    with pytest.raises(ValueError, match="value"):
        ddl.execute_ddl(
            spark, _create_stmt("ddl_t3", loc, cols="k BIGINT", chunks="k=10")
        )
    with pytest.raises(ValueError, match="unknown matdb table"):
        ddl.execute_ddl(spark, "DROP TABLE never_created_xyz")
    assert ddl.execute_ddl(spark, "DROP TABLE IF EXISTS never_created_xyz") is None
    # ALTER/TRUNCATE joined the dialect in r8 — they now fail with
    # "unknown matdb table"; CLUSTER BY stays genuinely unrecognized
    with pytest.raises(ValueError, match="unknown matdb table"):
        ddl.execute_ddl(spark, "ALTER TABLE foo ADD COLUMN x INT")
    with pytest.raises(ValueError, match="unknown matdb table"):
        ddl.execute_ddl(spark, "TRUNCATE TABLE foo")
    with pytest.raises(ValueError, match="unrecognized matdb DDL"):
        ddl.execute_ddl(spark, "CLUSTER my_table BY (k)")


def test_sql_front_end_routes_and_passes_through(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "s4")
    ddl.sql(
        spark,
        _create_stmt("ddl_t4", loc, cols="k BIGINT, v DOUBLE", chunks="k=100"),
    )
    db = Database.open(spark, loc)
    t = db.begin()
    t.add_rows([[i, float(i)] for i in range(5)])
    t.commit()
    from matdb_spark.catalog import refresh_store

    refresh_store(spark, "ddl_t4", loc)
    # non-DDL statements pass through to spark.sql untouched
    row = ddl.sql(spark, "SELECT SUM(v) AS s FROM ddl_t4").first()
    assert row["s"] == 10.0
    # DROP routes to the shim for shim-registered names
    ddl.sql(spark, "DROP TABLE ddl_t4")
    assert "ddl_t4" not in [v.name for v in spark.catalog.listTables()]


def test_typed_columns_roundtrip(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "s5")
    ddl.execute_ddl(
        spark,
        _create_stmt(
            "ddl_t5",
            loc,
            cols="t BIGINT, s INT, label STRING, x DOUBLE",
            chunks="t=100,s=10",
        ),
    )
    db = Database.open(spark, loc)
    txn = db.begin()
    txn.add_row([5, 1, "a", 1.5])
    txn.add_row([6, 2, "b", 2.5])
    txn.commit()
    from matdb_spark.catalog import refresh_store

    refresh_store(spark, "ddl_t5", loc)
    rows = {
        tuple(r)
        for r in spark.sql("SELECT t, s, label, x FROM ddl_t5").collect()
    }
    assert rows == {(5, 1, "a", 1.5), (6, 2, "b", 2.5)}
    ddl.execute_ddl(spark, "DROP TABLE ddl_t5")


def test_maintenance_statements(spark, tmp_db_path):
    """DESCRIBE HISTORY / OPTIMIZE / VACUUM through the DDL dialect:
    the full table-maintenance lifecycle a warehouse user runs."""
    loc = os.path.join(tmp_db_path, "s6")
    ddl.sql(spark, _create_stmt("ddl_t6", loc))
    db = Database.open(spark, loc)
    for i in range(3):
        t = db.begin()
        t.add_row([i, i * 10])
        t.commit()
    hist = ddl.sql(spark, "DESCRIBE HISTORY ddl_t6").collect()
    assert [r["txn"] for r in hist] == [3, 2, 1]  # newest first
    assert all(r["committed_at"] is not None for r in hist)

    opt = ddl.sql(spark, "OPTIMIZE ddl_t6").first()
    assert opt["compacted_txn"] == 4
    # the refreshed view still serves the same relation
    row = spark.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM ddl_t6").first()
    assert (row["n"], row["s"]) == (3, 30)

    removed = sorted(
        r["removed_txn"] for r in ddl.sql(spark, "VACUUM ddl_t6").collect()
    )
    assert removed == [1, 2, 3]
    # history now shows only the compaction
    hist2 = ddl.sql(spark, "DESCRIBE HISTORY ddl_t6").collect()
    assert [r["txn"] for r in hist2] == [4]
    assert hist2[0]["replaces"] == [1, 2, 3]
    # retention-window vacuum with nothing eligible returns empty
    assert ddl.sql(spark, "VACUUM ddl_t6 RETAIN 3600 SECONDS").count() == 0
    ddl.sql(spark, "DROP TABLE ddl_t6")


def test_maintenance_unknown_table_raises(spark):
    with pytest.raises(ValueError, match="unknown matdb table"):
        ddl.execute_ddl(spark, "OPTIMIZE no_such_table_xyz")


def test_describe_detail(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "s7")
    ddl.sql(spark, _create_stmt("ddl_t7", loc))
    db = Database.open(spark, loc)
    t = db.begin()
    t.add_rows([[i, i] for i in range(10)])
    t.commit()
    row = ddl.sql(spark, "DESCRIBE DETAIL ddl_t7").first()
    assert row["location"] == os.path.abspath(loc) or row["location"] == loc
    assert row["committed_txns"] == 1
    assert row["visible_txns"] == 1
    assert row["data_files"] >= 1 and row["data_bytes"] > 0
    assert row["next_txn_id"] == 2
    ddl.sql(spark, "DROP TABLE ddl_t7")


# ---------------------------------------------------------------- r8: DML
def test_insert_values_roundtrip(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "ins1")
    ddl.execute_ddl(spark, _create_stmt("ddl_ins1", loc))
    out = ddl.sql(spark, "INSERT INTO ddl_ins1 VALUES (1, 10), (2, 20)")
    assert out.columns == ["inserted_txn"]
    txn1 = out.first()["inserted_txn"]
    assert txn1 is not None
    # the view refreshed: SQL sees the rows immediately
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_ins1").collect()
    }
    assert got == {1: 10, 2: 20}
    # newest-wins upsert: a second INSERT for key 1 replaces it
    ddl.sql(spark, "INSERT INTO ddl_ins1 (k, v) VALUES (1, 99)")
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_ins1").collect()
    }
    assert got == {1: 99, 2: 20}
    # each statement is ONE txn in history
    hist = ddl.execute_ddl(spark, "DESCRIBE HISTORY ddl_ins1").collect()
    assert len(hist) == 2


def test_insert_select_and_column_permutation(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "ins2")
    ddl.execute_ddl(spark, _create_stmt("ddl_ins2", loc))
    spark.createDataFrame(
        [(7, 70), (8, 80)], "a long, b long"
    ).createOrReplaceTempView("ddl_ins2_src")
    # permuted column list; SELECT maps positionally onto it
    ddl.sql(
        spark,
        "INSERT INTO ddl_ins2 (v, k) SELECT b, a FROM ddl_ins2_src",
    )
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_ins2").collect()
    }
    assert got == {7: 70, 8: 80}


def test_insert_errors(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "ins3")
    ddl.execute_ddl(spark, _create_stmt("ddl_ins3", loc))
    with pytest.raises(ValueError, match="missing column"):
        ddl.execute_ddl(spark, "INSERT INTO ddl_ins3 (k) VALUES (1)")
    with pytest.raises(ValueError, match="unknown column"):
        ddl.execute_ddl(spark, "INSERT INTO ddl_ins3 (k, nope) VALUES (1, 2)")
    with pytest.raises(ValueError, match="produces 1 column"):
        ddl.execute_ddl(spark, "INSERT INTO ddl_ins3 SELECT 1")
    with pytest.raises(ValueError, match="unknown matdb table"):
        ddl.execute_ddl(spark, "INSERT INTO no_such VALUES (1, 2)")


def test_alter_add_column_then_insert(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "alt1")
    ddl.execute_ddl(spark, _create_stmt("ddl_alt1", loc))
    ddl.sql(spark, "INSERT INTO ddl_alt1 VALUES (1, 10)")
    out = ddl.sql(spark, "ALTER TABLE ddl_alt1 ADD COLUMN extra DOUBLE")
    assert [r["added_column"] for r in out.collect()] == ["extra"]
    # old rows read the evolved column as NULL through the fresh view
    row = ddl.sql(
        spark, "SELECT k, v, extra FROM ddl_alt1 WHERE k = 1"
    ).first()
    assert row["v"] == 10 and row["extra"] is None
    # inserts must now supply the new column
    ddl.sql(spark, "INSERT INTO ddl_alt1 VALUES (2, 20, 2.5)")
    row2 = ddl.sql(
        spark, "SELECT extra FROM ddl_alt1 WHERE k = 2"
    ).first()
    assert row2["extra"] == 2.5
    with pytest.raises(Exception, match="missing value column|missing column"):
        ddl.execute_ddl(spark, "INSERT INTO ddl_alt1 (k, v) VALUES (3, 30)")


def test_alter_add_columns_multi_and_errors(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "alt2")
    ddl.execute_ddl(spark, _create_stmt("ddl_alt2", loc))
    out = ddl.execute_ddl(
        spark, "ALTER TABLE ddl_alt2 ADD COLUMNS (c1 BIGINT, c2 STRING)"
    )
    assert [r["added_column"] for r in out.collect()] == ["c1", "c2"]
    assert set(ddl.sql(spark, "SELECT * FROM ddl_alt2").columns) == {
        "k",
        "v",
        "c1",
        "c2",
    }
    with pytest.raises(ValueError, match="already exists"):
        ddl.execute_ddl(spark, "ALTER TABLE ddl_alt2 ADD COLUMN c1 BIGINT")
    with pytest.raises(ValueError, match="unknown matdb table"):
        ddl.execute_ddl(spark, "ALTER TABLE nope ADD COLUMN x BIGINT")


def test_insert_on_non_matdb_table_passes_through(spark):
    """sql() must not hijack INSERTs aimed at ordinary Spark tables."""
    spark.sql("DROP TABLE IF EXISTS ddl_plain_ins")
    spark.sql("CREATE TABLE ddl_plain_ins (x INT) USING parquet")
    try:
        ddl.sql(spark, "INSERT INTO ddl_plain_ins VALUES (5)")
        assert spark.sql("SELECT x FROM ddl_plain_ins").first()["x"] == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_plain_ins")


# -------------------------------------------------- r8: session scoping
def test_session_scoped_registry(spark, tmp_db_path):
    """The dialect's name->path registry is PER SparkSession (weakly
    keyed): a second session in the same process neither sees nor can
    mutate the first session's tables — the r7-advice fix for
    process-global state. The single-driver contract for maintenance
    statements is documented at the registry definition."""
    loc = os.path.join(tmp_db_path, "scope1")
    ddl.execute_ddl(spark, _create_stmt("ddl_scope1", loc))
    assert ddl._tables(spark)["ddl_scope1"] == loc

    other = spark.newSession()
    try:
        # invisible to the other session (the registry, independently
        # of Spark's own child-session limitation pinned below)...
        with pytest.raises(ValueError, match="unknown matdb table"):
            ddl.execute_ddl(other, "DESCRIBE HISTORY ddl_scope1")
        with pytest.raises(ValueError, match="unknown matdb table"):
            ddl.execute_ddl(other, "INSERT INTO ddl_scope1 VALUES (1, 2)")
        # a DROP in the other session cannot unregister ours
        with pytest.raises(ValueError, match="unknown matdb table"):
            ddl.execute_ddl(other, "DROP TABLE ddl_scope1")
        assert "ddl_scope1" in ddl._tables(spark)
        assert ddl._tables(other) == {}
        assert ddl._tables(other) is not ddl._tables(spark)
    finally:
        ddl.execute_ddl(spark, "DROP TABLE IF EXISTS ddl_scope1")


def test_child_session_python_source_limitation_pinned(spark, tmp_db_path):
    """PIN a Spark 4.1 limitation that bounds the dialect's session
    story: a ``spark.newSession()`` can neither re-register a Python
    data source (DATA_SOURCE_ALREADY_EXISTS) nor read through the
    parent's registration (DATA_SOURCE_NOT_FOUND at load) — so matdb
    DDL is usable only from the session that registered the format.
    If a Spark upgrade makes either call succeed, this test fails
    loudly and full multi-session DDL can be enabled."""
    register_matdb_source(spark)
    other = spark.newSession()
    # re-registration is swallowed as already-exists (idempotence)...
    register_matdb_source(other)
    # ...but the child still cannot LOAD the format
    loc = os.path.join(tmp_db_path, "child_probe")
    Database.create(
        spark,
        loc,
        __import__("matdb_spark").Schema(
            dimensions=[__import__("matdb_spark").Dimension("k", 10)],
            values=[__import__("matdb_spark").Value("v")],
        ),
    )
    with pytest.raises(Exception, match="DATA_SOURCE_NOT_FOUND"):
        other.read.format("matdb").load(loc).collect()


# ------------------------------------------------ r8: UPDATE / DELETE
def test_update_statement(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "upd1")
    ddl.execute_ddl(spark, _create_stmt("ddl_upd1", loc))
    ddl.sql(spark, "INSERT INTO ddl_upd1 VALUES (1, 10), (2, 20), (3, 30)")
    out = ddl.sql(spark, "UPDATE ddl_upd1 SET v = v * 2 WHERE k >= 2")
    assert out.columns == ["updated_txn"]
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_upd1").collect()
    }
    assert got == {1: 10, 2: 40, 3: 60}
    # expression with a function call + no WHERE (all rows)
    ddl.sql(spark, "UPDATE ddl_upd1 SET v = greatest(v, 50)")
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_upd1").collect()
    }
    assert got == {1: 50, 2: 50, 3: 60}
    with pytest.raises(ValueError, match="cannot assign dimension"):
        ddl.execute_ddl(spark, "UPDATE ddl_upd1 SET k = 9")
    with pytest.raises(ValueError, match="unknown column"):
        ddl.execute_ddl(spark, "UPDATE ddl_upd1 SET nope = 1")


def test_delete_statement(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "del1")
    ddl.execute_ddl(spark, _create_stmt("ddl_del1", loc))
    ddl.sql(spark, "INSERT INTO ddl_del1 VALUES (1, 10), (2, 20), (3, 30)")
    out = ddl.sql(spark, "DELETE FROM ddl_del1 WHERE k = 2")
    assert out.columns == ["deleted_txn"]
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_del1").collect()
    }
    assert got == {1: 10, 3: 30}
    # re-inserting a deleted key resurrects it (newest wins)
    ddl.sql(spark, "INSERT INTO ddl_del1 VALUES (2, 99)")
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_del1").collect()
    }
    assert got == {1: 10, 2: 99, 3: 30}
    # compaction removes tombstones physically, content unchanged
    ddl.sql(spark, "DELETE FROM ddl_del1 WHERE v >= 99")
    ddl.sql(spark, "OPTIMIZE ddl_del1")
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT k, v FROM ddl_del1").collect()
    }
    assert got == {1: 10, 3: 30}


def test_truncate_statement(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "trunc1")
    ddl.execute_ddl(spark, _create_stmt("ddl_trunc1", loc))
    ddl.sql(spark, "INSERT INTO ddl_trunc1 VALUES (1, 10), (2, 20)")
    out = ddl.sql(spark, "TRUNCATE TABLE ddl_trunc1")
    assert out.columns == ["deleted_txn"]
    assert ddl.sql(spark, "SELECT * FROM ddl_trunc1").count() == 0
    # history stays time-travelable: the pre-truncate snapshot reads
    # (as_of=t sees commits <= t, so step one BELOW the tombstone txn)
    db = Database.open(spark, loc)
    pre = db.begin(as_of=out.first()["deleted_txn"] - 1).query()
    assert pre.count() == 2


def test_update_delete_on_non_matdb_passes_through(spark):
    spark.sql("DROP TABLE IF EXISTS ddl_plain_ud")
    spark.sql("CREATE TABLE ddl_plain_ud (x INT) USING parquet")
    try:
        ddl.sql(spark, "INSERT INTO ddl_plain_ud VALUES (5), (6)")
        # Spark parquet tables reject DELETE (not a v2 table) — the
        # point here is only that the shim did NOT hijack the route
        with pytest.raises(Exception):
            ddl.sql(spark, "DELETE FROM ddl_plain_ud WHERE x = 5")
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_plain_ud")


def test_merge_statement_full(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "mrg1")
    ddl.execute_ddl(
        spark, _create_stmt("ddl_mrg1", loc, cols="k BIGINT, v BIGINT, s STRING")
    )
    ddl.sql(
        spark,
        "INSERT INTO ddl_mrg1 VALUES (1, 10, 'a'), (2, 20, 'b'),"
        " (3, 30, 'c'), (4, 40, 'd')",
    )
    spark.sql(
        "SELECT 2 AS k, 200 AS nv, 'upd' AS act UNION ALL"
        " SELECT 3, -1, 'del' UNION ALL SELECT 9, 900, 'new'"
    ).createOrReplaceTempView("mrg_src")
    out = ddl.sql(
        spark,
        """
        MERGE INTO ddl_mrg1 t USING mrg_src m ON t.k = m.k
        WHEN MATCHED AND m.act = 'del' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = m.nv, s = m.act
        WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (m.k, m.nv, m.act)
        """,
    )
    assert out.columns == ["merged_txn"]
    got = {
        r["k"]: (r["v"], r["s"])
        for r in ddl.sql(spark, "SELECT * FROM ddl_mrg1").collect()
    }
    # 1/4 untouched, 2 updated, 3 deleted, 9 inserted — one txn
    assert got == {
        1: (10, "a"),
        2: (200, "upd"),
        4: (40, "d"),
        9: (900, "new"),
    }
    # ONE transaction wrote all three legs
    hist = ddl.sql(spark, "DESCRIBE HISTORY ddl_mrg1")
    assert hist.count() == 2  # the insert txn + the merge txn


def test_merge_insert_star_and_subquery_source(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "mrg2")
    ddl.execute_ddl(spark, _create_stmt("ddl_mrg2", loc))
    ddl.sql(spark, "INSERT INTO ddl_mrg2 VALUES (1, 10)")
    out = ddl.sql(
        spark,
        "MERGE INTO ddl_mrg2 USING (SELECT id AS k, id * 7 AS v FROM"
        " range(3)) AS s ON ddl_mrg2.k = s.k"
        " WHEN MATCHED THEN UPDATE SET v = s.v"
        " WHEN NOT MATCHED THEN INSERT *",
    )
    assert out.count() == 1
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_mrg2").collect()
    }
    assert got == {0: 0, 1: 7, 2: 14}


def test_merge_errors(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "mrg3")
    ddl.execute_ddl(spark, _create_stmt("ddl_mrg3", loc))
    ddl.sql(spark, "INSERT INTO ddl_mrg3 VALUES (1, 10)")
    # duplicate source matches -> nondeterministic, rejected
    spark.sql(
        "SELECT 1 AS k, 1 AS v UNION ALL SELECT 1, 2"
    ).createOrReplaceTempView("mrg_dup")
    with pytest.raises(ValueError, match="more than one source row"):
        ddl.sql(
            spark,
            "MERGE INTO ddl_mrg3 t USING mrg_dup s ON t.k = s.k"
            " WHEN MATCHED THEN UPDATE SET v = s.v",
        )
    # a merge that raises must not leave a txn behind
    assert ddl.sql(spark, "DESCRIBE HISTORY ddl_mrg3").count() == 1
    with pytest.raises(ValueError, match="needs an alias"):
        ddl.execute_ddl(
            spark,
            "MERGE INTO ddl_mrg3 USING (SELECT 1 AS k, 1 AS v) ON"
            " ddl_mrg3.k = k WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="cannot assign dimension"):
        ddl.execute_ddl(
            spark,
            "MERGE INTO ddl_mrg3 t USING mrg_dup s ON t.k = s.k"
            " WHEN MATCHED THEN UPDATE SET k = 9",
        )
    with pytest.raises(ValueError, match="missing column"):
        ddl.execute_ddl(
            spark,
            "MERGE INTO ddl_mrg3 t USING mrg_dup s ON t.k = s.k"
            " WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)",
        )


def test_ctas_roundtrip_and_if_not_exists(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "ctas1")
    spark.sql(
        "SELECT id AS k, id * 3 AS v FROM range(5)"
    ).createOrReplaceTempView("ctas_src")
    df = ddl.sql(
        spark,
        f"CREATE TABLE ddl_ctas1 USING matdb LOCATION '{loc}'"
        " TBLPROPERTIES ('chunks' = 'k=4') AS SELECT * FROM ctas_src",
    )
    assert df.count() == 5
    assert (
        ddl.sql(spark, "SELECT SUM(v) AS s FROM ddl_ctas1").first()["s"] == 30
    )
    # schema landed with inferred types, k as the dimension
    db = Database.open(spark, loc)
    assert db.schema.dim_names == ["k"]
    assert db.schema.value_names == ["v"]
    # plain CTAS over an existing store errors; IF NOT EXISTS opens
    # WITHOUT re-running the query (no second txn)
    with pytest.raises(ValueError, match="already exists"):
        ddl.execute_ddl(
            spark,
            f"CREATE TABLE ddl_ctas1 USING matdb LOCATION '{loc}'"
            " TBLPROPERTIES ('chunks' = 'k=4') AS SELECT * FROM ctas_src",
        )
    df2 = ddl.sql(
        spark,
        f"CREATE TABLE IF NOT EXISTS ddl_ctas1 USING matdb LOCATION"
        f" '{loc}' TBLPROPERTIES ('chunks' = 'k=4')"
        " AS SELECT * FROM ctas_src",
    )
    assert df2.count() == 5
    assert ddl.sql(spark, "DESCRIBE HISTORY ddl_ctas1").count() == 1


def test_describe_changes_statement(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "chg1")
    ddl.execute_ddl(spark, _create_stmt("ddl_chg1", loc))
    ddl.sql(spark, "INSERT INTO ddl_chg1 VALUES (1, 10), (2, 20)")  # txn 1
    ddl.sql(spark, "UPDATE ddl_chg1 SET v = 99 WHERE k = 1")  # txn 2
    ddl.sql(spark, "DELETE FROM ddl_chg1 WHERE k = 2")  # txn 3
    feed = {
        r["k"]: r["change_type"]
        for r in ddl.sql(spark, "DESCRIBE CHANGES ddl_chg1 FROM 1").collect()
    }
    assert feed == {1: "upsert", 2: "delete"}
    pre = {
        (r["k"], r["change_type"], r["old_v"], r["v"])
        for r in ddl.sql(
            spark, "DESCRIBE CHANGES ddl_chg1 FROM 1 TO 2 WITH PREIMAGE"
        ).collect()
    }
    assert pre == {(1, "update", 10, 99)}


def test_show_matdb_tables(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "show1")
    ddl.execute_ddl(spark, _create_stmt("ddl_show1", loc))
    rows = {
        r["tableName"]: r["location"]
        for r in ddl.sql(spark, "SHOW MATDB TABLES").collect()
    }
    assert rows.get("ddl_show1") == loc
    # plain SHOW TABLES still passes through to spark.sql untouched
    assert "tableName" in ddl.sql(spark, "SHOW TABLES").columns


def test_time_travel_sql(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "tt1")
    ddl.execute_ddl(spark, _create_stmt("ddl_tt1", loc))
    ddl.sql(spark, "INSERT INTO ddl_tt1 VALUES (1, 10), (2, 20)")  # txn 1
    ddl.sql(spark, "UPDATE ddl_tt1 SET v = v + 100")  # txn 2
    ddl.sql(spark, "DELETE FROM ddl_tt1 WHERE k = 2")  # txn 3
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(
            spark, "SELECT * FROM ddl_tt1 VERSION AS OF 1"
        ).collect()
    }
    assert got == {1: 10, 2: 20}
    # the snapshot stays addressable under the TABLE name (no alias)
    assert (
        ddl.sql(
            spark,
            "SELECT ddl_tt1.v FROM ddl_tt1 VERSION AS OF 2 WHERE"
            " ddl_tt1.k = 1",
        ).first()["v"]
        == 110
    )
    # explicit alias + self-join of two versions in one statement
    rows = {
        (r["k"], r["v_old"], r["v_new"])
        for r in ddl.sql(
            spark,
            "SELECT o.k, o.v AS v_old, n.v AS v_new"
            " FROM ddl_tt1 VERSION AS OF 1 o LEFT JOIN ddl_tt1 n"
            " ON o.k = n.k",
        ).collect()
    }
    assert rows == {(1, 10, 110), (2, 20, None)}
    # TIMESTAMP AS OF: far future resolves to head; too early raises
    assert (
        ddl.sql(
            spark,
            "SELECT COUNT(*) AS n FROM ddl_tt1 TIMESTAMP AS OF"
            " '2099-01-01'",
        ).first()["n"]
        == 1
    )
    with pytest.raises(ValueError, match="no commit at or before"):
        ddl.sql(
            spark, "SELECT * FROM ddl_tt1 TIMESTAMP AS OF '1999-01-01'"
        )
    # a non-matdb relation with the same phrase passes through to
    # spark.sql untouched (and fails there, since parquet tables
    # don't support our as-of) — the rewrite only fires on registered
    # matdb names
    with pytest.raises(Exception):
        ddl.sql(spark, "SELECT * FROM range(3) VERSION AS OF 1")


def test_show_create_table_roundtrips(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "sct1")
    ddl.execute_ddl(
        spark,
        _create_stmt(
            "ddl_sct1",
            loc,
            cols="a BIGINT, b BIGINT, v DOUBLE, s STRING",
            chunks="a=100,b=10",
        ),
    )
    stmt = ddl.sql(spark, "SHOW CREATE TABLE ddl_sct1").first()[
        "createtab_stmt"
    ]
    assert "USING matdb" in stmt and f"'{loc}'" in stmt
    assert "'chunks' = 'a=100,b=10'" in stmt
    # the reconstructed statement re-opens the store (IF NOT EXISTS
    # validates declared columns against schema.json)
    ddl.sql(spark, "DROP TABLE ddl_sct1")
    reopened = ddl.sql(
        spark, stmt.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS")
    )
    assert reopened.columns == ["a", "b", "v", "s"]


def test_insert_overwrite(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "ow1")
    ddl.execute_ddl(spark, _create_stmt("ddl_ow1", loc))
    ddl.sql(spark, "INSERT INTO ddl_ow1 VALUES (1, 10), (2, 20), (3, 30)")
    out = ddl.sql(
        spark, "INSERT OVERWRITE ddl_ow1 VALUES (2, 99), (7, 70)"
    )
    assert out.columns == ["overwritten_txn"]
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_ow1").collect()
    }
    # 1 and 3 gone, 2 replaced, 7 new — ONE transaction
    assert got == {2: 99, 7: 70}
    hist = ddl.sql(spark, "DESCRIBE HISTORY ddl_ow1")
    assert hist.count() == 2
    # the pre-overwrite snapshot is still time-travelable
    pre = {
        r["k"]: r["v"]
        for r in ddl.sql(
            spark, "SELECT * FROM ddl_ow1 VERSION AS OF 1"
        ).collect()
    }
    assert pre == {1: 10, 2: 20, 3: 30}
    # OVERWRITE TABLE form + SELECT source
    ddl.sql(
        spark,
        "INSERT OVERWRITE TABLE ddl_ow1 SELECT id AS k, id AS v FROM"
        " range(2)",
    )
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_ow1").collect()
    }
    assert got == {0: 0, 1: 1}


def test_restore_table(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "rst1")
    ddl.execute_ddl(spark, _create_stmt("ddl_rst1", loc))
    ddl.sql(spark, "INSERT INTO ddl_rst1 VALUES (1, 10), (2, 20)")  # v1
    ddl.sql(spark, "INSERT INTO ddl_rst1 VALUES (3, 30)")  # v2
    ddl.sql(spark, "UPDATE ddl_rst1 SET v = 0 WHERE k = 1")  # v3
    ddl.sql(spark, "DELETE FROM ddl_rst1 WHERE k = 2")  # v4
    out = ddl.sql(spark, "RESTORE TABLE ddl_rst1 TO VERSION AS OF 1")
    assert out.columns == ["restored_version", "restore_txn"]
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_rst1").collect()
    }
    # back to v1 exactly: 3 gone, 1 un-updated, 2 resurrected
    assert got == {1: 10, 2: 20}
    # the restore is a FORWARD txn: pre-restore state is still there
    pre = {
        r["k"]: r["v"]
        for r in ddl.sql(
            spark, "SELECT * FROM ddl_rst1 VERSION AS OF 4"
        ).collect()
    }
    assert pre == {1: 0, 3: 30}
    # and the restore can be restored away again
    ddl.sql(spark, "RESTORE TABLE ddl_rst1 TO VERSION AS OF 4")
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_rst1").collect()
    }
    assert got == {1: 0, 3: 30}


def test_asof_rewrite_is_quote_aware(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "qa1")
    ddl.execute_ddl(spark, _create_stmt("ddl_qa1", loc))
    ddl.sql(spark, "INSERT INTO ddl_qa1 VALUES (1, 10)")
    # the literal mentions the phrase; it must come back VERBATIM
    row = ddl.sql(
        spark,
        "SELECT 'ddl_qa1 VERSION AS OF 1' AS s, v FROM ddl_qa1",
    ).first()
    assert row["s"] == "ddl_qa1 VERSION AS OF 1"
    assert row["v"] == 10


def test_optimize_zorder(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "zo1")
    ddl.execute_ddl(
        spark,
        _create_stmt("ddl_zo1", loc, cols="a BIGINT, b BIGINT, v BIGINT",
                     chunks="a=1000,b=1000"),
    )
    ddl.sql(
        spark,
        "INSERT INTO ddl_zo1 SELECT id % 50, id DIV 50, id FROM range(500)",
    )
    ddl.sql(spark, "INSERT INTO ddl_zo1 VALUES (0, 0, 999)")
    out = ddl.sql(spark, "OPTIMIZE ddl_zo1 ZORDER")
    assert out.first()["compacted_txn"] is not None
    got = {
        (r["a"], r["b"]): r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_zo1").collect()
    }
    assert len(got) == 500 and got[(0, 0)] == 999
    # BY list must name exactly the dim set
    ddl.sql(spark, "OPTIMIZE ddl_zo1 ZORDER BY (b, a)")  # ok, any order
    with pytest.raises(ValueError, match="ALL dimensions"):
        ddl.execute_ddl(spark, "OPTIMIZE ddl_zo1 ZORDER BY (a)")


def test_restore_across_compaction_and_vacuum(spark, tmp_db_path):
    """RESTORE's documented precondition (r8 verdict item 7): the
    target snapshot must still be readable. Before VACUUM a compaction
    keeps superseded manifests, so RESTORE to a pre-compaction version
    gives the CORRECT result; after VACUUM reclaims them it must be a
    CLEAN error (Transaction.begin(as_of=)'s missing_history guard),
    never a silent partial restore — and the failed statement leaves
    no transaction behind."""
    loc = os.path.join(tmp_db_path, "rst_vac")
    ddl.execute_ddl(spark, _create_stmt("ddl_rstv", loc))
    ddl.sql(spark, "INSERT INTO ddl_rstv VALUES (1, 10), (2, 20)")  # txn 1
    ddl.sql(spark, "INSERT INTO ddl_rstv VALUES (2, 99), (3, 30)")  # txn 2
    ddl.sql(spark, "OPTIMIZE ddl_rstv")  # compaction supersedes 1-2

    # pre-vacuum: history intact, restore past the compaction works
    out = ddl.sql(spark, "RESTORE TABLE ddl_rstv TO VERSION AS OF 1")
    assert out.first()["restored_version"] == 1
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_rstv").collect()
    }
    assert got == {1: 10, 2: 20}

    # roll forward again, compact, and vacuum the superseded history
    ddl.sql(spark, "INSERT INTO ddl_rstv VALUES (4, 40)")
    ddl.sql(spark, "OPTIMIZE ddl_rstv")
    removed = ddl.sql(spark, "VACUUM ddl_rstv")
    assert removed.count() > 0

    # post-vacuum: the pre-compaction snapshot is gone — clean error
    hist_before = ddl.sql(spark, "DESCRIBE HISTORY ddl_rstv").count()
    with pytest.raises(ValueError, match="unreadable"):
        ddl.sql(spark, "RESTORE TABLE ddl_rstv TO VERSION AS OF 1")
    assert ddl.sql(spark, "DESCRIBE HISTORY ddl_rstv").count() == hist_before
    # the live snapshot is untouched by the failed restore
    got = {
        r["k"]: r["v"]
        for r in ddl.sql(spark, "SELECT * FROM ddl_rstv").collect()
    }
    assert got == {1: 10, 2: 20, 4: 40}
