"""Adversarial tests for the SQL-dialect scanners (matdb_spark/ddl.py)
— r8 verdict item 4 and three r8-advice lows.

The dialect's contract (ddl.py:24-29) is a regex micro-parser over
statements whose string literals follow Spark semantics: SQL quote
doubling (``'it''s'``) AND backslash escapes (``'it\\'s'`` — Spark's
default ``escapedStringLiterals=false`` mode). Every scanner now
shares one literal-bound helper (``_str_end``), and these tests pin
the cases a naive open/close toggle misreads:

- escaped quotes (both styles) inside literals,
- ``--`` sequences, commas, semicolons, and keywords inside literals,
- unparenthesized CASE WHEN inside a MERGE body,
- relation-level keywords after a time-travel phrase,
- the MERGE insert-leg determinism guard (r8 advice, medium),
- CTAS name-rebind detection and explicit unsupported-ALTER errors.
"""

import os

import pytest

from matdb_spark import ddl
from matdb_spark.ddl import (
    _find_top_level,
    _rewrite_asof,
    _scan_relation,
    _split_top_level,
    _str_end,
    _strip_comments,
)


def _create(spark, name, loc, cols="k BIGINT, v BIGINT", chunks="k=10"):
    return ddl.execute_ddl(
        spark,
        f"CREATE TABLE {name} ({cols}) USING matdb "
        f"LOCATION '{loc}' TBLPROPERTIES ('chunks' = '{chunks}')",
    )


# ---------------------------------------------------------------- unit


def test_str_end_doubling_and_backslash():
    s = "'it''s' rest"
    assert _str_end(s, 0) == 7  # whole literal, not the first pair
    s = r"'it\'s' rest"
    assert _str_end(s, 0) == 7
    s = r"'ends with backslash\\' x"
    assert _str_end(s, 0) == len(s) - 2
    # unterminated extends to the end — nothing after is SQL
    assert _str_end("'oops", 0) == 5
    assert _str_end("''", 0) == 2  # empty literal


def test_strip_comments_escaped_quotes():
    # '' doubling: the -- stays inside the literal
    assert _strip_comments("SELECT 'it''s -- not a comment'") == (
        "SELECT 'it''s -- not a comment'"
    )
    # backslash escape: a toggle scanner would close the literal at
    # \' and strip the tail as a comment
    assert _strip_comments(r"SELECT 'it\'s -- keep' -- drop") == (
        r"SELECT 'it\'s -- keep' "
    )
    assert _strip_comments("a -- b\nc") == "a \nc"


def test_split_top_level_escaped_quotes():
    assert _split_top_level("label = 'a,b', v = round(v, 2)") == [
        "label = 'a,b'",
        "v = round(v, 2)",
    ]
    assert _split_top_level("s = 'it''s, fine', v = 1") == [
        "s = 'it''s, fine'",
        "v = 1",
    ]
    assert _split_top_level(r"s = 'it\'s, fine', v = 1") == [
        r"s = 'it\'s, fine'",
        "v = 1",
    ]


def test_find_top_level_ignores_literals_and_parens():
    s = r"x WHEN 'a\' WHEN b' AND (CASE WHEN y THEN 1 END) WHEN z"
    hits = _find_top_level(s, "WHEN")
    assert hits == [2, len(s) - 6]


def test_scan_relation_subquery_with_escapes():
    rel, tail = _scan_relation(r"(SELECT 'don\'t)(' AS s) AS src ON 1=1")
    assert rel == r"(SELECT 'don\'t)(' AS s)"
    assert tail.strip().startswith("AS src")


# ------------------------------------------------------------ dialect


def test_insert_literal_with_semicolon_and_keywords(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "lit1")
    _create(spark, "ddlp_lit1", loc, cols="k BIGINT, s STRING")
    ddl.sql(
        spark,
        "INSERT INTO ddlp_lit1 VALUES"
        " (1, 'a;b -- not a comment'),"
        " (2, 'WHEN MATCHED THEN DELETE');",
    )
    got = {r["k"]: r["s"] for r in ddl.sql(spark, "SELECT * FROM ddlp_lit1").collect()}
    assert got == {
        1: "a;b -- not a comment",
        2: "WHEN MATCHED THEN DELETE",
    }


def test_update_set_string_with_escaped_quote(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "lit2")
    _create(spark, "ddlp_lit2", loc, cols="k BIGINT, s STRING")
    ddl.sql(spark, "INSERT INTO ddlp_lit2 VALUES (1, 'x'), (2, 'y')")
    ddl.sql(spark, "UPDATE ddlp_lit2 SET s = 'it''s, ok' WHERE k = 1")
    got = {r["k"]: r["s"] for r in ddl.sql(spark, "SELECT * FROM ddlp_lit2").collect()}
    assert got == {1: "it's, ok", 2: "y"}


def test_merge_case_when_in_set_and_on(spark, tmp_db_path):
    # unparenthesized CASE WHEN in the ON condition and in a SET
    # expression must not split the statement into bogus merge
    # clauses (r8 advice, low)
    loc = os.path.join(tmp_db_path, "mcase")
    _create(spark, "ddlp_mcase", loc)
    ddl.sql(spark, "INSERT INTO ddlp_mcase VALUES (1, 10), (2, 20)")
    spark.sql(
        "SELECT 1 AS k, 5 AS d UNION ALL SELECT 3, 7"
    ).createOrReplaceTempView("ddlp_mcase_src")
    ddl.sql(
        spark,
        "MERGE INTO ddlp_mcase t USING ddlp_mcase_src m"
        " ON t.k = CASE WHEN m.k < 100 THEN m.k ELSE -1 END"
        " WHEN MATCHED THEN UPDATE SET"
        "   v = CASE WHEN m.d > 6 THEN 0 ELSE t.v + m.d END"
        " WHEN NOT MATCHED THEN INSERT (k, v) VALUES"
        "   (m.k, CASE WHEN m.d > 6 THEN 700 ELSE -1 END)",
    )
    got = {r["k"]: r["v"] for r in ddl.sql(spark, "SELECT * FROM ddlp_mcase").collect()}
    assert got == {1: 15, 2: 20, 3: 700}


def test_merge_insert_leg_duplicate_new_key_rejected(spark, tmp_db_path):
    # r8 advice (medium): two source rows sharing one NEW key both
    # pass the anti-join; within one add_dataframe call duplicate keys
    # resolve arbitrarily — the statement must raise, mirroring the
    # matched leg's determinism rule, and leave no txn behind
    loc = os.path.join(tmp_db_path, "mdup")
    _create(spark, "ddlp_mdup", loc)
    ddl.sql(spark, "INSERT INTO ddlp_mdup VALUES (1, 10)")
    spark.sql(
        "SELECT 9 AS k, 1 AS v UNION ALL SELECT 9, 2 UNION ALL SELECT 8, 3"
    ).createOrReplaceTempView("ddlp_mdup_src")
    with pytest.raises(ValueError, match="inserts the same new key"):
        ddl.sql(
            spark,
            "MERGE INTO ddlp_mdup t USING ddlp_mdup_src s ON t.k = s.k"
            " WHEN MATCHED THEN UPDATE SET v = s.v"
            " WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)",
        )
    assert ddl.sql(spark, "DESCRIBE HISTORY ddlp_mdup").count() == 1
    # distinct new keys still insert fine
    ddl.sql(
        spark,
        "MERGE INTO ddlp_mdup t USING (SELECT 8 AS k, 3 AS v) s ON"
        " t.k = s.k WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)",
    )
    got = {r["k"]: r["v"] for r in ddl.sql(spark, "SELECT * FROM ddlp_mdup").collect()}
    assert got == {1: 10, 8: 3}


def test_asof_followed_by_relation_keywords(spark, tmp_db_path):
    # TABLESAMPLE/SORT/MINUS after a time-travel phrase are relation
    # keywords, not aliases — the table keeps its own name (r8 advice,
    # low: the stopword list was missing them)
    loc = os.path.join(tmp_db_path, "asof1")
    _create(spark, "ddlp_asof1", loc)
    ddl.sql(spark, "INSERT INTO ddlp_asof1 VALUES (1, 10), (2, 20)")
    ddl.sql(spark, "INSERT INTO ddlp_asof1 VALUES (3, 30)")
    rows = ddl.sql(
        spark,
        "SELECT ddlp_asof1.k, v FROM ddlp_asof1 VERSION AS OF 1 SORT BY k",
    ).collect()
    # SORT BY is per-partition order — assert content, not order
    assert sorted((r["k"], r["v"]) for r in rows) == [(1, 10), (2, 20)]
    n = ddl.sql(
        spark,
        "SELECT k FROM ddlp_asof1 VERSION AS OF 2"
        " MINUS SELECT k FROM ddlp_asof1 VERSION AS OF 1",
    ).collect()
    assert [r["k"] for r in n] == [3]
    # TABLESAMPLE parses (row count is sampled, so only shape-check)
    ddl.sql(
        spark,
        "SELECT ddlp_asof1.k FROM ddlp_asof1 VERSION AS OF 1"
        " TABLESAMPLE (100 PERCENT)",
    ).collect()


def test_asof_phrase_inside_escaped_literal_not_rewritten(spark, tmp_db_path):
    loc = os.path.join(tmp_db_path, "asof2")
    _create(spark, "ddlp_asof2", loc, cols="k BIGINT, s STRING")
    ddl.sql(spark, "INSERT INTO ddlp_asof2 VALUES (1, 'x')")
    ddl.sql(spark, "INSERT INTO ddlp_asof2 VALUES (2, 'y')")
    # the literal contains BOTH a backslash-escaped quote and a
    # time-travel phrase naming a registered table: a toggle scanner
    # closes the literal at \' and rewrites the phrase inside it
    stmt = (
        r"SELECT k, 'don\'t ddlp_asof2 VERSION AS OF 99' AS note"
        " FROM ddlp_asof2 VERSION AS OF 1"
    )
    rewritten = _rewrite_asof(spark, stmt, ddl._tables(spark))
    assert "VERSION AS OF 99" in rewritten  # literal untouched
    rows = ddl.sql(spark, stmt).collect()
    assert [(r["k"], r["note"]) for r in rows] == [
        (1, "don't ddlp_asof2 VERSION AS OF 99")
    ]


def test_ctas_rebind_of_registered_name_rejected(spark, tmp_db_path):
    # r8 advice (low): CTAS existence was only the schema.json path
    # probe — a name registered to a DIFFERENT location silently
    # created a second store and rebound the name
    loc1 = os.path.join(tmp_db_path, "c1")
    loc2 = os.path.join(tmp_db_path, "c2")
    _create(spark, "ddlp_ctas1", loc1)
    with pytest.raises(ValueError, match="already registered at"):
        ddl.execute_ddl(
            spark,
            f"CREATE TABLE ddlp_ctas1 USING matdb LOCATION '{loc2}'"
            " TBLPROPERTIES ('chunks' = 'k=10')"
            " AS SELECT id AS k, id AS v FROM range(5)",
        )
    assert not os.path.exists(loc2)  # no second store was created


def test_alter_drop_rename_explicit_contract_error(spark, tmp_db_path):
    # r8 verdict item 6: DROP/RENAME COLUMN used to fall through to
    # spark.sql and die with an unrelated provider error
    loc = os.path.join(tmp_db_path, "alt1")
    _create(spark, "ddlp_alt1", loc)
    for stmt in (
        "ALTER TABLE ddlp_alt1 DROP COLUMN v",
        "ALTER TABLE ddlp_alt1 RENAME COLUMN v TO w",
    ):
        with pytest.raises(ValueError, match="additive-only"):
            ddl.sql(spark, stmt)


def test_split_statements_literals_and_comments():
    from matdb_spark.ddl import split_statements

    script = (
        "CREATE TABLE x; -- trailing; comment\n"
        "INSERT INTO x VALUES (1, 'a;b');;\n"
        r"UPDATE x SET s = 'don\'t; stop' WHERE k = 1"
    )
    assert split_statements(script) == [
        "CREATE TABLE x",
        "INSERT INTO x VALUES (1, 'a;b')",
        r"UPDATE x SET s = 'don\'t; stop' WHERE k = 1",
    ]


def test_run_script_end_to_end(spark, tmp_db_path):
    from matdb_spark.ddl import run_script

    loc = os.path.join(tmp_db_path, "scr1")
    out = run_script(
        spark,
        f"""
        CREATE TABLE ddlp_scr1 (k BIGINT, s STRING) USING matdb
            LOCATION '{loc}' TBLPROPERTIES ('chunks' = 'k=10');
        -- a comment between statements
        INSERT INTO ddlp_scr1 VALUES (1, 'a;b'), (2, 'two');
        UPDATE ddlp_scr1 SET s = 'it''s' WHERE k = 2;
        SELECT k, s FROM ddlp_scr1;
        """,
    )
    got = {r["k"]: r["s"] for r in out.collect()}
    assert got == {1: "a;b", 2: "it's"}


def test_run_script_error_names_statement(spark, tmp_db_path):
    from matdb_spark.ddl import run_script

    loc = os.path.join(tmp_db_path, "scr2")
    with pytest.raises(ValueError, match="statement #2"):
        run_script(
            spark,
            f"""
            CREATE TABLE ddlp_scr2 (k BIGINT, v BIGINT) USING matdb
                LOCATION '{loc}' TBLPROPERTIES ('chunks' = 'k=10');
            ALTER TABLE ddlp_scr2 DROP COLUMN v;
            """,
        )
