"""Regression tests for the functions/sources/zorder review fixes:

1. write_bucketed honors mode='append' (previously dropped the table
   and its location unconditionally — silent data loss).
2. median_agg returns NULL (not NaN) for all-null groups; count_agg
   counts non-null values only (SQL count(col) semantics).
3. zorder_bucket is overflow-safe for full-range long domains and
   stays a monotone map into [0, 2^bits).
4. parse_sensor_time accepts uppercase 'A.M./P.M.'.
5. simhash64's zero-shuffle form: known-value check (guards the
   lambda-arity trap where a 2-arg lambda receives the array index).
"""

from pyspark.sql import Row, functions as F

from matdb_spark.zorder import DEFAULT_BITS, zorder_bucket


def test_write_bucketed_append_accumulates(spark):
    from matdb_spark.sources.bucketed import colocated, write_bucketed

    df = spark.range(10).withColumnRenamed("id", "k")
    write_bucketed(df, "bkt_append_t", ["k"], 2, mode="overwrite")
    write_bucketed(df, "bkt_append_t", ["k"], 2, mode="append")
    assert colocated(spark, "bkt_append_t").count() == 20
    # and overwrite still resets
    write_bucketed(df, "bkt_append_t", ["k"], 2, mode="overwrite")
    assert colocated(spark, "bkt_append_t").count() == 10


def test_udaf_null_semantics(spark):
    from matdb_spark.functions.udaf import count_agg, median_agg

    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 5), (2, None)], "g int, v int"
    )
    out = {
        r["g"]: (r["m"], r["c"])
        for r in df.groupBy("g")
        .agg(median_agg(F.col("v")).alias("m"), count_agg(F.col("v")).alias("c"))
        .collect()
    }
    assert out[1] == (None, 0)  # all-null: NULL median, count 0
    assert out[2] == (5.0, 1)  # nulls excluded from count


def test_zorder_bucket_full_range_domain(spark):
    lo, hi = -(2**62) - 7, 2**62 + 11  # span > 2^63: col - lo overflows
    df = spark.createDataFrame(
        [Row(k=lo), Row(k=-1), Row(k=0), Row(k=hi)]
    )
    vals = [
        r["b"]
        for r in df.select(zorder_bucket("k", lo, hi).alias("b"))
        .orderBy("k")
        .collect()
    ]
    assert vals == sorted(vals)  # monotone
    assert all(0 <= v < (1 << DEFAULT_BITS) for v in vals)
    # endpoints land within one bucket of the range edges (div-first
    # form trades exact alignment for overflow safety)
    assert vals[0] <= 1 and vals[-1] >= (1 << DEFAULT_BITS) - 2
    assert vals[-1] - vals[0] > (1 << DEFAULT_BITS) // 2  # real spread


def test_parse_sensor_time_uppercase(spark):
    from matdb_spark.functions.encoders import parse_sensor_time

    df = spark.createDataFrame(
        [Row(t="14/02/2023 3:05:09 P.M."), Row(t="14/02/2023 3:05:09 p.m.")]
    )
    ms = [r["ms"] for r in df.select(parse_sensor_time(F.col("t")).alias("ms")).collect()]
    assert ms[0] is not None and ms[0] == ms[1]


def test_simhash_known_value(spark):
    from matdb_spark.operators.dedup import simhash64

    df = spark.createDataFrame([Row(doc_id=1, text="hello world hello")])
    got = simhash64(df, "doc_id", "text").collect()[0]["simhash"]
    # manual: bit set iff majority of [h(hello), h(world), h(hello)]
    # has it; with hello appearing twice the result IS h(hello)
    assert got == 419982666956583591
    # empty-token documents are excluded (explode-form parity)
    empty = spark.createDataFrame([Row(doc_id=2, text="   ")])
    assert simhash64(empty, "doc_id", "text").count() == 0


def test_minhash_lsh_max_bucket_guard(spark):
    """The skew guard drops giant band buckets; identical documents
    all land in the same buckets, so with a cap below the group size
    they produce no candidate pairs. The cap is ON by default (4096)
    — small clusters sail under it — and None opts out."""
    from pyspark.sql import Row

    from matdb_spark.operators.dedup import minhash_lsh_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame([Row(doc_id=i, text=text) for i in range(5)])
    free = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=None)
    assert free.count() == 10  # C(5,2): all identical docs pair up
    default = minhash_lsh_pairs(docs, "doc_id", "text")
    assert default.count() == 10  # 5-member buckets sail under 4096
    capped = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=4)
    assert capped.count() == 0  # every bucket has 5 members > cap


def test_pack_documents_nulls_fail_loudly(spark):
    """NULL id OR NULL token count must abort with the guard's own
    message (a NULL id would form a phantom shard; a NULL count is
    skipped by the window sum, silently double-assigning a slot)."""
    import pytest
    from pyspark.sql import Row

    from matdb_spark.operators.packing import pack_documents

    null_id = spark.createDataFrame(
        [Row(doc_id=1, toks=5), Row(doc_id=None, toks=3)],
        "doc_id long, toks long",
    )
    with pytest.raises(Exception, match="pack_documents: NULL doc_id"):
        pack_documents(null_id, "doc_id", "toks", budget=8, n_shards=2).collect()

    null_toks = spark.createDataFrame(
        [Row(doc_id=1, toks=5), Row(doc_id=2, toks=None)],
        "doc_id long, toks long",
    )
    with pytest.raises(Exception, match="pack_documents: NULL toks"):
        pack_documents(null_toks, "doc_id", "toks", budget=8, n_shards=2).collect()


def test_changes_rejects_change_type_schema_collision(spark, tmp_db_path):
    import os

    import pytest

    from matdb_spark import Database, Dimension, Schema, Value

    schema = Schema(dimensions=[Dimension("k")], values=[Value("change_type")])
    db = Database.create(
        spark, os.path.join(tmp_db_path, "ctcol"), schema
    )
    with db.begin() as t:
        t.add_row([1, 10])
        t.commit()
    with pytest.raises(ValueError, match="change_type"):
        db.changes(since=0)


def test_sensor_tsv_quotes_are_literal(spark, tmp_path):
    """Parser parity with split-on-tab: a field starting with a double
    quote must not swallow following tab separators."""
    from matdb_spark.sources import sensor_tsv

    line = '14/02/2023 3:05:09 p.m.\t"boiler\ttemp\tcelsius\t7.5'
    p = tmp_path / "q.tsv"
    p.write_text(line + "\n")
    row = sensor_tsv.read_sensor_tsv(spark, str(p)).first()
    assert row["component"] == '"boiler'
    assert row["sensor"] == "temp" and row["value_str"] == "7.5"
