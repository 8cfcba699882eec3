"""Unit semantics for global_row_number and benchmark_overlap
(query-level behavior is covered by the oracle gate)."""

from pyspark.sql import functions as F

from matdb_spark.operators.dedup import benchmark_overlap
from matdb_spark.operators.ranking import global_row_number


def test_global_row_number_matches_total_order(spark):
    rows = [(i, (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, key long").repartition(8)
    out = global_row_number(
        df, [F.col("key"), F.col("id")], F.floor(F.col("key") / 10)
    )
    got = [(r["id"], r["rn"]) for r in out.orderBy("rn").collect()]
    expected_order = sorted(rows, key=lambda r: (r[1], r[0]))
    assert got == [(rid, i + 1) for i, (rid, _) in enumerate(expected_order)]
    # ranks are a permutation of 1..N (dense, no gaps, no dups)
    assert sorted(rn for _, rn in got) == list(range(1, 501))


def test_global_row_number_plan_has_no_global_window(spark):
    df = spark.createDataFrame([(i, i) for i in range(100)], "id long, key long")
    out = global_row_number(df, [F.col("key"), F.col("id")], F.floor(F.col("key") / 10))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the full-data window must partition by the bucket column; only the
    # #buckets-row offsets window may be partitionless
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "partitionBy" not in line or "__grn_b" in line
            assert "__grn_b" in line


def test_global_row_number_empty_and_single_bucket(spark):
    empty = spark.createDataFrame([], "id long, key long")
    assert global_row_number(empty, [F.col("id")], F.col("key")).count() == 0
    one = spark.createDataFrame([(5, 1), (3, 1)], "id long, key long")
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(one, [F.col("id")], F.col("key")).collect()
    }
    assert got == {3: 1, 5: 2}


def test_benchmark_overlap_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # contains bench 3-grams
            (2, "completely different words entirely here now"),
            (3, "quick brown fox but nothing else shared"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in benchmark_overlap(corpus, bench, "doc_id", "text", n=3, min_overlap=1).collect()
    }
    # bench shingles: {the quick brown, quick brown fox, brown fox jumps}
    assert out[1]["overlap_ngrams"] == 3
    assert out[1]["total_ngrams"] == 7
    assert out[3]["overlap_ngrams"] == 1  # only "quick brown fox"
    assert 2 not in out  # no shared shingles -> filtered


def test_benchmark_overlap_empty_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert benchmark_overlap(corpus, bench, "doc_id", "text").count() == 0


def test_query_points_accepts_dict_keys(spark, tmp_db_path):
    from pyspark.sql import functions as F
    from matdb_spark import Database, Dimension, Schema, Value
    import pytest

    db = Database.create(spark, tmp_db_path, Schema(
        dimensions=[Dimension("a", 10), Dimension("b", 0)],
        values=[Value("v")]))
    df = spark.range(100).select(
        (F.col("id") % 10).alias("a"), F.col("id").alias("b"),
        (F.col("id") * 2).alias("v"))
    t = db.begin(); t.add_dataframe(df); t.commit()
    got = db.begin().query_points([{"a": 5, "b": 5}, {"b": 17, "a": 7}]).collect()
    assert sorted((r["a"], r["b"], r["v"]) for r in got) == [(5, 5, 10), (7, 17, 34)]
    with pytest.raises(TypeError):
        db.begin().query_points([("a", "b")]).count()
