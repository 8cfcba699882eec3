"""Round-2 additions: cogrouped Pandas map and the gzip-TSV source.

The query-level behavior is covered by the oracle gate
(__spark_entry__); these tests pin the library semantics on tiny
hand-built inputs, including the empty-side edge the gate data never
hits.
"""

import pandas as pd

from matdb_spark.operators.groupmap import cogroup_stats
from matdb_spark.sources.formats import lineitem_tsv_gz_fixture, read_lineitem_tsv


def test_cogroup_stats_both_sides(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "k long, event_id long"
    )
    right = spark.createDataFrame(
        [(1, 100), (3, 300)], "k long, o_orderkey long"
    )
    out = {
        r["k"]: r.asDict()
        for r in cogroup_stats(left, right, ["k"], "event_id", "o_orderkey").collect()
    }
    assert out[1] == {"k": 1, "n_left": 2, "min_left_id": 10, "n_right": 1, "min_right_id": 100}
    # right-only key: left side arrives as an empty frame
    assert out[3] == {"k": 3, "n_left": 0, "min_left_id": None, "n_right": 1, "min_right_id": 300}
    # left-only key: right side empty
    assert out[2] == {"k": 2, "n_left": 1, "min_left_id": 20, "n_right": 0, "min_right_id": None}


def test_tsv_gz_roundtrip(spark, tmp_path):
    path = lineitem_tsv_gz_fixture(spark, "/root/testdata/sf0.001", str(tmp_path))
    li = read_lineitem_tsv(spark, path)
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert li.count() == src.count()
    # doubles must round-trip value-exact through the text format:
    # compare decimal-cast sums (order-independent, exact) rather than
    # double sums whose accumulation order differs between the reads
    from pyspark.sql import functions as F

    dec = lambda df: df.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")
    ).collect()[0]["s"]
    assert dec(li) == dec(src)
