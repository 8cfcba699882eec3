"""Salted top-k: identical results to the plain window under heavy
key skew, with the hot key spread across salt buckets in stage 1."""

from __future__ import annotations

from pyspark.sql import functions as F

from matdb_spark.operators.skew import salted_top_k_per_group
from matdb_spark.operators.topk import top_k_per_group


def test_salted_topk_matches_plain(spark):
    # one pathologically hot key (90% of rows) + a long tail
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise((F.col("id") % 97) + 1).alias("k"),
        F.col("id").alias("v"),
    )
    order = [F.col("v").desc()]
    plain = {(r["k"], r["v"]) for r in top_k_per_group(df, ["k"], order, 5).collect()}
    salted = {
        (r["k"], r["v"])
        for r in salted_top_k_per_group(df, ["k"], order, 5, salt_buckets=8).collect()
    }
    assert salted == plain and len(plain) > 5
