"""Deterministic sampling: reproducibility, nesting, stratification,
fixed-size groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from matdb_spark.operators import sampling
from matdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_fraction_sample_is_deterministic_and_nested(spark):
    docs = load_table(spark, SF, "documents")
    s10a = {r["doc_id"] for r in sampling.sample_fraction(docs, "doc_id", 0.10).collect()}
    s10b = {r["doc_id"] for r in sampling.sample_fraction(docs, "doc_id", 0.10).collect()}
    s05 = {r["doc_id"] for r in sampling.sample_fraction(docs, "doc_id", 0.05).collect()}
    assert s10a == s10b            # reproducible
    assert s05 <= s10a             # thresholds nest
    n = docs.count()
    assert 0 < len(s10a) < n
    # a different salt draws an (almost surely) different subset
    salted = {r["doc_id"] for r in sampling.sample_fraction(docs, "doc_id", 0.10, salt="x").collect()}
    assert salted != s10a


def test_stratified_and_per_group(spark):
    docs = load_table(spark, SF, "documents")
    strat = sampling.sample_stratified(
        docs, "doc_id", "source", {"src0": 1.0, "src1": 0.0}
    )
    got = {r["source"] for r in strat.select("source").distinct().collect()}
    assert got == {"src0"}

    per = sampling.sample_n_per_group(docs.select("doc_id", "source"), ["source"], "doc_id", 3)
    counts = per.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in counts) and len(counts) > 1


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    from matdb_spark.operators.sampling import epoch_shuffle

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a1 = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 7).orderBy("shuffle_rank").collect()]
    a2 = [r["doc_id"] for r in epoch_shuffle(df.repartition(7), "doc_id", 7).orderBy("shuffle_rank").collect()]
    b = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 8).orderBy("shuffle_rank").collect()]
    assert a1 == a2, "same seed must give one order regardless of partitioning"
    assert a1 != b, "different seed must permute differently"
    assert sorted(a1) == list(range(200))
    ranks = [r["shuffle_rank"] for r in epoch_shuffle(df, "doc_id", 7).collect()]
    assert sorted(ranks) == list(range(1, 201)), "contiguous 1-based ranks"
