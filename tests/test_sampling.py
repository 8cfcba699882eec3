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


def test_rebalance_mixture_copies_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 80 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    # a: downsample to half; b: upsample 2.5x; c: unlisted (dropped)
    w = spark.createDataFrame(
        [("a", 0.5), ("b", 2.5), ("c", 9.0)], "source string, weight double"
    )
    out = sampling.rebalance_mixture(df, w, "source", "doc_id")
    rows = out.collect()
    again = sampling.rebalance_mixture(df, w, "source", "doc_id").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    by_src = {}
    per_doc = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
        per_doc.setdefault(r["doc_id"], []).append(r["copy_idx"])
    # every kept doc's copies are a contiguous 1..n index
    for d, idxs in per_doc.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))
    # b docs each appear 2 or 3 times (floor 2 + bernoulli); a appear <= 1
    for d, idxs in per_doc.items():
        if d >= 80:
            assert len(idxs) in (2, 3)
        else:
            assert len(idxs) == 1
    # expectations: a ~ 40 of 80, b ~ 50 of 20 docs
    assert 25 <= by_src["a"] <= 55
    assert 40 <= by_src["b"] <= 60


def test_rebalance_mixture_null_weight_drops_and_plan(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string"
    )
    w = spark.createDataFrame(
        [("a", 1.0), ("b", None)], "source string, weight double"
    )
    out = sampling.rebalance_mixture(df, w, "source", "doc_id")
    assert [r["doc_id"] for r in out.collect()] == [1]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_temperature_weights_properties(spark):
    """T=2 flattens toward uniform (max natural share shrinks, min
    grows), temp shares still sum to 1, and T=1 is the identity
    (pow(x, 1.0) is exact)."""
    import pyspark.sql.functions as F

    from matdb_spark.operators.sampling import temperature_weights

    per = spark.createDataFrame(
        [("a", 800), ("b", 150), ("c", 50)], "source string, mass long"
    )
    rows = {r["source"]: r for r in temperature_weights(per, "source", "mass").collect()}
    assert abs(sum(r["temp_share"] for r in rows.values()) - 1.0) < 1e-12
    assert rows["a"]["temp_share"] < rows["a"]["share"]  # dominant shrinks
    assert rows["c"]["temp_share"] > rows["c"]["share"]  # tail grows
    assert rows["c"]["weight"] > 1.0 > rows["a"]["weight"]
    ident = {
        r["source"]: r
        for r in temperature_weights(per, "source", "mass", temperature=1.0).collect()
    }
    for s in ident:
        assert ident[s]["temp_share"] == ident[s]["share"]
        assert ident[s]["weight"] == 1.0
