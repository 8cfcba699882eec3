"""Round-4 verdict items: catalog-schema reads (no footer-merge job on
evolved stores), bounded IVF probe caching, >=3-dimension schemas."""

import os

import pytest

from matdb_spark.database import Database
from matdb_spark.schema import Dimension, Schema, Value


def _jobs_in_group(spark, group, fn):
    """Run ``fn`` under a fresh job group and return the Spark job ids
    it triggered — the footer-merge/schema-inference detector: plan
    CONSTRUCTION must launch zero jobs under catalog-schema reads."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    return list(tracker.getJobIdsForGroup(group)), out


def test_evolved_store_scan_runs_no_inference_job(spark, tmp_db_path):
    db = Database.create(
        spark,
        os.path.join(tmp_db_path, "evo"),
        Schema(dimensions=[Dimension("k", 100)], values=[Value("v")]),
    )
    with db.begin() as t:
        t.add_dataframe(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
        t.commit()
    db.add_value_column("w", "double")
    with db.begin() as t:
        t.add_dataframe(
            spark.createDataFrame([(2, 22, 2.5), (3, 30, 3.5)], "k long, v long, w double")
        )
        t.commit()
    assert db.schema.epoch == 1

    # Building the snapshot plan on an evolved store must not launch a
    # single Spark job: the read schema comes from the catalog
    # (schema.json), never from parquet footers (mergeSchema used to
    # run an O(#files) distributed footer read here).
    jobs, snap = _jobs_in_group(spark, "r4-noinfer", lambda: db.snapshot())
    assert jobs == [], f"plan construction launched Spark jobs: {jobs}"

    rows = {r.k: (r.v, r.w) for r in snap.collect()}
    assert rows == {1: (10, None), 2: (22, 2.5), 3: (30, 3.5)}


def test_ivf_indexed_probe_cache_is_bounded(spark, tmp_path_factory):
    """Repeated ivf_topk_indexed calls must not accumulate pinned
    storage: the probe is localCheckpoint'ed (RDD-owned blocks,
    ContextCleaner-reclaimed), never persist'ed (CacheManager-pinned
    for the application's lifetime)."""
    from pyspark.sql import functions as F

    from matdb_spark.operators.similarity import ivf_topk_indexed, write_ivf_index
    from matdb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    path = os.path.join(str(tmp_path_factory.mktemp("ivf")), "index")
    write_ivf_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id") == 3)

    cache_manager = spark._jsparkSession.sharedState().cacheManager()
    assert cache_manager.isEmpty(), "precondition: cache manager not empty"
    first = None
    for _ in range(3):
        res = sorted(
            (r.query_id, r.neighbor_id, round(r.cos_sim, 9))
            for r in ivf_topk_indexed(spark, path, queries, k=5, nprobe=2).collect()
        )
        first = first or res
        assert res == first
    # nothing registered with the cache manager => nothing pinned
    assert cache_manager.isEmpty(), "ivf_topk_indexed leaked a persist"


def test_never_evolved_store_scan_runs_no_inference_job(spark, tmp_db_path):
    db = Database.create(
        spark,
        os.path.join(tmp_db_path, "plain"),
        Schema(dimensions=[Dimension("k", 100)], values=[Value("v")]),
    )
    with db.begin() as t:
        t.add_dataframe(spark.createDataFrame([(1, 10)], "k long, v long"))
        t.commit()
    jobs, snap = _jobs_in_group(spark, "r4-noinfer-plain", lambda: db.snapshot())
    assert jobs == []
    assert snap.collect()[0].v == 10
