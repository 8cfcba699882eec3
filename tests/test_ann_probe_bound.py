"""VERDICT r5 item 2: the ANN driver-side probe bound is ENFORCED.

The driver-LUT ADC paths (pq_adc_topk, ivfpq_topk_indexed) collect the
query relation; past ``max_driver_queries`` they must RAISE instead of
silently bottlenecking the driver, and ``distributed=True`` must give a
bit-identical answer with the LUT computed JVM-side and joined.
"""

import os

import pytest
from pyspark.sql import functions as F

from matdb_spark.operators.similarity import (
    ivfpq_topk_indexed,
    pq_adc_topk,
    pq_codebook_from_sample,
    pq_codebook_from_residual_sample,
    pq_encode,
    write_ivfpq_index,
)
from matdb_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


@pytest.fixture(scope="module")
def cb(spark, emb):
    return pq_codebook_from_sample(emb, m=8, k=16)


def _key(rows):
    return sorted((r["query_id"], r["neighbor_id"], r["approx_sim"], r["rank"]) for r in rows)


def test_pq_adc_topk_over_cap_raises(spark, emb, cb):
    codes = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 10)
    with pytest.raises(ValueError, match="max_driver_queries"):
        pq_adc_topk(codes, queries, cb, k=5, max_driver_queries=3)


def test_pq_adc_topk_distributed_matches_driver(spark, emb, cb):
    codes = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 10)
    drv = _key(pq_adc_topk(codes, queries, cb, k=5).collect())
    dist = _key(pq_adc_topk(codes, queries, cb, k=5, distributed=True).collect())
    assert dist == drv  # exact, bit-identical approx_sim included


def test_pq_adc_topk_distributed_ignores_cap(spark, emb, cb):
    codes = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 10)
    out = pq_adc_topk(
        codes, queries, cb, k=5, max_driver_queries=3, distributed=True
    )
    assert out.count() == 50


@pytest.fixture(scope="module")
def ivfpq_paths(spark, emb, cb, tmp_path_factory):
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    raw = os.path.join(str(tmp_path_factory.mktemp("ivfpqbound")), "raw")
    write_ivfpq_index(emb, cents, cb, raw, residual=False)
    rcb = pq_codebook_from_residual_sample(emb, cents, m=8, k=16)
    res = os.path.join(str(tmp_path_factory.mktemp("ivfpqbound")), "res")
    write_ivfpq_index(emb, cents, rcb, res, residual=True)
    return raw, res


def test_ivfpq_over_cap_raises(spark, emb, ivfpq_paths):
    raw, _ = ivfpq_paths
    queries = emb.filter(F.col("vec_id") < 10)
    with pytest.raises(ValueError, match="max_driver_queries"):
        ivfpq_topk_indexed(spark, raw, queries, k=5, max_driver_queries=3)


@pytest.mark.parametrize("which", ["raw", "res"])
def test_ivfpq_distributed_matches_driver(spark, emb, ivfpq_paths, which):
    path = ivfpq_paths[0] if which == "raw" else ivfpq_paths[1]
    queries = emb.filter(F.col("vec_id") < 10)
    drv = _key(ivfpq_topk_indexed(spark, path, queries, k=5, nprobe=2).collect())
    dist = _key(
        ivfpq_topk_indexed(
            spark, path, queries, k=5, nprobe=2, distributed=True
        ).collect()
    )
    assert dist == drv


def test_ivfpq_distributed_prunes_partitions(spark, emb, ivfpq_paths):
    from matdb_spark.plans.inspect import partition_filters

    raw, _ = ivfpq_paths
    queries = emb.filter(F.col("vec_id") == 3)
    out = ivfpq_topk_indexed(spark, raw, queries, k=5, nprobe=2, distributed=True)
    pf = " ".join(partition_filters(out))
    assert "cell_id" in pf and ("IN" in pf or "isin" in pf.lower()), pf


def test_ivf_and_lsh_indexed_over_cap_raise(spark, emb, tmp_path_factory):
    from matdb_spark.operators.similarity import (
        ivf_topk_indexed,
        lsh_topk_indexed,
        write_ivf_index,
        write_lsh_index,
    )

    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    base = str(tmp_path_factory.mktemp("annbound"))
    ivf = os.path.join(base, "ivf")
    lsh = os.path.join(base, "lsh")
    write_ivf_index(emb, cents, ivf)
    write_lsh_index(emb, lsh, planes_per_table=3, tables=4, dim=64)
    queries = emb.filter(F.col("vec_id") < 10)
    with pytest.raises(ValueError, match="max_driver_queries"):
        ivf_topk_indexed(spark, ivf, queries, k=5, max_driver_queries=3)
    with pytest.raises(ValueError, match="max_driver_queries"):
        lsh_topk_indexed(spark, lsh, queries, k=5, max_driver_queries=3)
    # within the cap both answer
    assert ivf_topk_indexed(spark, ivf, queries, k=5).count() > 0
    assert lsh_topk_indexed(spark, lsh, queries, k=5).count() > 0
