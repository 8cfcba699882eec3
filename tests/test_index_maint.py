"""compact_index: append debris collapses, content and probe results
are byte-identical before/after, sidecars survive."""
import os
import shutil

from pyspark.sql import functions as F

from matdb_spark.operators.dedup import (
    append_minhash_index,
    pairs_against_index,
    write_minhash_index,
)
from matdb_spark.operators.index_maint import compact_ivf_index, compact_minhash_index
from matdb_spark.operators.similarity import (
    append_ivf_index,
    ivf_topk_indexed,
    write_ivf_index,
)
from matdb_spark.sources.tables import load_table

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)
SF = "/root/testdata/sf0.001"


def test_compact_minhash_index(spark):
    path = os.path.join(SCRATCH, "maint_mh")
    shutil.rmtree(path, ignore_errors=True)
    docs = [(i, f"alpha beta gamma delta epsilon zeta doc {i} tail {i*7}") for i in range(40)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    write_minhash_index(mk(docs[:10]), path, "doc_id", "text")
    for lo in (10, 20, 30):  # three appended batches -> small-file debris
        append_minhash_index(mk(docs[lo : lo + 10]), path, "doc_id", "text")
    batch = mk([(100, docs[5][1])])
    before_pairs = sorted(
        map(tuple, pairs_against_index(spark, path, batch, "doc_id", "text").collect())
    )
    content_before = sorted(map(tuple, spark.read.parquet(path).collect()))
    nb, na = compact_minhash_index(spark, path)
    assert na < nb, f"compaction did not reduce files ({nb} -> {na})"
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == content_before
    after_pairs = sorted(
        map(tuple, pairs_against_index(spark, path, batch, "doc_id", "text").collect())
    )
    assert after_pairs == before_pairs and (100, 5) in after_pairs


def test_compact_ivf_index_preserves_probe_and_centroids(spark):
    path = os.path.join(SCRATCH, "maint_ivf")
    shutil.rmtree(path, ignore_errors=True)
    emb = load_table(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    write_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), cents, path)
    append_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 1), path)
    q = emb.filter(F.col("vec_id") < 3)
    before = sorted(map(tuple, ivf_topk_indexed(spark, path, q, k=3, nprobe=2).collect()))
    cents_before = sorted(map(tuple, spark.read.parquet(path + "/_centroids").collect()))
    nb, na = compact_ivf_index(spark, path)
    assert na < nb
    assert sorted(map(tuple, ivf_topk_indexed(spark, path, q, k=3, nprobe=2).collect())) == before
    assert sorted(map(tuple, spark.read.parquet(path + "/_centroids").collect())) == cents_before


def test_purge_minhash_index_stops_shadowing(spark):
    from matdb_spark.operators.dedup import admit_batch
    from matdb_spark.operators.index_maint import purge_minhash_index

    path = os.path.join(SCRATCH, "maint_purge")
    shutil.rmtree(path, ignore_errors=True)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    text = "the quick brown fox jumps over the lazy dog tonight"
    admit_batch(spark, path, mk([(1, text)]), "doc_id", "text")
    # near-dup of admitted doc 1 -> rejected
    assert admit_batch(spark, path, mk([(2, text)]), "doc_id", "text", append=False).count() == 0
    before, after = purge_minhash_index(spark, path, [1])
    assert after < before
    # doc 1 forgotten: the same content is admittable again
    got = [r["doc_id"] for r in admit_batch(spark, path, mk([(3, text)]), "doc_id", "text").collect()]
    assert got == [3]


def test_purge_ivf_index(spark):
    from matdb_spark.operators.index_maint import purge_ivf_index

    path = os.path.join(SCRATCH, "maint_purge_ivf")
    shutil.rmtree(path, ignore_errors=True)
    emb = load_table(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") % 9 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    write_ivf_index(emb, cents, path)
    victims = [r["vec_id"] for r in emb.limit(5).collect()]
    before, after = purge_ivf_index(spark, path, victims)
    assert before - after == 5
    remaining = {r["vec_id"] for r in spark.read.parquet(path).select("vec_id").collect()}
    assert not (set(victims) & remaining)
    # probes still work and never return purged vectors
    q = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk_indexed(spark, path, q, k=3, nprobe=2)
    assert not ({r["neighbor_id"] for r in out.collect()} & set(victims))
