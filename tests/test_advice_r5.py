"""Round-6 fixes for the round-5 ADVICE findings.

1. resolve_clusters must honor 'ties to the lowest id' for STRING doc
   ids (the old -id tie-break NULLed/errored on strings).
2. lsh_topk_indexed must return an empty (typed) frame for an empty or
   all-zero-norm query set, and its partition predicate must be a
   compact struct-IN, not an OR-chain.
3. simhash_pairs must use every fingerprint bit when bands does not
   divide 60 (remainder folds into the last band) and reject bad bands.
"""

import pytest
from pyspark.sql import functions as F

from matdb_spark.operators.dedup import resolve_clusters, simhash_pairs
from matdb_spark.operators.similarity import (
    lsh_topk_indexed,
    write_lsh_index,
)


def test_resolve_clusters_string_ids_tie_lowest(spark):
    # two clusters; quality ties inside each -> canonical must be the
    # LOWEST id lexicographically, deterministically, for string ids
    docs = spark.createDataFrame(
        [("docB", 5), ("docA", 5), ("docC", 3), ("zz", 7), ("aa", 7)],
        "doc_id string, qm int",
    )
    pairs = spark.createDataFrame(
        [("docA", "docB"), ("docB", "docC"), ("aa", "zz")],
        "id_a string, id_b string",
    )
    out = {
        r["doc_id"]: (r["canonical_id"], r["kept"])
        for r in resolve_clusters(docs, pairs, "doc_id", "qm").collect()
    }
    # cluster {docA, docB, docC}: max quality 5 tied between A and B -> docA
    assert out["docA"] == ("docA", True)
    assert out["docB"] == ("docA", False)
    assert out["docC"] == ("docA", False)
    # cluster {aa, zz}: tie at 7 -> aa
    assert out["aa"] == ("aa", True)
    assert out["zz"] == ("aa", False)


def test_resolve_clusters_numeric_ids_unchanged(spark):
    docs = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 1)], "doc_id long, qm int"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_clusters(docs, pairs, "doc_id", "qm").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


@pytest.fixture()
def lsh_index(spark, tmp_path_factory):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path_factory.mktemp("lshidx") / "idx")
    write_lsh_index(vecs, path, planes_per_table=4, tables=3, dim=8, seed=11)
    return path


def test_lsh_topk_indexed_empty_queries(spark, lsh_index):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = lsh_topk_indexed(spark, lsh_index, empty, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "neighbor_id",
        "cos_sim",
        "rank",
    ]


def test_lsh_topk_indexed_zero_norm_queries(spark, lsh_index):
    zq = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    out = lsh_topk_indexed(spark, lsh_index, zq, k=5)
    assert out.count() == 0


def test_lsh_topk_indexed_still_answers(spark, lsh_index):
    import random

    rng = random.Random(3)
    q = spark.createDataFrame(
        [(100, [rng.uniform(-1, 1) for _ in range(8)])],
        "vec_id long, embedding array<double>",
    )
    out = lsh_topk_indexed(spark, lsh_index, q, k=5).collect()
    assert 1 <= len(out) <= 5
    assert all(r["query_id"] == 100 for r in out)


def _sim_docs(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog number %d" % (i % 4))
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_pairs_bands_nondivisor_matches_exact(spark):
    docs = _sim_docs(spark)
    # bands=7 (60 % 7 == 4): remainder bits fold into the last band.
    # Any pair with hamming < bands MUST still surface (pigeonhole),
    # and results verify by exact hamming so the sets at generous
    # max_hamming should match a divisor banding.
    got7 = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, "doc_id", "text", bands=7, max_hamming=6).collect()
    }
    got6 = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, "doc_id", "text", bands=6, max_hamming=6).collect()
    }
    # identical docs (hamming 0) must be in both
    assert got6 <= got7 or got7 <= got6 or (got6 & got7)
    zero_pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, "doc_id", "text", bands=7, max_hamming=0).collect()
    }
    # 30 docs in 4 identical-text groups -> every within-group pair
    expect = set()
    groups = {}
    for i in range(30):
        groups.setdefault(i % 4, []).append(i)
    for g in groups.values():
        for x in range(len(g)):
            for y in range(x + 1, len(g)):
                expect.add((g[x], g[y]))
    assert zero_pairs == expect


def test_simhash_pairs_rejects_bad_bands(spark):
    docs = _sim_docs(spark)
    with pytest.raises(ValueError):
        simhash_pairs(docs, "doc_id", "text", bands=0)
    with pytest.raises(ValueError):
        simhash_pairs(docs, "doc_id", "text", bands=61)
