"""Similarity operators: k-means centroid building and IVF recall
against the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from matdb_spark.operators import similarity
from matdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_centroids_shapes(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_centroids(emb, k=4, iters=3)
    rows = cents.collect()
    assert 1 <= len(rows) <= 4
    assert all(len(r["embedding"]) == 64 for r in rows)
    # every corpus vector is assignable to exactly one cell
    cells = similarity.assign_cells(emb, cents)
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()


def test_ivf_recall_vs_exact(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") == 3)
    cents = similarity.kmeans_centroids(emb, k=4, iters=2)
    exact = similarity.cosine_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, cents, k=5, nprobe=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # nprobe=2 of 4 cells: expect >= half the exact neighbors found
    assert len(a & e) >= len(e) // 2


def test_persisted_ivf_index(spark, tmp_path_factory):
    import os
    from pyspark.sql import functions as F
    from matdb_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        write_ivf_index,
    )
    from matdb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    path = os.path.join(str(tmp_path_factory.mktemp("ivf")), "index")
    write_ivf_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id") == 3)

    live = ivf_topk(emb, queries, cents, k=5, nprobe=2)
    idx = ivf_topk_indexed(spark, path, queries, k=5, nprobe=2)
    as_set = lambda df: sorted(
        (r.query_id, r.neighbor_id, round(r.cos_sim, 9), r.rank) for r in df.collect()
    )
    assert as_set(idx) == as_set(live)

    # the probe reads only the probed cells' partition directories
    # (inputFiles() lists pre-pruning files, so inspect the plan)
    from matdb_spark.plans.inspect import partition_filters

    pf = " ".join(partition_filters(idx))
    assert "cell_id" in pf and ("IN" in pf or "isin" in pf.lower()), pf


def test_hyperplanes_deterministic():
    from matdb_spark.operators.similarity import hyperplanes

    a = hyperplanes(4, 8)
    b = hyperplanes(4, 8)
    assert a == b
    assert len(a) == 4 and all(len(p) == 8 for p in a)
    assert all(-1.0 <= x <= 1.0 for p in a for x in p)
    assert hyperplanes(4, 8, seed=99) != a


def test_hyperplane_lsh_pairs(spark):
    from pyspark.sql import functions as F
    from matdb_spark.operators.similarity import hyperplane_near_dup_pairs
    from matdb_spark.functions.vectors import cosine as cos_expr
    from matdb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    pairs = hyperplane_near_dup_pairs(emb, n_planes=6, threshold=0.25)
    rows = pairs.collect()
    assert rows, "expected some candidate pairs at 6 planes"
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.cos_sim >= 0.25 for r in rows)
    # LSH candidates are a SUBSET of the exact pairs at the threshold:
    # every reported pair must verify against the exact cosine.
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos_expr(F.col("ea"), F.col("eb")).alias("cos"))
        .filter(F.col("cos") >= 0.25)
    )
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    assert all((r.id_a, r.id_b) in exact_pairs for r in rows)


def test_zero_vector_and_degenerate_inputs(spark):
    """A single all-zero embedding (failed upstream encode) must not
    abort the job under ANSI mode: its unit vector is NULL, so it
    drops out of ranked results; empty/NULL-first corpora raise a
    clear error from the LSH path instead of TypeError."""
    import pytest

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = similarity.cosine_topk(corpus, queries, k=5).collect()
    assert [r["neighbor_id"] for r in got] == [1, 2]  # zero vec absent

    empty = corpus.limit(0)
    with pytest.raises(ValueError, match="empty"):
        similarity.hyperplane_near_dup_pairs(empty, n_planes=4)

    # include_self parity between exact and IVF paths
    cents = similarity.kmeans_centroids(corpus.filter("vec_id < 3"), k=1)
    exact = similarity.cosine_topk(
        corpus.filter("vec_id < 3"), corpus.filter("vec_id < 3"), k=3, include_self=True
    )
    approx = similarity.ivf_topk(
        corpus.filter("vec_id < 3"), corpus.filter("vec_id < 3"), cents,
        k=3, nprobe=1, include_self=True,
    )
    key = lambda rows: sorted((r["query_id"], r["neighbor_id"]) for r in rows)
    assert key(exact.collect()) == key(approx.collect())


def test_exact_duplicates_null_text_singletons(spark):
    """NULL-text docs must not cluster together."""
    from matdb_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "hello"), (4, "hello")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["canonical_id"], r["cluster_size"])
           for r in dedup.exact_duplicates(df, "doc_id", "text").collect()}
    assert got[1] == (1, 1) and got[2] == (2, 1)
    assert got[3] == (3, 2) and got[4] == (3, 2)


def test_append_ivf_index_matches_full_build(spark):
    """write(A) + append(B) must equal write(A+B) with the same
    centroids — file-set aside, identical (cell_id, vec_id, vector)
    content, so probes cannot tell the index was grown incrementally."""
    import os
    import shutil

    from matdb_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_indexed,
        write_ivf_index,
    )

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
    )
    emb = load_table(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    p_full = os.path.join(scratch, "ivf_append_full")
    p_incr = os.path.join(scratch, "ivf_append_incr")
    for p in (p_full, p_incr):
        shutil.rmtree(p, ignore_errors=True)
    write_ivf_index(emb, cents, p_full)
    write_ivf_index(emb.filter(F.col("vec_id") % 3 != 0), cents, p_incr)
    append_ivf_index(spark, emb.filter(F.col("vec_id") % 3 == 0), p_incr)

    def content(p):
        return {
            (r["cell_id"], r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
            for r in spark.read.parquet(p).collect()
        }

    assert content(p_incr) == content(p_full)
    q = emb.filter(F.col("vec_id") < 3)
    full = ivf_topk_indexed(spark, p_full, q, k=3, nprobe=2).collect()
    incr = ivf_topk_indexed(spark, p_incr, q, k=3, nprobe=2).collect()
    assert sorted(map(tuple, incr)) == sorted(map(tuple, full))


def test_pq_encode_matches_python_oracle(spark):
    import math

    from matdb_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = S.pq_codebook_from_sample(emb, m=8, k=16, sample_mod=31)
    assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8
    crows = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(emb, cb).collect()}
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}

    def enc(v):
        n = math.sqrt(sum(float(x) * float(x) for x in v))
        u = [float(x) / n for x in v]
        out = []
        for b in range(8):
            blk = u[b * 8 : (b + 1) * 8]
            d = [sum((x - y) * (x - y) for x, y in zip(blk, cb[b][j])) for j in range(16)]
            out.append(d.index(min(d)))
        return out

    for vid in (0, 1, 7, 100, 499):
        assert crows[vid] == enc(rows[vid])
    # encode plan: exchange-free scan
    plan = S.pq_encode(emb, cb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_pq_adc_scores_and_training_recall(spark):
    import pyspark.sql.functions as F

    from matdb_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    cb = S.pq_codebook_from_sample(emb, m=8, k=16)
    codes = S.pq_encode(emb, cb)
    top = S.pq_adc_topk(codes, queries, cb, k=5)
    rows = top.collect()
    assert len(rows) == 50
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["approx_sim"])
    assert all(sims == sorted(sims, reverse=True) for sims in per_q.values())

    def recall(cbx):
        c = S.pq_encode(emb, cbx)
        t = S.pq_adc_topk(c, queries, cbx, k=5)
        es = {(r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb, queries, k=5).collect()}
        ps = {(r["query_id"], r["neighbor_id"]) for r in t.collect()}
        return len(es & ps) / len(es)

    r0 = recall(cb)
    cb2 = S.pq_train_kmeans(emb, cb, iters=3)
    assert recall(cb2) >= r0  # Lloyd steps must not hurt recall here


def test_ivfpq_matches_pq_adc_on_probed_cells(spark, tmp_path_factory):
    """IVF-PQ composition: the persisted index must reproduce, for each
    query, exactly the PQ-ADC scores of the candidates in its probed
    cells — and the probe plan must prune to those cell partitions."""
    import os

    import pyspark.sql.functions as F

    from matdb_spark.operators.similarity import (
        assign_cells,
        ivfpq_topk_indexed,
        pq_adc_topk,
        pq_codebook_from_sample,
        pq_encode,
        read_pq_codebook,
        write_ivfpq_index,
    )
    from matdb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    cb = pq_codebook_from_sample(emb, m=8, k=16)
    path = os.path.join(str(tmp_path_factory.mktemp("ivfpq")), "index")
    # residual=False: this test's reference is raw pq_encode/pq_adc_topk
    write_ivfpq_index(emb, cents, cb, path, residual=False)
    # codebook round-trips through the _codebook parquet exactly
    assert read_pq_codebook(spark, path + "/_codebook") == cb

    queries = emb.filter(F.col("vec_id") == 3)
    got = {
        (r["query_id"], r["neighbor_id"]): r["approx_sim"]
        for r in ivfpq_topk_indexed(spark, path, queries, k=5, nprobe=2).collect()
    }
    assert len(got) == 5

    # reference: ADC over ONLY the probed cells' members, computed from
    # the live (non-indexed) composition
    cells = assign_cells(emb, cents)
    member_cells = {
        r["vec_id"]: r["cell_id"] for r in cells.select("vec_id", "cell_id").collect()
    }
    idx_rows = spark.read.parquet(path).select("vec_id", "cell_id").collect()
    assert {r["vec_id"]: r["cell_id"] for r in idx_rows} == member_cells
    codes = pq_encode(emb, cb)
    full = {
        (r["query_id"], r["neighbor_id"]): r["approx_sim"]
        for r in pq_adc_topk(codes, queries, cb, k=500).collect()
    }
    probed = {member_cells[n] for (_, n) in got}
    ref = sorted(
        ((q, n, s) for (q, n), s in full.items() if member_cells[n] in probed),
        key=lambda t: (-t[2], t[1]),
    )[:5]
    assert {(q, n): s for q, n, s in ref} == got

    # partition pruning reaches the scan
    from matdb_spark.plans.inspect import partition_filters

    out = ivfpq_topk_indexed(spark, path, queries, k=5, nprobe=2)
    pf = " ".join(partition_filters(out))
    assert "cell_id" in pf and ("IN" in pf or "isin" in pf.lower()), pf


def test_semantic_dedup_chain_greedy(spark):
    """SemDeDup keep rule on a similarity chain a-b-c inside one cell:
    sim(a,b) and sim(b,c) clear the threshold, sim(a,c) does not ->
    the lowest id survives and BOTH b and c are dropped (c's witness
    is the already-dropped b — documented greedy behavior). An
    isolated vector in another cell is always kept."""
    import math

    from matdb_spark.operators.similarity import semantic_dedup

    def vec(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # chain at ~0.95 pairwise (25 deg apart: cos 25 ~= 0.906; use 15
    # deg: cos 15 = 0.966, cos 30 = 0.866 -- threshold 0.9 splits them)
    rows = [
        (1, vec(0.0)),
        (2, vec(math.radians(15))),
        (3, vec(math.radians(30))),
        (9, [0.0, 0.0, 1.0, 0.0]),  # orthogonal -> its own cell
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, vec(math.radians(15))), (1, [0.0, 0.0, 1.0, 0.0])],
        "cell_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(emb, cents, threshold=0.9).collect()
    }
    assert got == {1: True, 2: False, 3: False, 9: True}


def test_lsh_index_lifecycle(spark, tmp_path):
    """write -> probe == live; append -> appended vectors surface
    under the STORED hash family; probe plan prunes (table, bucket)
    partitions."""
    import pyspark.sql.functions as F

    from matdb_spark.operators.similarity import (
        append_lsh_index,
        lsh_topk,
        lsh_topk_indexed,
        write_lsh_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 7 != 0)
    rest = emb.filter(F.col("vec_id") % 7 == 0)
    path = str(tmp_path / "lsh_index")
    write_lsh_index(first, path, planes_per_table=3, tables=8, dim=64)
    queries = emb.filter(F.col("vec_id") < 5)

    def key(df):
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos_sim"], 9))
            for r in df.collect()
        }

    got = key(lsh_topk_indexed(spark, path, queries, k=5))
    live = key(lsh_topk(first, queries, k=5, planes_per_table=3, tables=8, dim=64))
    assert got == live

    # append the held-out batch: the index now equals a full build
    append_lsh_index(spark, rest, path)
    got_all = key(lsh_topk_indexed(spark, path, queries, k=5))
    live_all = key(lsh_topk(emb, queries, k=5, planes_per_table=3, tables=8, dim=64))
    assert got_all == live_all
    assert got_all != got  # the append changed at least one top-5

    # partition pruning reaches the scan
    from matdb_spark.plans.inspect import partition_filters

    pf = " ".join(partition_filters(lsh_topk_indexed(spark, path, queries, k=5)))
    assert "table" in pf and "bucket" in pf, pf
