"""ANN retrieval-quality gates (q_ann_recall / q_ann_recall_ivfpq).

The recall gates' value is the FLOOR: these tests prove the floor has
teeth (it fails under a degraded probe budget) and that the residual
(IVFADC) encoding beats raw-vector codes where its premise holds —
clustered data, where the coarse quantizer removes real structure.
"""

import pyspark.sql.functions as F
import pytest


def _recall_hits(exact_pairs, approx_pairs):
    return len(exact_pairs & approx_pairs)


def test_recall_floor_has_teeth(spark):
    """The q_ann_recall gate asserts mean recall@10 >= 0.7 at the
    scaled probe budget (max(6, ceil(ncells/2))). At nprobe=1 the same
    index falls BELOW the floor (measured 46/100 at sf0.001) — i.e.
    the floor is a real constraint on probe quality, not a
    tautology."""
    from matdb_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        scaled_nprobe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    npr = scaled_nprobe(cents.count())
    good = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, cents, k=10, nprobe=npr).collect()
    }
    degraded = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, cents, k=10, nprobe=1).collect()
    }
    n = len(exact)
    assert _recall_hits(exact, good) / n >= 0.7  # the gate's floor holds
    assert _recall_hits(exact, degraded) / n < 0.7  # ...and can fail


def test_scaled_nprobe_formula():
    from matdb_spark.operators.similarity import scaled_nprobe

    assert scaled_nprobe(5) == 6  # floor dominates at small ncells
    assert scaled_nprobe(20) == 10  # half the cells at sf0.1 scale
    assert scaled_nprobe(1000) == 500  # fraction holds as corpus grows
    assert scaled_nprobe(13) == 7  # ceil, not floor


def test_gated_recall_frames_report_floor(spark):
    """Both gated recall queries must emit one row per query with the
    floor verdict TRUE at the gate parameters."""
    import __spark_entry__ as E

    for q in ("q_ann_recall", "q_ann_recall_ivfpq", "q_ann_recall_refined"):
        rows = E.queries()[q](spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 10, q
        assert all(r["mean_floor_met"] for r in rows), q
        assert all(0 <= r["hits"] <= 10 for r in rows), q


@pytest.fixture(scope="module")
def clustered(spark):
    """600 vectors in 10 tight clusters — deterministic (seeded numpy)
    data where the IVF cells capture real structure, so residuals are
    the informative remainder IVFADC's premise is about."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(10, 64)
    rows = []
    for i in range(600):
        v = centers[i % 10] + rng.randn(64) * 0.15
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_residual_beats_raw_on_clustered(spark, clustered, tmp_path_factory):
    """At equal m/k/nprobe, residual (IVFADC) codes must retrieve at
    least as well as raw-vector codes on clustered data (measured
    22 vs 18 hits of 100 with the deterministic fixture)."""
    import os

    from matdb_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk_indexed,
        pq_codebook_from_residual_sample,
        pq_codebook_from_sample,
        write_ivfpq_index,
    )

    emb = clustered
    cents = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    base = str(tmp_path_factory.mktemp("ivfadc"))

    def hits(path, cb, residual):
        write_ivfpq_index(emb, cents, cb, path, residual=residual)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk_indexed(
                spark, path, queries, k=10, nprobe=2
            ).collect()
        }
        return _recall_hits(exact, got)

    raw_hits = hits(
        os.path.join(base, "raw"),
        pq_codebook_from_sample(emb, m=8, k=16, sample_mod=7),
        residual=False,
    )
    res_hits = hits(
        os.path.join(base, "res"),
        pq_codebook_from_residual_sample(emb, cents, m=8, k=16, sample_mod=7),
        residual=True,
    )
    assert res_hits >= raw_hits, (res_hits, raw_hits)
    assert res_hits > 0


def test_kmeans_report_invariants(spark):
    """The gated centroid trainer: objective (mean best-cosine) never
    decreases, three iterations beat the seed, the assignment checksum
    is reproducible, and the trained centroids agree with the original
    kmeans_centroids loop (same assignment rule, same means — only
    float association differs between the two aggregation paths)."""
    from matdb_spark.operators.similarity import (
        kmeans_centroids,
        kmeans_centroids_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, objs, n, cell_sum = kmeans_centroids_report(emb, k=4, iters=2)
    assert n == emb.count()
    assert cell_sum > 0
    for prev, cur in zip(objs, objs[1:]):
        assert cur >= prev * (1.0 - 1e-9), objs
    # same run → identical checksum (determinism)
    _, objs2, _, cell_sum2 = kmeans_centroids_report(emb, k=4, iters=2)
    assert cell_sum2 == cell_sum and objs2 == objs
    # agrees with the original loop's centroids up to association noise
    ref = {
        r["cell_id"]: list(r["embedding"])
        for r in kmeans_centroids(emb, k=4, iters=2).collect()
    }
    got = {r["cell_id"]: list(r["embedding"]) for r in cents.collect()}
    assert set(got) == set(ref)
    for c in ref:
        for a, b in zip(got[c], ref[c]):
            assert abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


def test_ivfpq_append_and_purge_lifecycle(spark, clustered, tmp_path_factory):
    """The IVF-PQ standing-index lifecycle: an appended batch lands
    bit-identically to a full build (same sidecars), and purge removes
    vectors while preserving both sidecars."""
    import os

    from matdb_spark.operators.similarity import (
        append_ivfpq_index,
        pq_codebook_from_residual_sample,
        purge_ivfpq_index,
        write_ivfpq_index,
    )

    emb = clustered
    cents = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    cb = pq_codebook_from_residual_sample(emb, cents, m=8, k=16, sample_mod=7)
    base = str(tmp_path_factory.mktemp("ivfpq_life"))
    full, inc = os.path.join(base, "full"), os.path.join(base, "inc")
    write_ivfpq_index(emb, cents, cb, full, residual=True)
    write_ivfpq_index(
        emb.filter(F.col("vec_id") % 3 != 0), cents, cb, inc, residual=True
    )
    append_ivfpq_index(spark, emb.filter(F.col("vec_id") % 3 == 0), inc)

    def rows(p):
        return {
            (r["vec_id"], r["cell_id"], tuple(r["codes"]))
            for r in spark.read.parquet(p).collect()
        }

    assert rows(inc) == rows(full)  # appends land bit-identically

    before, after = purge_ivfpq_index(spark, inc, [0, 1, 2])
    assert (before, after) == (600, 597)
    assert spark.read.parquet(inc).filter(F.col("vec_id") < 3).count() == 0
    # sidecars preserved byte-for-byte through the swap
    assert spark.read.parquet(inc + "/_centroids").count() == 10
    assert spark.read.parquet(inc + "/_codebook").count() == 8 * 16


def test_pq_train_invariants(spark):
    """The trainer gate's two invariants, exercised directly: Lloyd
    iterations never increase the quantization error, and three
    iterations land strictly below the sample-codebook baseline."""
    from matdb_spark.operators.similarity import (
        pq_codebook_from_sample,
        pq_quantization_error,
        pq_train_kmeans,
    )

    from matdb_spark.operators.similarity import pq_train_kmeans_report

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = pq_codebook_from_sample(emb, m=8, k=16, sample_mod=31)
    errors = [pq_quantization_error(emb, cb)]
    for _ in range(3):
        cb = pq_train_kmeans(emb, cb, iters=1)
        errors.append(pq_quantization_error(emb, cb))
    for prev, cur in zip(errors, errors[1:]):
        assert cur <= prev * (1.0 + 1e-9), errors
    assert errors[-1] < errors[0], errors

    # the gate's one-job-per-iteration byproduct trajectory agrees
    # with the standalone error scans (associativity noise only) and
    # lands on the identical trained codebook
    cb0 = pq_codebook_from_sample(emb, m=8, k=16, sample_mod=31)
    cb_rep, rep_errors, n_vectors, init_code_sum = pq_train_kmeans_report(
        emb, cb0, iters=3
    )
    assert n_vectors == emb.count()
    assert init_code_sum > 0
    assert len(rep_errors) == 4
    for a, b in zip(rep_errors, errors):
        assert abs(a - b) <= 1e-9 * max(abs(a), abs(b)), (rep_errors, errors)
    assert cb_rep == cb


def test_lsh_recall_floor_has_teeth(spark):
    """q_ann_recall_lsh gates mean recall@10 >= 0.6 for the 8-table
    x 3-plane OR-amplified construction (measured 0.83 at sf0.001).
    A SINGLE table of the same 3 planes collapses to ~0.22 — BELOW
    the floor — i.e. the gate certifies the amplification, not the
    mere presence of a bucketer."""
    from matdb_spark.operators.similarity import cosine_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }

    def mean_hits(tables):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(
                emb, queries, k=10, planes_per_table=3, tables=tables, dim=64
            ).collect()
        }
        return len(exact & approx) / 10  # 10 queries -> mean hits

    assert mean_hits(8) >= 6.0
    assert mean_hits(1) < 6.0
