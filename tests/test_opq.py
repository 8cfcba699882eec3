"""OPQ rotation (operators/opq.py — Ge et al., CVPR 2013; r6 verdict
item 2).

The teeth: on data whose correlation structure straddles PQ block
boundaries, the learned rotation must (a) be orthogonal to machine
precision, (b) monotonically reduce quantization error, and (c) beat
identity-rotation PQ at the SAME Lloyd budget — proving the gain comes
from the rotation, not the extra k-means steps. Plus orthogonal
invariance (rotation preserves norms/dots, so rotated-space cosine ==
original-space cosine) and the sidecar contiguity diagnostic.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from matdb_spark.operators.opq import (
    opq_ivfpq_topk_indexed,
    opq_train,
    read_opq_rotation,
    rotate_vectors,
    write_opq_ivfpq_index,
    write_opq_rotation,
)
from matdb_spark.operators.similarity import (
    _pq_train_iter,
    cosine_topk,
    pq_codebook_from_sample,
)


def _anisotropic_df(spark, n=1500, d=16, seed=7):
    """Latent decaying-variance axes mixed by a fixed dense rotation —
    variance deliberately straddles every PQ block boundary, the case
    OPQ exists for."""
    rng = np.random.RandomState(seed)
    Q, _ = np.linalg.qr(rng.randn(d, d))
    Z = rng.randn(n, d) * np.exp(-np.arange(d) / 3.0)
    X = Z @ Q.T
    return spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def aniso(spark):
    df = _anisotropic_df(spark)
    df.localCheckpoint()
    return df


def test_rotation_orthogonal_and_error_decreases(spark, aniso):
    cb0 = pq_codebook_from_sample(aniso, m=4, k=8, sample_mod=5)
    R, cb, mses = opq_train(aniso, cb0, iters=4)
    Rn = np.asarray(R)
    assert np.abs(Rn @ Rn.T - np.eye(len(R))).max() < 1e-12
    # trajectory non-increasing; final clearly below the
    # identity-rotation start
    assert all(a >= b - 1e-12 for a, b in zip(mses, mses[1:]))
    assert mses[-1] < 0.8 * mses[0]


def test_rotation_beats_identity_at_same_lloyd_budget(spark, aniso):
    """Same number of Lloyd iterations; the only difference is the
    learned rotation. OPQ must win on quantization error — the
    attribution teeth."""
    cb0 = pq_codebook_from_sample(aniso, m=4, k=8, sample_mod=5)
    iters = 4
    cb_pq = cb0
    for _ in range(iters):
        cb_pq, mse_pq, _n, _cs = _pq_train_iter(
            aniso, cb_pq, "vec_id", "embedding", normalize=True
        )
    from matdb_spark.operators.similarity import _unit

    u = _unit(aniso, [F.col("vec_id")], "embedding", "embedding")
    _R, _cb, mses = opq_train(u, cb0, iters=iters)
    # mse_pq is the error ENTERING iteration `iters` for plain PQ;
    # mses[-1] the same for OPQ (both trained iters-1 full rounds)
    assert mses[-1] < mse_pq * 0.9, (mses, mse_pq)


def test_rotation_preserves_cosine_ranking(spark, aniso):
    """Orthogonal invariance: exact cosine top-k over rotated vectors
    equals top-k over the originals (same neighbor sets)."""
    rng = np.random.RandomState(3)
    Q, _ = np.linalg.qr(rng.randn(16, 16))
    rot = rotate_vectors(aniso, Q.tolist())
    q = aniso.filter(F.col("vec_id") < 3)
    qrot = rotate_vectors(q, Q.tolist())
    a = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(aniso, q, k=5).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(rot, qrot, k=5).collect()
    }
    assert a == b


def test_opq_index_recall_floor_and_improvement(spark, aniso, tmp_db_path):
    """End-to-end: OPQ-rotated IVFADC index beats the identity-rotation
    IVFADC at the same (m, k, nprobe) on block-misaligned data."""
    import os

    from matdb_spark.operators.similarity import (
        ivfpq_topk_indexed,
        pq_codebook_from_residual_sample,
        write_ivfpq_index,
    )

    cents = aniso.filter(F.col("vec_id") % 301 == 0).select(
        (F.col("vec_id") / 301).cast("int").alias("cell_id"), "embedding"
    )
    q = aniso.filter(F.col("vec_id") < 10)
    exact = cosine_topk(aniso, q, k=10).select("query_id", "neighbor_id")

    p_opq = os.path.join(tmp_db_path, "opq_idx")
    write_opq_ivfpq_index(
        aniso, cents, p_opq, m=4, k=16, sample_mod=5, opq_iters=4
    )
    ap_opq = opq_ivfpq_topk_indexed(spark, p_opq, q, k=10, nprobe=3).select(
        "query_id", "neighbor_id"
    )
    hits_opq = ap_opq.join(exact, ["query_id", "neighbor_id"]).count()

    p_pq = os.path.join(tmp_db_path, "pq_idx")
    cb = pq_codebook_from_residual_sample(aniso, cents, m=4, k=16, sample_mod=5)
    write_ivfpq_index(aniso, cents, cb, p_pq, residual=True)
    ap_pq = ivfpq_topk_indexed(spark, p_pq, q, k=10, nprobe=3).select(
        "query_id", "neighbor_id"
    )
    hits_pq = ap_pq.join(exact, ["query_id", "neighbor_id"]).count()
    # clear-margin improvement is the claim under test (absolute
    # recall on this deliberately hard decaying-spectrum synthetic is
    # low for BOTH at m=4/nprobe=3; the gate-data floor lives in
    # q_ann_recall_opq, measured 0.78/0.76/0.65 vs ivfpq 0.72/0.71/0.62)
    assert hits_opq >= hits_pq + 5, (hits_opq, hits_pq)


def test_rotation_sidecar_contiguity_diagnostic(spark, tmp_db_path):
    import os

    p = os.path.join(tmp_db_path, "idx")
    spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0])], "i INT, row ARRAY<DOUBLE>"
    ).write.parquet(p + "/_opq")
    with pytest.raises(ValueError, match=r"missing \[1\]"):
        read_opq_rotation(spark, p)


def test_rotation_sidecar_roundtrip(spark, tmp_db_path):
    import os

    p = os.path.join(tmp_db_path, "idx2")
    os.makedirs(p, exist_ok=True)
    R = np.linalg.qr(np.random.RandomState(0).randn(8, 8))[0].tolist()
    write_opq_rotation(spark, p, R)
    back = read_opq_rotation(spark, p)
    assert np.allclose(np.asarray(back), np.asarray(R), atol=0)


def test_sampled_training_generalizes(spark, aniso):
    """Rotation + codebook trained on a deterministic subsample must
    still clearly beat the identity-rotation start when evaluated —
    the corpus-scale deployment shape (train on sample, encode all)."""
    from matdb_spark.operators.similarity import _unit, pq_quantization_error

    cb0 = pq_codebook_from_sample(aniso, m=4, k=8, sample_mod=5)
    u = _unit(aniso, [F.col("vec_id")], "embedding", "embedding")
    R, cb, mses = opq_train(u, cb0, iters=4, sample_mod=3)
    Rn = np.asarray(R)
    assert np.abs(Rn @ Rn.T - np.eye(len(R))).max() < 1e-12
    # evaluate the SAMPLE-trained (R, cb) on the FULL corpus
    rot_full = rotate_vectors(u, R, "embedding")
    err_full = pq_quantization_error(rot_full, cb, normalize=False)
    # identity-rotation baseline at the same Lloyd budget, full data
    cb_pq = cb0
    for _ in range(4):
        cb_pq, mse_pq, _n, _cs = _pq_train_iter(
            aniso, cb_pq, "vec_id", "embedding", normalize=True
        )
    assert err_full < mse_pq * 0.95, (err_full, mse_pq)
