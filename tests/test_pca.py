"""PCA pre-transform (operators/similarity.pca_fit / pca_project):
orthonormal sign-fixed basis, variance ordering, local-vs-distributed
parity, bit-determinism of the decimal distributed path, reconstruction
monotonicity, and the ANN-recall composition on the embeddings fixture."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import similarity as SIM
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").localCheckpoint()


@pytest.fixture(scope="module")
def fitted(emb):
    return SIM.pca_fit(emb, k=16)


def test_components_orthonormal_and_sign_fixed(fitted):
    mean, comps = fitted
    W = np.array(comps)
    assert W.shape == (16, 64)
    assert np.allclose(W @ W.T, np.eye(16), atol=1e-9)
    for w in W:
        assert w[int(np.argmax(np.abs(w)))] > 0


def test_projected_variance_matches_eigenvalues_and_descends(spark, emb, fitted):
    mean, comps = fitted
    X = np.array(
        [list(map(float, r.embedding)) for r in emb.collect()], dtype=np.float64
    )
    cov = np.cov(X, rowvar=False, bias=True)
    proj = SIM.pca_project(emb, mean, comps)
    P = np.array([list(r.pca) for r in proj.select("pca").collect()])
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1))
    expected = np.array([w @ cov @ np.array(w) for w in comps])
    assert np.allclose(var, expected, rtol=1e-6)


def test_local_vs_distributed_parity(emb, fitted):
    mean_l, comps_l = fitted
    # local_cells=0 forces the distributed decimal-aggregate path
    mean_d, comps_d = SIM.pca_fit(emb, k=16, local_cells=0)
    assert np.allclose(mean_l, mean_d, atol=1e-9)
    assert np.allclose(np.array(comps_l), np.array(comps_d), atol=1e-6)


def test_distributed_path_bit_deterministic(emb):
    a = SIM.pca_fit(emb, k=8, local_cells=0)
    b = SIM.pca_fit(emb.repartition(7), k=8, local_cells=0)
    assert a == b  # decimal sums are order-insensitive: bit-equal models


def test_reconstruction_error_decreases_with_k(emb):
    X = np.array(
        [list(map(float, r.embedding)) for r in emb.collect()], dtype=np.float64
    )
    errs = []
    for k in (4, 16, 32):
        mean, comps = SIM.pca_fit(emb, k=k)
        W = np.array(comps)
        Xc = X - np.array(mean)
        rec = (Xc @ W.T) @ W
        errs.append(float(((Xc - rec) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]


def test_ann_recall_after_projection(spark, emb):
    """The composition the operator exists for: brute-force top-10 in the
    projected space vs the exact 64-dim top-10. The FIXTURE's embeddings
    are near-isotropic (measured spectrum: top-16 components hold only
    38% of variance, top-48 86%), so recall tracks variance captured
    almost linearly — measured 0.17/0.29/0.49/0.69 at k=8/16/32/48. The
    pins are the monotone law plus floors well under those measurements
    (fixtures are redrawn each round — the round-7 recall-bar lesson);
    real embedding corpora have decaying spectra and sit far above this
    worst case."""
    exact = SIM.brute_force_topk(emb, emb.filter("vec_id < 20"), k=10)
    e = {(r.qid, r.nid) for r in exact.collect()}
    recalls = {}
    for k in (16, 48):
        mean, comps = SIM.pca_fit(emb, k=k)
        proj = SIM.pca_project(emb, mean, comps).select(
            "vec_id", F.col("pca").alias("embedding")
        )
        a = {
            (r.qid, r.nid)
            for r in SIM.brute_force_topk(
                proj, proj.filter("vec_id < 20"), k=10
            ).collect()
        }
        recalls[k] = len(e & a) / len(e)
    assert recalls[48] > recalls[16]
    assert recalls[16] >= 0.1, recalls
    assert recalls[48] >= 0.45, recalls


def test_bad_k_raises(emb):
    with pytest.raises(ValueError):
        SIM.pca_fit(emb, k=0)
    with pytest.raises(ValueError):
        SIM.pca_fit(emb, k=65)


def test_artifact_roundtrip(tmp_path, fitted):
    from realtime_fraud_detection_spark.functions.ann_io import (
        load_pca,
        save_pca,
    )

    mean, comps = fitted
    p = str(tmp_path / "pca.json")
    save_pca(mean, comps, p)
    assert load_pca(p) == (mean, comps)


def test_pca_then_pq_full_recipe(spark, emb, fitted):
    """The FAISS serving recipe end-to-end: PCA 64->16, PQ(m=4, ks=16)
    over the PROJECTED vectors, ADC search with exact re-rank in the
    projected space. Code scan cost: 4 bytes/vector vs 64 floats — a 64x
    reduction. Recall is bounded above by the PCA projection's own
    brute-force recall (the PQ stage can only lose candidates the
    projection kept), so the pin is relative: the composed recipe
    retains >= 70% of what exact search in the projected space finds."""
    mean, comps = fitted
    proj = SIM.pca_project(emb, mean, comps).select(
        "vec_id", F.col("pca").alias("embedding")
    ).localCheckpoint()
    q = proj.filter("vec_id < 20")
    proj_exact = {
        (r.qid, r.nid)
        for r in SIM.brute_force_topk(proj, q, k=10).collect()
    }
    pq = {
        (r.qid, r.nid)
        for r in SIM.pq_topk(proj, q, k=10, m=4, ks=16, rerank=4).collect()
    }
    retained = len(proj_exact & pq) / len(proj_exact)
    assert retained >= 0.7, retained
