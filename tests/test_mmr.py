"""MMR re-ranking (operators/similarity.mmr_rerank): duplicate demotion,
lambda limits, tie-breaks, replay parity of the Spark plumbing, and
composition with brute-force retrieval on the embeddings fixture."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.similarity import (
    brute_force_topk,
    mmr_rerank,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "qid bigint, nid bigint, relevance double, embedding array<double>"
    )


def test_duplicate_hit_is_demoted(spark):
    rows = [
        (1, 10, 0.90, [1.0, 0.0]),
        (1, 11, 0.89, [1.0, 0.0]),  # near-identical to 10
        (1, 12, 0.50, [0.0, 1.0]),  # novel
    ]
    out = mmr_rerank(_df(spark, rows), k=3, lam=0.7).collect()
    order = [r.nid for r in sorted(out, key=lambda r: r.mmr_rank)]
    # relevance order would be 10, 11, 12; MMR demotes the duplicate 11
    assert order == [10, 12, 11]
    by_doc = {r.nid: r for r in out}
    assert by_doc[10].novelty_penalty == 0.0
    assert by_doc[11].novelty_penalty == 1.0


def test_lambda_one_is_relevance_order(spark):
    rows = [
        (1, 10, 0.3, [1.0, 0.0]),
        (1, 11, 0.9, [1.0, 0.0]),
        (1, 12, 0.6, [0.0, 1.0]),
    ]
    out = mmr_rerank(_df(spark, rows), k=3, lam=1.0).collect()
    order = [r.nid for r in sorted(out, key=lambda r: r.mmr_rank)]
    assert order == [11, 12, 10]


def test_ties_break_by_doc_id(spark):
    rows = [
        (1, 20, 0.5, [1.0, 0.0]),
        (1, 10, 0.5, [1.0, 0.0]),
    ]
    out = mmr_rerank(_df(spark, rows), k=2, lam=0.7).collect()
    assert [r.nid for r in sorted(out, key=lambda r: r.mmr_rank)] == [10, 20]


def test_k_truncates_per_query(spark):
    rows = [(1, d, 1.0 - d * 0.01, [float(d % 3), 1.0]) for d in range(10, 20)]
    rows += [(2, d, 0.5, [1.0, float(d)]) for d in range(30, 34)]
    out = mmr_rerank(_df(spark, rows), k=3, lam=0.5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append(r.mmr_rank)
    assert sorted(per_q[1]) == [1, 2, 3]
    assert sorted(per_q[2]) == [1, 2, 3]


def _replay(rows, k, lam):
    """Same greedy, same numpy ops, driver-side — pins the Spark plumbing
    (grouping, ordering, schema) around the kernel."""
    out = {}
    for q in sorted({r[0] for r in rows}):
        cand = sorted([r for r in rows if r[0] == q], key=lambda r: r[1])
        v = np.array([np.asarray(r[3], dtype=np.float64) for r in cand])
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0.0] = 1.0
        rel = np.array([r[2] for r in cand])
        selected, remaining, pens = [], list(range(len(cand))), []
        while remaining and len(selected) < k:
            best = best_score = best_pen = None
            for i in remaining:
                if selected:
                    sims = (v[selected] @ v[i]) / (norms[selected] * norms[i])
                    pen = float(np.max(sims))
                else:
                    pen = 0.0
                score = lam * float(rel[i]) - (1.0 - lam) * pen
                if best is None or score > best_score:
                    best, best_score, best_pen = i, score, pen
            selected.append(best)
            pens.append(best_pen)
            remaining.remove(best)
        for rank, (i, p) in enumerate(zip(selected, pens), start=1):
            out[(q, cand[i][1])] = (rank, round(p, 6))
    return out


def test_replay_parity_seeded(spark):
    rng = np.random.default_rng(7)
    rows = []
    for q in range(4):
        for d in range(12):
            rows.append(
                (
                    q,
                    100 + d,
                    float(round(rng.uniform(), 3)),
                    [float(x) for x in rng.normal(size=8)],
                )
            )
    got = {
        (r.qid, r.nid): (r.mmr_rank, r.novelty_penalty)
        for r in mmr_rerank(_df(spark, rows), k=6, lam=0.6).collect()
    }
    assert got == _replay(rows, k=6, lam=0.6)


def test_composes_with_brute_force_retrieval(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    topk = brute_force_topk(emb, emb.filter("vec_id < 3"), k=15)
    cands = topk.join(
        emb.select(F.col("vec_id").alias("nid"), "embedding"), "nid"
    ).select("qid", "nid", F.col("cosine_sim").alias("relevance"), "embedding")
    out = mmr_rerank(cands, k=5, lam=0.5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append(r)
    assert set(per_q) == {0, 1, 2}
    for q, rs in per_q.items():
        assert sorted(r.mmr_rank for r in rs) == [1, 2, 3, 4, 5]
        assert all(-1.0 <= r.novelty_penalty <= 1.0 for r in rs)
        # rank 1 is the plain top relevance hit
        top = min(rs, key=lambda r: r.mmr_rank)
        assert top.relevance == max(r.relevance for r in rs)
