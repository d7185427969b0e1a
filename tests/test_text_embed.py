"""Hashed char-n-gram text embeddings (operators/text_embed.py): hash-replay
parity, unit norm, determinism, similarity signal on constructed near-dups,
and composition into the IVF,PQ ANN stack (the raw-text → embedding →
index → serve loop)."""

from __future__ import annotations

import hashlib
import math
import random

import pyspark.sql.functions as F
import pytest

from realtime_fraud_detection_spark.operators.similarity import (
    brute_force_topk,
    ivf_pq_topk,
)
from realtime_fraud_detection_spark.operators.text_embed import (
    hashed_text_embeddings,
)


def _py_embed(text: str, dim: int, gram: int = 3) -> list[float]:
    """Independent replay: normalize, n-gram, md5-hash, signed-accumulate,
    L2-normalize — mirrors the operator definition, not its code."""
    import re

    t = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    grams = (
        [t[i : i + gram] for i in range(max(1, len(t) - gram + 1))] if t else []
    )
    v = [0.0] * dim
    for g in grams:
        if not g:
            continue
        hx = hashlib.md5(g.encode()).hexdigest()
        h64 = int(hx[:16], 16)
        if h64 >= 1 << 63:
            h64 -= 1 << 64  # two's-complement signed
        d = h64 % dim  # Spark pmod = Python % for positive modulus
        sign = -1.0 if (h64 >> 32) & 1 else 1.0
        v[d] += sign
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n > 0 else v


def test_matches_python_replay(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs!"),
        (3, "Ab"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["emb"]
        for r in hashed_text_embeddings(df, dim=16, out_col="emb").collect()
    }
    for i, text in rows:
        want = _py_embed(text or "", 16)
        assert got[i] == pytest.approx(want, abs=1e-12), i


def test_unit_norm_and_zero_fallback(spark):
    df = spark.createDataFrame(
        [(1, "some reasonable document text"), (2, "  !!  ")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in hashed_text_embeddings(df).collect()}
    assert sum(x * x for x in out[1]) == pytest.approx(1.0, abs=1e-9)
    assert out[2] == [0.0] * 64  # normalized-empty doc → zero vector


def test_deterministic_across_runs(spark):
    from realtime_fraud_detection_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    a = sorted(
        (r["doc_id"], tuple(r["embedding"]))
        for r in hashed_text_embeddings(docs, dim=32).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["embedding"]))
        for r in hashed_text_embeddings(docs.repartition(7), dim=32).collect()
    )
    assert a == b  # bit-exact whatever the input partitioning


def _near_dup_corpus(n_pairs: int = 30, seed: int = 7):
    """Synthetic ground truth: n_pairs base docs + one near-dup each (10%
    word substitutions)."""
    rng = random.Random(seed)
    vocab = [f"word{i:03d}" for i in range(400)]
    rows = []
    for p in range(n_pairs):
        words = [rng.choice(vocab) for _ in range(60)]
        dup = list(words)
        for _ in range(6):
            dup[rng.randrange(len(dup))] = rng.choice(vocab)
        rows.append((2 * p, " ".join(words)))
        rows.append((2 * p + 1, " ".join(dup)))
    return rows


def test_near_dups_are_top_neighbors(spark):
    """The embedding must carry the n-gram-profile similarity signal: a
    doc's constructed near-dup is its top-1 cosine neighbor for >= 90% of
    docs (exact-brute-force over the hashed embeddings)."""
    rows = _near_dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_text_embeddings(df, dim=64).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top1 = brute_force_topk(emb, emb, k=1, id_col="vec_id").collect()
    hits = sum(1 for r in top1 if r["nid"] == (r["qid"] ^ 1))
    assert hits >= 0.9 * len(rows), f"{hits}/{len(rows)}"


def test_composes_into_ivf_pq(spark):
    """Raw text → hashed embedding → IVF,PQ index: recall@5 vs brute force
    on the same embeddings clears the honest-scan-fraction bar (16 cells,
    2 probes ≈ 1/8 of the corpus scanned; monotone pin, not an absolute)."""
    from realtime_fraud_detection_spark.sources.testdata import load_table

    docs = load_table(
        spark, "/root/testdata/sf0.001", "documents", fan_out=True
    ).select("doc_id", "text")
    emb = hashed_text_embeddings(docs, dim=64).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    emb = emb.localCheckpoint()  # two index builds below share the scan
    queries = emb.orderBy("vec_id").limit(8)
    want = {
        (r["qid"], r["nid"])
        for r in brute_force_topk(emb, queries, k=5, id_col="vec_id").collect()
    }
    got = {
        (r["qid"], r["nid"])
        for r in ivf_pq_topk(
            emb, queries, k=5, n_cells=16, n_probe=4, m=8, ks=16,
            rerank=16, id_col="vec_id",
        ).collect()
    }
    recall = len(want & got) / len(want)
    assert recall >= 0.5, recall
