"""Deterministic negative sampling for contrastive pairs
(operators/sampling.negative_samples): never emits a positive, never
emits duplicates, fills k when the corpus allows, is bit-deterministic
across partitionings, and spreads picks across the corpus (no
single-doc degeneracy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.sampling import (
    negative_samples,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

K = 4


def _fixture(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.select("doc_id")
    # every 10th doc queries; its positive is its own doc plus a neighbor
    pos = docs.filter("doc_id % 10 = 0").selectExpr(
        "doc_id AS q_id", "doc_id AS doc"
    ).unionByName(
        docs.filter("doc_id % 10 = 0").selectExpr(
            "doc_id AS q_id", "doc_id + 1 AS doc"
        )
    )
    return corpus, pos


def test_no_positive_ever_sampled_and_k_filled(spark):
    corpus, pos = _fixture(spark)
    neg = negative_samples(pos, corpus, k=K).collect()
    positives = {(r["q_id"], r["doc"]) for r in pos.collect()}
    by_q: dict = {}
    for r in neg:
        assert (r["q_id"], r["doc_id"]) not in positives
        by_q.setdefault(r["q_id"], []).append((r["neg_rank"], r["doc_id"]))
    n_queries = pos.select("q_id").distinct().count()
    assert len(by_q) == n_queries
    for q, picks in by_q.items():
        ranks = sorted(r for r, _ in picks)
        assert ranks == list(range(1, K + 1)), (q, ranks)  # corpus is ample
        ids = [d for _, d in picks]
        assert len(set(ids)) == len(ids), (q, ids)  # no duplicate negatives


def test_deterministic_across_partitionings(spark):
    corpus, pos = _fixture(spark)
    a = negative_samples(pos, corpus, k=K)
    b = negative_samples(
        pos.repartition(7), corpus.repartition(13), k=K, n_buckets=31
    )
    # same n_buckets -> identical picks regardless of layout
    a2 = negative_samples(pos, corpus, k=K, n_buckets=31)
    assert {tuple(r) for r in a2.collect()} == {tuple(r) for r in b.collect()}
    # and the default-bucket run is self-consistent
    assert {tuple(r) for r in a.collect()} == {
        tuple(r) for r in negative_samples(pos, corpus, k=K).collect()
    }


def test_picks_spread_over_corpus(spark):
    corpus, pos = _fixture(spark)
    neg = negative_samples(pos, corpus, k=K)
    n_queries = pos.select("q_id").distinct().count()
    distinct_docs = neg.select("doc_id").distinct().count()
    # 50 queries x 4 picks from a 500-doc corpus: a healthy draw uses
    # far more than a handful of docs
    assert distinct_docs >= n_queries, distinct_docs


def test_exhausted_corpus_returns_fewer(spark):
    corpus = spark.range(3).select(F.col("id").alias("doc_id"))
    pos = spark.createDataFrame(
        [(1, 0), (1, 1)], "q_id int, doc int"
    )
    neg = negative_samples(pos, corpus, k=K, margin=4).collect()
    ids = {r["doc_id"] for r in neg}
    assert ids <= {2}  # only one non-positive doc exists
    assert all(r["neg_rank"] == 1 for r in neg)
