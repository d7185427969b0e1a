"""One-vs-rest multiclass classifier (ml/text_classifier.train_one_vs_rest
/ score_one_vs_rest): head-equivalence to standalone binary training,
holdout accuracy on a 3-class weak rule, single-pass scoring, and
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.text_classifier import (
    score_one_vs_rest,
    train_logreg,
    train_one_vs_rest,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def _labeled(spark):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    lo = F.lower(F.col("text"))

    def c(w):
        return F.regexp_count(lo, F.lit(rf"\b{w}\b"))

    c1, c2, c3 = c("stream") + c("batch"), c("scan") + c("sort"), c("join") + c("merge")
    label = (
        F.when((c1 >= c2) & (c1 >= c3), "streamy")
        .when(c2 >= c3, "scany")
        .otherwise("joiny")
    )
    return docs.withColumn("label", label)


def test_heads_equal_standalone_binary_models(spark):
    docs = _labeled(spark).filter("doc_id < 200")
    models, feats = train_one_vs_rest(
        docs, "text", "doc_id", "label", n_buckets=256, iters=5, lr=5.0
    )
    assert sorted(models) == ["joiny", "scany", "streamy"]
    # each head must be EXACTLY the standalone binary training (shared
    # features, decimal sums, seeded adagrad -> bit-identical)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        (F.col("label") == "scany").cast("double").alias("y"),
    )
    solo = train_logreg(feats, labels, n_buckets=256, iters=5, lr=5.0, l2=0.0)
    assert solo.weights == models["scany"].weights
    assert solo.bias == models["scany"].bias


def test_heads_equal_standalone_binary_distributed(spark):
    """Same head-equivalence on the ABOVE-GATE path (local_cells=0 forces
    the distributed one-shuffle loop): the K-column shared-frame iteration
    must stay coordinate-wise identical to solo binary training."""
    docs = _labeled(spark).filter("doc_id < 120")
    models, feats = train_one_vs_rest(
        docs, "text", "doc_id", "label", n_buckets=256, iters=2, lr=5.0,
        local_cells=0,
    )
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        (F.col("label") == "streamy").cast("double").alias("y"),
    )
    solo = train_logreg(
        feats, labels, n_buckets=256, iters=2, lr=5.0, l2=0.0, local_cells=0
    )
    assert solo.weights == models["streamy"].weights
    assert solo.bias == models["streamy"].bias


def test_holdout_accuracy_and_determinism(spark):
    docs = _labeled(spark)
    train = docs.filter("doc_id % 5 < 4")
    models, _ = train_one_vs_rest(
        train, "text", "doc_id", "label", n_buckets=1024, iters=20, lr=5.0
    )
    from realtime_fraud_detection_spark.ml.text_classifier import hashed_features

    feats_all = hashed_features(docs, "text", "doc_id", 1024, bigrams=False)
    scored = score_one_vs_rest(feats_all, models)
    joined = docs.select(F.col("doc_id").alias("doc"), "label").join(scored, "doc")
    total = joined.count()
    hold = joined.filter("doc % 5 = 4")
    acc_hold = hold.filter("label = pred_label").count() / hold.count()
    assert total == docs.count()  # one prediction per doc
    assert acc_hold >= 0.6, acc_hold
    # retraining is bit-deterministic -> identical predictions
    models2, _ = train_one_vs_rest(
        train, "text", "doc_id", "label", n_buckets=1024, iters=20, lr=5.0
    )
    assert all(models[c].weights == models2[c].weights for c in models)
