"""M7 model path (ml/models.trained_text_analyzer): the rule signal is
distilled into the hashed-n-gram logistic model and scoring generalizes
past the literal keyword list — texts sharing vocabulary with risky
texts score high even when no keyword fires."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.models import (
    text_model_score,
    trained_text_analyzer,
)

RISKY = [
    "urgent bitcoin transfer fee payment required",
    "crypto wallet payment transfer urgent verification",
    "act now prize winner claim transfer payment",
    "gift card voucher payment transfer required now",
    "bitcoin payment transfer urgent wallet fee",
    "lottery winner urgent claim transfer payment fee",
]
BENIGN = [
    "grocery store weekly receipt bread milk eggs",
    "monthly rent invoice apartment lease receipt",
    "coffee shop morning order receipt thanks",
    "bookstore purchase novel receipt loyalty points",
    "restaurant dinner bill receipt table service",
    "pharmacy prescription refill receipt insurance copay",
]


def _fixture(spark):
    rows = []
    tid = 0
    for rep in range(12):
        for t in RISKY:
            rows.append((tid, f"{t} ref{rep}"))
            tid += 1
        for t in BENIGN:
            rows.append((tid, f"{t} ref{rep}"))
            tid += 1
    return spark.createDataFrame(rows, "transaction_id bigint, description string")


def test_distilled_model_learns_and_generalizes(spark):
    df = _fixture(spark)
    scored, model = trained_text_analyzer(df, iters=20)
    rows = scored.withColumn(
        "flagged", text_model_score(F.col("description")) >= 0.3
    ).collect()
    assert all(r["text_model_score"] is not None for r in rows)
    risky_mean = sum(
        r["text_model_score"] for r in rows if r["flagged"]
    ) / sum(1 for r in rows if r["flagged"])
    benign_mean = sum(
        r["text_model_score"] for r in rows if not r["flagged"]
    ) / sum(1 for r in rows if not r["flagged"])
    assert risky_mean > 0.7 > 0.3 > benign_mean, (risky_mean, benign_mean)

    # generalization: no keyword fires in either probe text, but the first
    # shares the risky texts' vocabulary and must outscore the second
    from realtime_fraud_detection_spark.ml.text_classifier import (
        hashed_features,
        score_logreg,
    )

    probes = spark.createDataFrame(
        [
            (900001, "wallet transfer payment fee required verification"),
            (900002, "weekly bread milk receipt loyalty points"),
        ],
        "transaction_id bigint, description string",
    )
    assert (
        probes.filter(
            text_model_score(F.col("description")) >= 0.3
        ).count()
        == 0
    )
    got = {
        r["doc"]: r["prob"]
        for r in score_logreg(
            hashed_features(
                probes, "description", "transaction_id", n_buckets=1024,
                bigrams=False,
            ),
            model,
        ).collect()
    }
    assert got[900001] > got[900002], got
