"""M6 sequential scorer (ml/sequential.py): trailing-window feature
assembly laws, holdout AUC on the seeded fraud fixture (the reference's
LSTM is a dummy fallback returning a constant — AUC 0.5; the trained
scorer must decisively beat it), bit-deterministic training (decimal-sum
gradients), pure-expression scoring (zero Python crossings), and JSON
artifact round-trip."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.hashing import md5_bigint
from realtime_fraud_detection_spark.ml.evaluation import binary_eval
from realtime_fraud_detection_spark.ml.sequential import (
    from_json,
    lagged_sequence_features,
    score_sequential,
    to_json,
    train_sequential_scorer,
)


def _feats(fraud_data):
    _, _, t = fraud_data
    f = lagged_sequence_features(t, "user_id", "ts", "amount", "transaction_id")
    return f.withColumn("label", F.col("is_fraud").cast("int"))


def test_feature_assembly_laws(spark):
    rows = [
        (1, "u", "2024-03-01 10:00:00", 100.0),
        (2, "u", "2024-03-01 10:00:30", 100.0),
        (3, "u", "2024-03-01 10:01:00", 400.0),
        (4, "v", "2024-03-02 09:00:00", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: r
        for r in lagged_sequence_features(df, "user_id", "ts", "value").collect()
    }
    # first event of a user: n=1, ratio 1, no gap (clamped to a day), span 0
    assert got[1]["seq_n"] == 1.0
    assert got[1]["seq_ratio_to_mean"] == pytest.approx(1.0)
    assert got[1]["seq_gap_s"] == 86400.0
    assert got[1]["seq_span_s"] == 0.0
    assert got[1]["seq_lag1_delta"] == 0.0
    # third event: trailing mean (100+100+400)/3 = 200 → ratio 2; span 60 s;
    # rate 3/60; last gap 30 s; delta +300
    assert got[3]["seq_n"] == 3.0
    assert got[3]["seq_ratio_to_mean"] == pytest.approx(2.0)
    assert got[3]["seq_span_s"] == 60.0
    assert got[3]["seq_rate"] == pytest.approx(0.05)
    assert got[3]["seq_gap_s"] == 30.0
    assert got[3]["seq_lag1_delta"] == pytest.approx(300.0)
    # other user unaffected
    assert got[4]["seq_n"] == 1.0


@pytest.mark.slow
def test_holdout_auc_beats_dummy(spark, fraud_data):
    feats = _feats(fraud_data)
    split = F.pmod(md5_bigint(F.col("transaction_id"), "seq:"), 5)
    model = train_sequential_scorer(feats.filter(split != 0), "label", iters=30)
    scored = score_sequential(feats.filter(split == 0), model)
    row = binary_eval(scored, "seq_score", "label").collect()[0]
    # measured 0.847 on the seeded fixture; the reference's dummy scores 0.5
    assert row["auc"] > 0.75, row["auc"]
    # burstiness must carry signal: the rate/gap weights are nonzero
    w = dict(zip(model["feature_cols"], model["weights"]))
    assert abs(w["seq_rate"]) > 0.1 and abs(w["seq_gap_s"]) > 0.1


def test_null_feature_rows_stay_in_gradient(spark):
    """A NULL feature (seq_ratio_to_mean when a user's trailing mean is 0)
    coalesces to 0.0 — the standardized mean — instead of nulling the whole
    margin, which silently dropped the row from EVERY gradient sum while n
    still counted it. Replay of the first Adagrad step: at w=0 the margin
    is the bias alone, so resid = 0.5 − y for every row and the bias
    gradient is sum(0.5 − y)/n over ALL rows. The NULL-feature rows are
    all labeled 1 here, so the old dropped-row behavior would shift the
    sum by +20 and the assertion catches it."""
    import math

    rows = [
        # value 0.0 everywhere for user "z" → trailing mean 0 → NULL ratio;
        # those 40 rows all get label 1
        (i, "z" if i % 3 == 0 else f"u{i % 5}",
         f"2024-03-01 10:{i % 60:02d}:{(7 * i) % 60:02d}",
         0.0 if i % 3 == 0 else float(10 + i % 40),
         1 if i % 3 == 0 else i % 2)
        for i in range(1, 121)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts string, value double, label int"
    ).withColumn("ts", F.to_timestamp("ts"))
    feats = lagged_sequence_features(df, "user_id", "ts", "value")
    nulls = feats.filter(F.col("seq_ratio_to_mean").isNull())
    n_null = nulls.count()
    assert n_null > 0  # the degenerate case is actually exercised
    assert nulls.filter(F.col("label") != 1).count() == 0
    m = train_sequential_scorer(feats, "label", iters=1, lr=0.5)
    ys = [r["label"] for r in feats.select("label").collect()]
    gb = sum(0.5 - y for y in ys) / len(ys)  # ±0.5 terms: exact in float
    want_b = -0.5 * gb / math.sqrt(1e-12 + gb * gb)
    assert m["bias"] == pytest.approx(want_b, rel=1e-9)
    # serve side applies the SAME convention: the NULL-feature rows get a
    # real score (NULL z ≡ the mean), not a NULL margin — train/serve
    # cannot diverge on exactly the rows the training fix keeps
    scored = score_sequential(feats, train_sequential_scorer(feats, "label", iters=3))
    assert scored.filter(F.col("seq_score").isNull()).count() == 0
    got_null_row = scored.filter(F.col("seq_ratio_to_mean").isNull()).first()
    assert 0.0 <= got_null_row["seq_score"] <= 1.0


def test_training_bit_deterministic(spark, fraud_data):
    feats = _feats(fraud_data)
    m1 = train_sequential_scorer(feats, "label", iters=8)
    m2 = train_sequential_scorer(feats.repartition(7), "label", iters=8)
    assert to_json(m1) == to_json(m2)  # decimal sums → partitioning-free


@pytest.mark.slow
def test_warm_start_halves_rounds_on_learnable_labels(spark, fraud_data):
    """The closed-form warm start (diagonal Newton step from the cross
    moments riding the standardization aggregate — zero extra jobs) must
    reach the cold 2k-round holdout quality in k rounds on a LEARNABLE
    task. Measured on this fixture (SCALE.md sequence_scores table):
    warm@15 = 0.843 vs cold@30 = 0.847, warm@8 = 0.834 ≈ cold@15 =
    0.834. The warm init is also bit-deterministic (exact decimal cross
    moments) — pinned by the repartition comparison."""
    feats = _feats(fraud_data)
    split = F.pmod(md5_bigint(F.col("transaction_id"), "seq:"), 5)
    train = feats.filter(split != 0)
    hold = feats.filter(split == 0)

    def auc(iters, warm):
        m = train_sequential_scorer(train, "label", iters=iters, warm_start=warm)
        scored = score_sequential(hold, m)
        return binary_eval(scored, "seq_score", "label").collect()[0]["auc"]

    assert auc(15, True) >= auc(30, False) - 0.01
    m1 = train_sequential_scorer(train, "label", iters=5, warm_start=True)
    m2 = train_sequential_scorer(
        train.repartition(9), "label", iters=5, warm_start=True
    )
    assert to_json(m1) == to_json(m2)


def test_scoring_is_pure_expression(spark, fraud_data):
    feats = _feats(fraud_data)
    model = train_sequential_scorer(feats.limit(500), "label", iters=2)
    plan = score_sequential(feats, model)._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan


def test_artifact_roundtrip(spark, fraud_data):
    feats = _feats(fraud_data)
    model = train_sequential_scorer(feats.limit(400), "label", iters=3)
    clone = from_json(to_json(model))
    a = score_sequential(feats.limit(100), model).select("seq_score").collect()
    b = score_sequential(feats.limit(100), clone).select("seq_score").collect()
    assert [r["seq_score"] for r in a] == [r["seq_score"] for r in b]


def test_linear_artifact_serves_through_hot_reload_path(spark, fraud_data, tmp_path):
    """The fitted sequential model folds its standardization into the
    plain linear artifact (weights, bias) and ships through the M9
    versioned-artifact path: saved → loaded → broadcast →
    linear_scorer_udf margins equal the training-path logit within float
    fold tolerance."""
    import math

    from realtime_fraud_detection_spark.ml.models import (
        linear_scorer_udf,
        load_linear_scorer,
        save_linear_scorer,
    )
    from realtime_fraud_detection_spark.ml.sequential import (
        SEQ_FEATURES,
        to_linear_artifact,
    )

    feats = _feats(fraud_data)
    model = train_sequential_scorer(feats.limit(800), "label", iters=5)
    weights, bias = to_linear_artifact(model)
    path = str(tmp_path / "seq_scorer.json")
    save_linear_scorer(path, weights, bias, version=3)
    art = load_linear_scorer(path)
    assert art["version"] == 3

    bc = spark.sparkContext.broadcast(art)
    sample = feats.limit(50)
    served = {
        r["transaction_id"]: r["margin"]
        for r in sample.withColumn(
            "margin", linear_scorer_udf(bc, SEQ_FEATURES)
        ).collect()
    }
    probs = {
        r["transaction_id"]: r["seq_score"]
        for r in score_sequential(sample, model).collect()
    }
    assert served, "no rows served"
    for k, margin in served.items():
        want = math.log(probs[k] / (1 - probs[k]))  # logit of the prob
        assert margin == pytest.approx(want, abs=1e-8), k
