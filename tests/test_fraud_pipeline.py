"""End-to-end fraud pipeline tests on the seeded generator fixture —
SURVEY §5's plan (b): feature values, scores and decisions checked against an
independent pandas re-implementation, plus label-separation sanity checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark import pipeline as P


@pytest.fixture(scope="module")
def scored(fraud_data):
    users, merchants, tx = fraud_data
    return P.score_transactions(tx, users, merchants).cache()


def test_enrichment_defaults_for_missing_profiles(spark, fraud_data):
    users, merchants, tx = fraud_data
    # dangle some FKs to exercise the missing-profile path
    dangling = tx.withColumn(
        "user_id",
        F.when(F.col("amount") < 5, F.lit("user_ghost")).otherwise(F.col("user_id")),
    )
    out = P.enrich(dangling, users, merchants)
    ghosts = out.filter(F.col("user_id") == "user_ghost")
    if ghosts.count():
        row = ghosts.select("u_risk_score", "profile_found").first()
        assert row["u_risk_score"] == 0.5  # TransactionProcessor.java:489-508
        assert row["profile_found"] is False


def test_feature_values_against_pandas(scored):
    pdf = scored.select(
        "transaction_id",
        "amount",
        "amount_log",
        "is_round_amount",
        "hour_of_day",
        "is_weekend",
        "is_night_time",
        "distance_to_merchant_km",
        "is_known_device",
    ).toPandas()
    np.testing.assert_allclose(pdf["amount_log"], np.log1p(pdf["amount"]), rtol=1e-12)
    assert ((pdf["hour_of_day"] >= 0) & (pdf["hour_of_day"] <= 23)).all()
    night = (pdf["hour_of_day"] <= 6) | (pdf["hour_of_day"] >= 22)
    assert (pdf["is_night_time"] == night).all()
    assert (pdf["distance_to_merchant_km"].dropna() >= 0).all()


def test_haversine_against_reference_formula(spark):
    from realtime_fraud_detection_spark.functions.features import haversine_km

    df = spark.createDataFrame(
        [(40.7128, -74.0060, 51.5074, -0.1278)], ["lat1", "lon1", "lat2", "lon2"]
    ).select(haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"))
    d = df.first()["d"]
    assert abs(d - 5570.2) < 1.0  # NYC→London great-circle ≈ 5570 km


def test_derived_ml_side_features(scored):
    pdf = scored.select(
        "is_late_night", "hour_of_day", "combined_device_ip_risk", "unexpected_intl",
        "distance_to_merchant_km", "user_intl_preference",
    ).toPandas()
    late = (pdf["hour_of_day"] >= 0) & (pdf["hour_of_day"] <= 4)
    assert (pdf["is_late_night"] == late).all()
    assert ((pdf["combined_device_ip_risk"] >= 0) & (pdf["combined_device_ip_risk"] <= 1)).all()
    flagged = pdf[pdf["unexpected_intl"]]
    if len(flagged):
        assert (flagged["distance_to_merchant_km"] > 1000).all()
        assert (flagged["user_intl_preference"] < 0.1).all()


def test_score_bounds_and_decision_consistency(scored):
    pdf = scored.select("model_score", "risk_level", "decision", "m_is_blacklisted").toPandas()
    assert ((pdf["model_score"] >= 0) & (pdf["model_score"] <= 1)).all()
    # decision bands (TransactionProcessor.java:444-473): DECLINE only at
    # >= 0.9 or blacklist; REVIEW >= 0.7; APPROVE below the 0.7 threshold
    declined = pdf[pdf["decision"] == "DECLINE"]
    assert ((declined["model_score"] >= 0.9) | declined["m_is_blacklisted"]).all()
    reviewed = pdf[pdf["decision"] == "REVIEW"]
    assert ((reviewed["model_score"] >= 0.7) & (reviewed["model_score"] < 0.9)).all()
    approved = pdf[pdf["decision"] == "APPROVE"]
    assert (approved["model_score"] < 0.7).all()
    assert not approved["m_is_blacklisted"].any()
    # risk bands follow the same rule path, blacklist forcing CRITICAL
    crit = pdf[pdf["risk_level"] == "CRITICAL"]
    assert ((crit["model_score"] >= 0.9) | crit["m_is_blacklisted"]).all()


def test_fraud_scores_separate_labels(scored):
    """Ground-truth fraud rows should score higher on average — the
    generator's fraud patterns carry the signals M1 weights."""
    stats = (
        scored.groupBy("is_fraud").agg(F.avg("model_score").alias("avg_score")).collect()
    )
    by_label = {r["is_fraud"]: r["avg_score"] for r in stats}
    assert by_label[True] > by_label[False] + 0.05


def test_alert_projection(scored):
    alerts = P.fraud_alerts(scored, threshold=0.7).toPandas()
    assert set(alerts.columns) == {
        "alert_id",
        "transaction_id",
        "user_id",
        "fraud_score",
        "fraud_type",
        "alert_level",
        "ts",
    }
    assert (alerts["fraud_score"] > 0.7).all()
    assert set(alerts["alert_level"].unique()) <= {"medium", "high"}


def test_feature_vector_projection(scored):
    fv = P.feature_vector(scored).limit(5).toPandas()
    assert "features" in fv.columns and "features_json" in fv.columns
    m = fv["features"].iloc[0]
    assert "amount" in m and "model_score" in m


def test_behavior_stream_correlation(spark, fraud_data):
    """J1 over the generated user-behavior fixture: every transaction has a
    behavior event within ±5 min, so the time-range join matches ≥ once per
    transaction; risk factors bounded [0,1]."""
    from realtime_fraud_detection_spark.operators.joins import (
        behavior_risk_factors,
        windowed_stream_join,
    )
    from realtime_fraud_detection_spark.sources.generator import generate_behavior_events

    users, merchants, tx = fraud_data
    tx_pd = tx.select(
        "transaction_id", "user_id", "amount", "ts", "device_fingerprint"
    ).toPandas()
    beh = spark.createDataFrame(generate_behavior_events(tx_pd))
    joined = windowed_stream_join(tx, beh, "user_id").withColumn(
        "behavior_risk", behavior_risk_factors()
    )
    matched_tx = joined.select("l.transaction_id").distinct().count()
    assert matched_tx == tx.count()  # the paired event is always in window
    stats = joined.agg(
        F.min("behavior_risk").alias("lo"), F.max("behavior_risk").alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_broadcast_join_in_plan(spark, fraud_data):
    from realtime_fraud_detection_spark.plans.explain import has_broadcast_join

    users, merchants, tx = fraud_data
    assert has_broadcast_join(P.enrich(tx, users, merchants))
