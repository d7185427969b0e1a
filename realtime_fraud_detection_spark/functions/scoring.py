"""Fraud scoring + decisioning — SURVEY §2.8 M1/M2/M3 and §2.2 F6.

The reference's rule-based scorer (TransactionProcessor.java:327-439), the
feature-category combiner (FeatureEnrichmentProcessor.java:122-336), the
ensemble combiner (ensemble_predictor.py:75-369, weights utils/config.py:126-199)
and the decision thresholds (TransactionProcessor.java:444-473) are all pure
arithmetic over per-row values — so here they are single column expressions
that Tungsten codegens; no model server, no RPC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .features import clamp

# Ensemble weights (utils/config.py:126-199, configs/models.json)
ENSEMBLE_WEIGHTS = {
    "xgboost": 0.40,
    "lstm": 0.25,
    "bert": 0.15,
    "gnn": 0.15,
    "isolation_forest": 0.05,
}


def rule_based_score(
    prior_score: Column,
    user_risk_score: Column,
    is_new_account: Column,
    is_kyc_verified: Column,
    merchant_risk_level: Column,
    merchant_is_blacklisted: Column,
    merchant_fraud_rate: Column,
    is_high_risk_category: Column,
    is_large_for_user: Column,
    is_new_device: Column,
    is_night_time: Column,
    within_merchant_hours: Column,
) -> Column:
    """M1 — weighted rule score, clamped to [0,1] (TransactionProcessor.java:327-439)."""
    b = F.lit(0.0)
    score = (
        0.5 * prior_score
        + user_risk_score * 0.2
        + F.when(is_new_account, 0.10).otherwise(b)
        + F.when(~is_kyc_verified, 0.15).otherwise(b)
        + F.when(merchant_risk_level == "high", 0.20)
        .when(merchant_risk_level == "medium", 0.10)
        .otherwise(b)
        + F.when(merchant_is_blacklisted, 0.40).otherwise(b)
        # fraud-rate term only fires above 5% (TransactionProcessor.java:399-401)
        + F.when(merchant_fraud_rate > 0.05, 2.0 * merchant_fraud_rate).otherwise(b)
        + F.when(is_high_risk_category, 0.15).otherwise(b)
        + F.when(is_large_for_user, 0.15).otherwise(b)
        + F.when(is_new_device, 0.10).otherwise(b)
        + F.when(is_night_time, 0.05).otherwise(b)
        + F.when(~within_merchant_hours, 0.10).otherwise(b)
    )
    return clamp(score, 0.0, 1.0)


def category_score_combine(
    amount_score: Column,
    temporal_score: Column,
    user_score: Column,
    merchant_score: Column,
    velocity_score: Column,
    device_score: Column,
    old_score: Column,
) -> Column:
    """M2 — weighted category combine, blended 0.6×old + 0.4×new
    (FeatureEnrichmentProcessor.java:122-336)."""
    new = (
        amount_score * 0.20
        + temporal_score * 0.10
        + user_score * 0.25
        + merchant_score * 0.20
        + velocity_score * 0.15
        + device_score * 0.10
    )
    return clamp(0.6 * old_score + 0.4 * new, 0.0, 1.0)


def ensemble_weighted_average(scores: dict[str, Column]) -> Column:
    """M3 weighted_average strategy — weights renormalized over present models
    (ensemble_predictor.py:252-287)."""
    # round so the full ensemble renormalizes by exactly 1.0 (float summation
    # of the weights yields 1.0000000000000002, which would perturb every
    # product by an ulp)
    total_w = round(sum(ENSEMBLE_WEIGHTS[m] for m in scores), 9)
    expr = None
    for m, col in scores.items():
        term = col * (ENSEMBLE_WEIGHTS[m] / total_w)
        expr = term if expr is None else expr + term
    return expr


def ensemble_confidence(prob: Column) -> Column:
    """confidence = 2×|p − 0.5| (ensemble_predictor.py:325-342)."""
    return clamp(2.0 * F.abs(prob - 0.5), 0.0, 1.0)


def risk_level(
    score: Column, is_blacklisted: Column | None = None, threshold: float = 0.7
) -> Column:
    """Rule-path risk bands (TransactionProcessor.java:444-473): CRITICAL at
    >= 0.9, HIGH at >= fraudThreshold (default 0.7, JobConfig.java:47),
    MEDIUM at >= 0.5, else LOW — no VERY_LOW band on this path. Blacklisted
    merchants override to CRITICAL (:463-469)."""
    base = (
        F.when(score >= 0.9, "CRITICAL")
        .when(score >= threshold, "HIGH")
        .when(score >= 0.5, "MEDIUM")
        .otherwise("LOW")
    )
    if is_blacklisted is not None:
        return F.when(is_blacklisted, "CRITICAL").otherwise(base)
    return base


def decision(score: Column, is_blacklisted: Column, threshold: float = 0.7) -> Column:
    """Rule-path APPROVE / REVIEW / DECLINE (TransactionProcessor.java:
    444-473): DECLINE only at >= 0.9 or blacklist, REVIEW at
    >= fraudThreshold (default 0.7), else APPROVE."""
    return (
        F.when(is_blacklisted, "DECLINE")
        .when(score >= 0.9, "DECLINE")
        .when(score >= threshold, "REVIEW")
        .otherwise("APPROVE")
    )


def ensemble_decision(
    prob: Column, confidence: Column, confidence_threshold: float = 0.7
) -> Column:
    """ML-path decision (ensemble_predictor.py:344-356): low confidence
    forces REVIEW; then DECLINE >= 0.95, REVIEW >= 0.8,
    APPROVE_WITH_MONITORING >= 0.6, else APPROVE."""
    return (
        F.when(confidence < confidence_threshold, "REVIEW")
        .when(prob >= 0.95, "DECLINE")
        .when(prob >= 0.8, "REVIEW")
        .when(prob >= 0.6, "APPROVE_WITH_MONITORING")
        .otherwise("APPROVE")
    )


def ensemble_risk_level(prob: Column) -> Column:
    """ML-path risk bands (ensemble_predictor.py:358-369): CRITICAL >= 0.95,
    HIGH >= 0.8, MEDIUM >= 0.6, LOW >= 0.3, else VERY_LOW."""
    return (
        F.when(prob >= 0.95, "CRITICAL")
        .when(prob >= 0.8, "HIGH")
        .when(prob >= 0.6, "MEDIUM")
        .when(prob >= 0.3, "LOW")
        .otherwise("VERY_LOW")
    )


def alert_level(score: Column) -> Column:
    """FraudAlert.alert_level ∈ {medium, high} (simulator.py:405-421)."""
    return F.when(score >= 0.9, "high").otherwise("medium")


def velocity_score(
    tx_count: Column,
    total_amount: Column,
    fraud_count: Column,
    distinct_merchants: Column,
) -> Column:
    """A1's composite velocity score (WindowProcessor.java:327-351), term for
    term: count tiers +0.4/+0.2/+0.1 at > 20/10/5; amount tiers
    +0.3/+0.2/+0.1 at > 10000/5000/1000; + fraudRate × 0.4; and +0.2 when
    merchant diversity (uniqueMerchants / txCount) is LOW (< 0.2 — low
    diversity is the suspicious signal); capped at 1.0."""
    cnt = tx_count.cast("double")
    fraud_rate = F.when(tx_count > 0, fraud_count.cast("double") / cnt).otherwise(F.lit(0.0))
    diversity = F.when(tx_count > 0, distinct_merchants.cast("double") / cnt).otherwise(
        F.lit(0.0)
    )
    s = (
        F.when(tx_count > 20, 0.4).when(tx_count > 10, 0.2).when(tx_count > 5, 0.1).otherwise(F.lit(0.0))
        + F.when(total_amount > 10000, 0.3).when(total_amount > 5000, 0.2).when(total_amount > 1000, 0.1).otherwise(F.lit(0.0))
        + fraud_rate * 0.4
        + F.when(diversity < 0.2, 0.2).otherwise(F.lit(0.0))
    )
    return F.least(s, F.lit(1.0))


def merchant_risk_score(fraud_rate: Column, high_risk_count: Column,
                        tx_count: Column, amount_stddev: Column,
                        avg_amount: Column) -> Column:
    """A2's merchant risk score (WindowProcessor.java:459-483): fraud-rate,
    high-risk share, and amount-volatility contributions, clamped [0,1]."""
    high_share = high_risk_count / F.nullif(tx_count.cast("double"), F.lit(0.0))
    volatility = amount_stddev / F.nullif(avg_amount, F.lit(0.0))
    s = (
        2.0 * fraud_rate
        + F.coalesce(high_share, F.lit(0.0)) * 0.5
        + F.when(volatility > 2.0, 0.2).when(volatility > 1.0, 0.1).otherwise(F.lit(0.0))
    )
    return clamp(s, 0.0, 1.0)
