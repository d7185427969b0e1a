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


def rule_score_terms(
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
) -> dict[str, Column]:
    """M1's individual weighted rule terms, NAMED — the factor decomposition
    that feeds both :func:`rule_based_score` (their sum) and the per-row
    explanation (:func:`contribution_explanation`). Dict order IS the
    reference's summation order (TransactionProcessor.java:327-439); keep it —
    the oracled `rule_score` hash depends on the float fold order."""
    b = F.lit(0.0)
    return {
        "prior_score": 0.5 * prior_score,
        "user_risk": user_risk_score * 0.2,
        "new_account": F.when(is_new_account, 0.10).otherwise(b),
        "kyc_unverified": F.when(~is_kyc_verified, 0.15).otherwise(b),
        "merchant_risk_level": F.when(merchant_risk_level == "high", 0.20)
        .when(merchant_risk_level == "medium", 0.10)
        .otherwise(b),
        "merchant_blacklisted": F.when(merchant_is_blacklisted, 0.40).otherwise(b),
        # fraud-rate term only fires above 5% (TransactionProcessor.java:399-401)
        "merchant_fraud_rate": F.when(
            merchant_fraud_rate > 0.05, 2.0 * merchant_fraud_rate
        ).otherwise(b),
        "high_risk_category": F.when(is_high_risk_category, 0.15).otherwise(b),
        "large_for_user": F.when(is_large_for_user, 0.15).otherwise(b),
        "new_device": F.when(is_new_device, 0.10).otherwise(b),
        "night_time": F.when(is_night_time, 0.05).otherwise(b),
        "outside_merchant_hours": F.when(~within_merchant_hours, 0.10).otherwise(b),
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
    """M1 — weighted rule score, clamped to [0,1] (TransactionProcessor.java:327-439).
    Left-to-right fold over :func:`rule_score_terms` in dict order — bit-identical
    to the original inline sum."""
    terms = rule_score_terms(
        prior_score,
        user_risk_score,
        is_new_account,
        is_kyc_verified,
        merchant_risk_level,
        merchant_is_blacklisted,
        merchant_fraud_rate,
        is_high_risk_category,
        is_large_for_user,
        is_new_device,
        is_night_time,
        within_merchant_hours,
    )
    score = None
    for t in terms.values():
        score = t if score is None else score + t
    return clamp(score, 0.0, 1.0)


def contribution_explanation(terms: dict[str, Column], top_n: int = 5) -> Column:
    """Per-row prediction explanation — the reference's top-contributing-factor
    report (ensemble_predictor.py:371-435: sort factor contributions, keep the
    top slice) as ONE pure array expression, no Python crossing:

        array<struct<factor: string, contribution: double>>

    sorted by contribution DESC with factor-name ASC tie-break (deterministic),
    zero-contribution terms dropped, sliced to `top_n`. Negated contributions
    are sorted ascending so struct comparison yields (contribution desc,
    factor asc) in one sort_array pass; codegen'd end-to-end."""
    pairs = F.array(
        *[
            F.struct(
                (-c).cast("double").alias("_neg"), F.lit(name).alias("factor")
            )
            for name, c in terms.items()
        ]
    )
    ordered = F.slice(
        F.filter(F.sort_array(pairs), lambda s: s["_neg"] != 0.0), 1, top_n
    )
    return F.transform(
        ordered,
        lambda s: F.struct(
            s["factor"].alias("factor"), (-s["_neg"]).alias("contribution")
        ),
    )


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


# Per-model confidence multipliers (ensemble_predictor.py:324-341 — unknown
# models fall back to 0.5). Keys match ENSEMBLE_WEIGHTS' short names.
MODEL_CONFIDENCE_MULTIPLIER = {
    "xgboost": 1.0,
    "lstm": 0.8,
    "bert": 0.7,
    "gnn": 0.6,
    "isolation_forest": 0.5,
}


def model_confidence(prediction: Column, model: str) -> Column:
    """Per-model confidence = min(1, |p − 0.5| × 2 × model_multiplier)
    (ensemble_predictor.py:324-341: distance from the decision boundary,
    scaled by how much the model is trusted)."""
    mult = MODEL_CONFIDENCE_MULTIPLIER.get(model, 0.5)
    return F.least(F.abs(prediction - 0.5) * 2.0 * mult, F.lit(1.0))


def ensemble_stacking(scores: dict[str, Column]) -> tuple[Column, Column]:
    """M3 stacking strategy (ensemble_predictor.py:305-323): the simplified
    meta-learner weights each model's prediction by its OWN confidence —
    prob = Σ pᵢ·confᵢ / Σ confᵢ, confidence = Σ confᵢ / n — falling back to
    the weighted-average strategy when total confidence is zero (every model
    sitting exactly on the 0.5 boundary). Returns (prob, confidence); pure
    column arithmetic, fold order = dict order (deterministic)."""
    weighted = None
    total_conf = None
    for m, col in scores.items():
        c = model_confidence(col, m)
        t = col * c
        weighted = t if weighted is None else weighted + t
        total_conf = c if total_conf is None else total_conf + c
    prob = F.when(total_conf > 0.0, weighted / total_conf).otherwise(
        ensemble_weighted_average(scores)
    )
    return prob, total_conf / float(len(scores))


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
