"""Ensemble + network features — SURVEY §2.8 M3 and M8.

M3: the reference fans out to 5 models over asyncio and combines with
weighted average / voting / stacking (ensemble_predictor.py:75-369). Here
model scores are columns and the combine strategies are arithmetic — the
fan-out is column-parallel within a batch, no HTTP.

M8: the reference's "GNN" builds a graph with *random* node features
(graph_neural_network.py:295) — decorative. Its five interpretable network
features are plain aggregations/joins, reproduced exactly here:
  user_centrality       = min(distinct_merchants / 10, 1)
  merchant_centrality   = min(distinct_users / 100, 1)
  path_length_anomaly   = |amount − user_avg| / user_avg
  community_anomaly     = is-new-merchant-for-user
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scoring import (
    ENSEMBLE_WEIGHTS,
    ensemble_confidence,
    ensemble_decision,
    ensemble_stacking,
    ensemble_weighted_average,
    model_confidence,
)
from ..operators.windows import first_seen_flag


def network_features(tx: DataFrame) -> DataFrame:
    """M8's interpretable features via two broadcast-able aggregations and a
    window (graph_neural_network.py:170-392)."""
    user_stats = tx.groupBy("user_id").agg(
        F.countDistinct("merchant_id").alias("_u_merchants"),
        F.sum(F.col("amount").cast("decimal(18,2)")).cast("double").alias("_u_total"),
        F.count("*").alias("_u_cnt"),
    )
    merch_stats = tx.groupBy("merchant_id").agg(
        F.countDistinct("user_id").alias("_m_users")
    )
    out = (
        first_seen_flag(tx, "user_id", "merchant_id", "ts", "transaction_id", "community_anomaly")
        .join(F.broadcast(user_stats), "user_id")
        .join(F.broadcast(merch_stats), "merchant_id")
    )
    user_avg = F.col("_u_total") / F.col("_u_cnt").cast("double")
    return (
        out.withColumn("user_centrality", F.least(F.col("_u_merchants") / 10.0, F.lit(1.0)))
        .withColumn("merchant_centrality", F.least(F.col("_m_users") / 100.0, F.lit(1.0)))
        .withColumn(
            "path_length_anomaly",
            F.abs(F.col("amount") - user_avg) / F.nullif(user_avg, F.lit(0.0)),
        )
        .drop("_u_merchants", "_u_total", "_u_cnt", "_m_users")
    )


def apply_ensemble(scored: DataFrame, model_scores: dict[str, F.Column]) -> DataFrame:
    """M3 weighted-average strategy + confidence + decision
    (ensemble_predictor.py:252-369)."""
    prob = ensemble_weighted_average(model_scores)
    conf = ensemble_confidence(prob)
    return (
        scored.withColumn("ensemble_prob", prob)
        .withColumn("ensemble_confidence", conf)
        .withColumn(
            "ensemble_decision",
            # blacklist overrides even the ML path (TransactionProcessor.java:463-469)
            F.when(F.col("m_is_blacklisted"), "DECLINE").otherwise(
                ensemble_decision(
                    F.col("ensemble_prob"), F.col("ensemble_confidence")
                )
            ),
        )
    )


def apply_stacking(scored: DataFrame, model_scores: dict[str, F.Column]) -> DataFrame:
    """M3 stacking strategy end-to-end (ensemble_predictor.py:305-323):
    confidence-weighted meta-combine + decision, same shape as
    :func:`apply_ensemble` so strategy selection is a function swap."""
    prob, conf = ensemble_stacking(model_scores)
    return (
        scored.withColumn("stacking_prob", prob)
        .withColumn("stacking_confidence", conf)
        .withColumn(
            "stacking_decision",
            F.when(F.col("m_is_blacklisted"), "DECLINE").otherwise(
                ensemble_decision(
                    F.col("stacking_prob"), F.col("stacking_confidence")
                )
            ),
        )
    )


def model_contributions(model_scores: dict[str, F.Column]) -> F.Column:
    """The reference explanation's model_contributions block
    (ensemble_predictor.py:371-391): per model its prediction, configured
    weight, contribution = p·w/Σw, and confidence — as one
    array<struct<model,prediction,weight,contribution,confidence>> column in
    dict order. Pure expressions; pairs with
    functions.scoring.contribution_explanation for the key-factors block."""
    total_w = round(sum(ENSEMBLE_WEIGHTS[m] for m in model_scores), 9)
    return F.array(
        *[
            F.struct(
                F.lit(m).alias("model"),
                p.cast("double").alias("prediction"),
                F.lit(ENSEMBLE_WEIGHTS[m]).alias("weight"),
                (p * (ENSEMBLE_WEIGHTS[m] / total_w)).cast("double").alias(
                    "contribution"
                ),
                model_confidence(p, m).cast("double").alias("confidence"),
            )
            for m, p in model_scores.items()
        ]
    )


def majority_vote(model_scores: dict[str, F.Column], threshold: float = 0.5) -> F.Column:
    """M3 voting strategy (ensemble_predictor.py:289-303)."""
    votes = None
    for col in model_scores.values():
        v = F.when(col >= threshold, 1).otherwise(0)
        votes = v if votes is None else votes + v
    return (votes * 2 > len(model_scores)).alias("vote_fraud")


def score_distinct(df: DataFrame, feature_cols: list[str], scorer) -> DataFrame:
    """The reference's prediction cache (ensemble_predictor.py:437-471: a
    5-minute TTL dict keyed by the feature vector, so repeated vectors skip
    the model) re-expressed set-oriented: rows sharing a feature vector are
    scored ONCE per batch — distinct → score → null-safe equi-join back.

    `scorer` maps a DataFrame of the distinct `feature_cols` rows to the
    same rows plus score columns. The join is null-safe (a NULL feature is
    a cache key, not a dropped row — the reference's dict keys str(None)
    the same way). Within a plan, `persist()` on the scored frame is the
    TTL-cache analog ACROSS consuming queries; this function is the
    WITHIN-batch repeat-vector dedupe. At scale both sides shuffle on the
    feature columns (or broadcast when the distinct side is small — AQE
    decides from the actual build size)."""
    from functools import reduce

    feats = df.select(*feature_cols).distinct()
    scored = scorer(feats).alias("_s")
    extra = [c for c in scored.columns if c not in feature_cols]
    d = df.alias("_d")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_d.{c}").eqNullSafe(F.col(f"_s.{c}")) for c in feature_cols],
    )
    return d.join(scored, cond, "left").select(
        *[F.col(f"_d.{c}") for c in df.columns],
        *[F.col(f"_s.{c}") for c in extra],
    )


def ab_variant(user_id: F.Column, treatment_pct: int = 50) -> F.Column:
    """M10 — deterministic hash-based A/B assignment (ab_testing.py:49-120)."""
    return F.when(
        F.pmod(F.crc32(user_id.cast("string")), 100) < treatment_pct, "treatment"
    ).otherwise("control")


def ab_metrics(
    scored: DataFrame,
    outcome_col: str = "is_fraud_predicted",
    user_col: str = "user_id",
    treatment_pct: int = 50,
    min_samples: int = 1000,
) -> DataFrame:
    """M10 — per-variant metrics + two-proportion z-test
    (ab_testing.py:122-427: traffic split, min sample 1000, significance
    0.05). One aggregation, z-statistic as column arithmetic, normal-CDF
    p-value via erfc — no scipy, no driver-side loop."""
    tagged = scored.withColumn("variant", ab_variant(F.col(user_col), treatment_pct))
    per = tagged.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum(F.col(outcome_col).cast("int")).alias("positives"),
    )
    wide = per.groupBy().pivot("variant", ["control", "treatment"]).agg(
        F.first("n").alias("n"), F.first("positives").alias("pos")
    )
    p1 = F.col("control_pos") / F.col("control_n")
    p2 = F.col("treatment_pos") / F.col("treatment_n")
    pool = (F.col("control_pos") + F.col("treatment_pos")) / (
        F.col("control_n") + F.col("treatment_n")
    )
    se = F.sqrt(pool * (1 - pool) * (1.0 / F.col("control_n") + 1.0 / F.col("treatment_n")))
    z = (p2 - p1) / F.nullif(se, F.lit(0.0))
    # two-sided p-value = erfc(|z|/√2); Spark SQL has no erfc, so use the
    # Abramowitz–Stegun 7.1.26 rational approximation (|err| < 1.5e-7)
    x = F.abs(F.col("_z")) / float(2**0.5)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    p_value = poly * F.exp(-x * x)
    return (
        wide.withColumn("control_rate", p1)
        .withColumn("treatment_rate", p2)
        .withColumn("_z", z)
        .withColumn("p_value", p_value)
        .withColumn(
            "significant",
            (F.col("p_value") < 0.05)
            & (F.col("control_n") >= min_samples)
            & (F.col("treatment_n") >= min_samples),
        )
        .withColumnRenamed("_z", "z_score")
    )
