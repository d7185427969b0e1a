"""Feature-library queries — SURVEY §2.7's expression families and §2.8's
scoring arithmetic (M1/M2/M3 + F6), driven over the events/customer fixtures.

The events table stands in for the transaction stream (value → amount,
user_id → user, event_type → merchant category analog); inputs the fixture
lacks (geo coordinates, IPs, user agents) are derived deterministically from
the keys with integer arithmetic so the oracle can reproduce them exactly.
The full fraud-domain pipeline over real transaction schemas is exercised in
tests/ via the seeded generator (sources/generator.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import features as FF
from ..functions import scoring as S
from ..sources.testdata import load_table


# ---------------------------------------------------------------------------
# Amount family (FeatureExtractor.java:92-131,386-392) + temporal family
# (FeatureExtractor.java:136-168,394-399) + geographic family incl.
# Haversine as a pure expression (FeatureExtractor.java:173-211,401-417)
# + device/network family (FeatureExtractor.java:301-325,434-451)
# + the JSON family (serialization/*.java, RedisService.java:212-241:
# get_json_object extraction + to_json round-trip — absorbed round 13 from
# the former json_extract row to free an oracle-window slot for the
# drift_report promotion) — ONE per-event projection, one driver
# correctness row (merged round 10 from the former
# amount_temporal_features + geo_device_features rows; a projection union
# is semantics-free, so nothing is weakened). IP, user-agent, and
# coordinates the fixture lacks are derived deterministically from the
# keys so the oracle reproduces them.
# ---------------------------------------------------------------------------
def q_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    feats = FF.amount_features(v)
    tfeats = FF.temporal_features(F.col("ts"))
    lat = (F.col("user_id") % 140 - 70).cast("double") + (F.col("event_id") % 100) / 100.0
    lon = ((F.col("user_id") * 7) % 340 - 170).cast("double") + (F.col("event_id") % 50) / 50.0
    mlat = ((F.col("user_id") * 3) % 140 - 70).cast("double")
    mlon = ((F.col("user_id") * 11) % 340 - 170).cast("double")
    ip = F.when(
        F.col("user_id") % 3 == 0,
        F.concat(F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".1")),
    ).otherwise(
        F.concat(F.lit("203.0.113."), (F.col("user_id") % 256).cast("string"))
    )
    ua = F.when(F.col("user_id") % 7 == 0, F.lit("bot-agent/1.0")).otherwise(
        F.lit("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36")
    )
    dfeats = FF.device_features(ip, ua)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        "value",
        F.round(feats["amount_log"], 6).alias("amount_log"),
        F.round(feats["amount_sqrt"], 6).alias("amount_sqrt"),
        feats["is_round_amount"].alias("is_round_amount"),
        feats["is_round_10"].alias("is_round_10"),
        feats["amount_category"].alias("amount_category"),
        FF.amount_bucket_100(v).alias("amount_bucket_100"),
        tfeats["hour_of_day"].alias("hour_of_day"),
        tfeats["day_of_week"].alias("day_of_week"),
        tfeats["day_of_month"].alias("day_of_month"),
        tfeats["is_weekend"].alias("is_weekend"),
        tfeats["time_period"].alias("time_period"),
        tfeats["is_business_hours"].alias("is_business_hours"),
        tfeats["is_night_time"].alias("is_night_time"),
        FF.in_preferred_time(tfeats["hour_of_day"], F.lit(8), F.lit(20)).alias("in_preferred_time"),
        lat.alias("lat"),
        lon.alias("lon"),
        FF.is_high_risk_location(lat, lon).alias("is_high_risk_country"),
        F.round(FF.haversine_km(lat, lon, mlat, mlon), 4).alias("distance_to_merchant_km"),
        ip.alias("ip_address"),
        dfeats["is_private_ip"].alias("is_private_ip"),
        dfeats["ip_risk_score"].alias("ip_risk_score"),
        dfeats["suspicious_user_agent"].alias("suspicious_user_agent"),
        k.alias("k"),
        (k % 5).alias("k_mod5"),
        F.to_json(F.struct(F.col("event_id").alias("id"), k.alias("k"))).alias(
            "json_payload"
        ),
    )


SQL_EVENT_FEATURES = """
WITH derived AS (
  SELECT event_id, value, ts,
         CAST(user_id % 140 - 70 AS DOUBLE) + (event_id % 100) / 100.0 AS lat,
         CAST((user_id * 7) % 340 - 170 AS DOUBLE) + (event_id % 50) / 50.0 AS lon,
         CAST((user_id * 3) % 140 - 70 AS DOUBLE) AS mlat,
         CAST((user_id * 11) % 340 - 170 AS DOUBLE) AS mlon,
    CASE WHEN user_id % 3 = 0 THEN '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.1'
         ELSE '203.0.113.' || CAST(user_id % 256 AS VARCHAR) END AS ip_address,
    CASE WHEN user_id % 7 = 0 THEN 'bot-agent/1.0'
         ELSE 'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36' END AS ua,
    json_extract_string(props, '$.k')::INTEGER AS k
  FROM events)
SELECT event_id, value,
       ROUND(LN(1 + value), 6) AS amount_log,
       ROUND(SQRT(value), 6) AS amount_sqrt,
       value % 1 = 0 AS is_round_amount,
       value % 10 = 0 AS is_round_10,
       CASE WHEN value < 10 THEN 'micro' WHEN value < 100 THEN 'small'
            WHEN value < 1000 THEN 'medium' WHEN value < 10000 THEN 'large'
            ELSE 'very_large' END AS amount_category,
       CAST(FLOOR(value / 100) * 100 AS DOUBLE) AS amount_bucket_100,
       hour(ts) AS hour_of_day,
       dayofweek(ts) + 1 AS day_of_week,
       dayofmonth(ts) AS day_of_month,
       dayofweek(ts) IN (0, 6) AS is_weekend,
       CASE WHEN hour(ts) >= 6 AND hour(ts) < 12 THEN 'morning'
            WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 'afternoon'
            WHEN hour(ts) >= 18 AND hour(ts) < 22 THEN 'evening'
            ELSE 'night' END AS time_period,
       hour(ts) BETWEEN 9 AND 17 AS is_business_hours,
       hour(ts) <= 6 OR hour(ts) >= 22 AS is_night_time,
       hour(ts) BETWEEN 8 AND 20 AS in_preferred_time,
       lat, lon,
       (ABS(lat) > 60 OR (ABS(lat) < 10 AND ABS(lon) < 10)) AS is_high_risk_country,
       ROUND(2 * 6371.0 * ATAN2(
         SQRT(POWER(SIN(RADIANS(mlat - lat) / 2), 2)
              + COS(RADIANS(lat)) * COS(RADIANS(mlat)) * POWER(SIN(RADIANS(mlon - lon) / 2), 2)),
         SQRT(1 - (POWER(SIN(RADIANS(mlat - lat) / 2), 2)
              + COS(RADIANS(lat)) * COS(RADIANS(mlat)) * POWER(SIN(RADIANS(mlon - lon) / 2), 2)))
       ), 4) AS distance_to_merchant_km,
  ip_address,
  (ip_address LIKE '192.168.%' OR ip_address LIKE '10.%' OR ip_address LIKE '172.16.%') AS is_private_ip,
  CASE WHEN ip_address LIKE '192.168.%' OR ip_address LIKE '10.%' OR ip_address LIKE '172.16.%'
       THEN 0.1 ELSE 0.3 END AS ip_risk_score,
  (lower(ua) LIKE '%bot%' OR lower(ua) LIKE '%crawler%' OR length(ua) < 20) AS suspicious_user_agent,
  k,
  k % 5 AS k_mod5,
  '{"id":' || event_id || ',"k":' || k || '}' AS json_payload
FROM derived
"""


# ---------------------------------------------------------------------------
# M1 + M2 + M3 — the method-tagged scoring panel (merged round 12 to free
# an oracle-window slot for the jaccard_ingest promotion; both branches
# are pure per-event expression chains over the same events scan, so a
# union weakens nothing — each branch stays hash-checked):
#   method='rule'     — full rule-based scoring chain + risk level +
#                       decision (F6), inputs derived deterministically
#                       from the event/customer join
#                       (TransactionProcessor.java:327-473);
#   method='ensemble' — category-score combine, ensemble weighted
#                       average, confidence, decision
#                       (FeatureEnrichmentProcessor.java:122-336,
#                       ensemble_predictor.py:75-369).
# Columns the other branch lacks are NULL (rule has no confidence /
# combined_score).
# ---------------------------------------------------------------------------
def _rule_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    j = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
    prior = F.col("value") / 500.0
    user_risk = FF.clamp(F.coalesce(F.col("c_acctbal"), F.lit(8000.0)) / 10000.0, 0.0, 1.0)
    score = S.rule_based_score(
        prior_score=prior,
        user_risk_score=user_risk,
        is_new_account=F.col("user_id") % 5 == 0,
        is_kyc_verified=F.col("user_id") % 7 != 0,
        merchant_risk_level=F.when(F.col("event_type") == "error", "high")
        .when(F.col("event_type") == "signup", "medium")
        .otherwise("low"),
        merchant_is_blacklisted=F.col("event_type") == "error",
        # % 40 / 400 spans 0..0.0975 so the > 0.05 gate splits the fixture
        merchant_fraud_rate=(F.col("user_id") % 40).cast("double") / 400.0,
        is_high_risk_category=F.col("event_type") == "purchase",
        is_large_for_user=F.col("value") > 400,
        is_new_device=F.col("event_id") % 11 == 0,
        is_night_time=(F.hour("ts") <= 6) | (F.hour("ts") >= 22),
        within_merchant_hours=F.hour("ts").between(6, 22),
    )
    score_r = F.round(score, 6)
    blacklisted = F.col("event_type") == "error"
    return j.select(
        F.lit("rule").alias("method"),
        "event_id",
        score_r.alias("score"),
        F.lit(None).cast("double").alias("confidence"),
        F.lit(None).cast("double").alias("combined_score"),
        S.risk_level(score_r, blacklisted).alias("risk_level"),
        S.decision(score_r, blacklisted).alias("decision"),
    )


def q_rule_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rule_branch(spark, sf_dir).unionAll(
        _ensemble_branch(spark, sf_dir)
    )


# Both branches' CTEs share ONE WITH clause (a bare "… UNION ALL WITH …"
# is not SQL); the rule branch reads `scored`, the ensemble branch reads
# `base`→`ens`→`final`.
SQL_RULE_SCORE = """
WITH scored AS (
  SELECT event_id,
    ROUND(LEAST(GREATEST(
      0.5 * (value / 500.0)
      + LEAST(GREATEST(COALESCE(c_acctbal, 8000.0) / 10000.0, 0.0), 1.0) * 0.2
      + CASE WHEN user_id % 5 = 0 THEN 0.10 ELSE 0.0 END
      + CASE WHEN NOT (user_id % 7 <> 0) THEN 0.15 ELSE 0.0 END
      + CASE WHEN event_type = 'error' THEN 0.20 WHEN event_type = 'signup' THEN 0.10 ELSE 0.0 END
      + CASE WHEN event_type = 'error' THEN 0.40 ELSE 0.0 END
      + CASE WHEN CAST(user_id % 40 AS DOUBLE) / 400.0 > 0.05
             THEN 2.0 * (CAST(user_id % 40 AS DOUBLE) / 400.0) ELSE 0.0 END
      + CASE WHEN event_type = 'purchase' THEN 0.15 ELSE 0.0 END
      + CASE WHEN value > 400 THEN 0.15 ELSE 0.0 END
      + CASE WHEN event_id % 11 = 0 THEN 0.10 ELSE 0.0 END
      + CASE WHEN hour(ts) <= 6 OR hour(ts) >= 22 THEN 0.05 ELSE 0.0 END
      + CASE WHEN NOT (hour(ts) BETWEEN 6 AND 22) THEN 0.10 ELSE 0.0 END,
    0.0), 1.0), 6) AS fraud_score,
    event_type
  FROM events LEFT JOIN customer ON user_id = c_custkey),
base AS (
  SELECT event_id, value, ts, user_id, event_type,
    ((event_id * 37) % 1000) / 1000.0 AS p_xgb,
    ((event_id * 59) % 1000) / 1000.0 AS p_lstm,
    ((event_id * 83) % 1000) / 1000.0 AS p_bert,
    ((event_id * 101) % 1000) / 1000.0 AS p_gnn,
    ((event_id * 131) % 1000) / 1000.0 AS p_if
  FROM events),
ens AS (
  SELECT *,
    p_xgb * (0.40 / 1.0) + p_lstm * (0.25 / 1.0) + p_bert * (0.15 / 1.0)
      + p_gnn * (0.15 / 1.0) + p_if * (0.05 / 1.0) AS prob
  FROM base),
final AS (
  SELECT event_id,
    ROUND(prob, 6) AS ensemble_prob,
    ROUND(LEAST(GREATEST(2.0 * ABS(prob - 0.5), 0.0), 1.0), 6) AS confidence,
    ROUND(LEAST(GREATEST(0.6 * prob + 0.4 * (
        LEAST(GREATEST(value / 500.0, 0.0), 1.0) * 0.20
      + (hour(ts) / 24.0) * 0.10
      + (CAST(user_id % 100 AS DOUBLE) / 100.0) * 0.25
      + CASE WHEN event_type = 'error' THEN 0.8 ELSE 0.2 END * 0.20
      + (CAST(event_id % 10 AS DOUBLE) / 10.0) * 0.15
      + 0.3 * 0.10), 0.0), 1.0), 6) AS combined_score
  FROM ens)
SELECT 'rule' AS method, event_id, fraud_score AS score,
  CAST(NULL AS DOUBLE) AS confidence,
  CAST(NULL AS DOUBLE) AS combined_score,
  CASE WHEN event_type = 'error' THEN 'CRITICAL'
       WHEN fraud_score >= 0.9 THEN 'CRITICAL' WHEN fraud_score >= 0.7 THEN 'HIGH'
       WHEN fraud_score >= 0.5 THEN 'MEDIUM' ELSE 'LOW' END AS risk_level,
  CASE WHEN event_type = 'error' THEN 'DECLINE'
       WHEN fraud_score >= 0.9 THEN 'DECLINE'
       WHEN fraud_score >= 0.7 THEN 'REVIEW'
       ELSE 'APPROVE' END AS decision
FROM scored
UNION ALL
SELECT 'ensemble' AS method, event_id, ensemble_prob AS score,
  confidence, combined_score,
  CASE WHEN ensemble_prob >= 0.95 THEN 'CRITICAL'
       WHEN ensemble_prob >= 0.8 THEN 'HIGH'
       WHEN ensemble_prob >= 0.6 THEN 'MEDIUM'
       WHEN ensemble_prob >= 0.3 THEN 'LOW'
       ELSE 'VERY_LOW' END AS risk_level,
  CASE WHEN confidence < 0.7 THEN 'REVIEW'
       WHEN ensemble_prob >= 0.95 THEN 'DECLINE'
       WHEN ensemble_prob >= 0.8 THEN 'REVIEW'
       WHEN ensemble_prob >= 0.6 THEN 'APPROVE_WITH_MONITORING'
       ELSE 'APPROVE' END AS decision
FROM final
"""


# The ensemble branch of the merged rule_score panel (M2 + M3). Pseudo
# model scores derived deterministically from keys.
def _ensemble_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = {
        "xgboost": ((F.col("event_id") * 37) % 1000) / 1000.0,
        "lstm": ((F.col("event_id") * 59) % 1000) / 1000.0,
        "bert": ((F.col("event_id") * 83) % 1000) / 1000.0,
        "gnn": ((F.col("event_id") * 101) % 1000) / 1000.0,
        "isolation_forest": ((F.col("event_id") * 131) % 1000) / 1000.0,
    }
    prob = S.ensemble_weighted_average(p)
    conf = S.ensemble_confidence(prob)
    combined = S.category_score_combine(
        amount_score=FF.clamp(F.col("value") / 500.0, 0.0, 1.0),
        temporal_score=F.hour("ts").cast("double") / 24.0,
        user_score=(F.col("user_id") % 100).cast("double") / 100.0,
        merchant_score=F.when(F.col("event_type") == "error", 0.8).otherwise(0.2),
        velocity_score=((F.col("event_id") % 10)).cast("double") / 10.0,
        device_score=F.lit(0.3),
        old_score=prob,
    )
    prob_r = F.round(prob, 6)
    conf_r = F.round(conf, 6)
    return ev.select(
        F.lit("ensemble").alias("method"),
        "event_id",
        prob_r.alias("score"),
        conf_r.alias("confidence"),
        F.round(combined, 6).alias("combined_score"),
        S.ensemble_risk_level(prob_r).alias("risk_level"),
        S.ensemble_decision(prob_r, conf_r).alias("decision"),
    )


QUERIES = {
    "event_features": q_event_features,
    "rule_score": q_rule_score,
}

ORACLES = {
    "event_features": SQL_EVENT_FEATURES,
    "rule_score": SQL_RULE_SCORE,
}
