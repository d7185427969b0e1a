"""Join-operator queries — SURVEY §2.3 J1/J3/J6 shapes and §2.8 M8's network
features, expressed over the events fixture with DuckDB oracles.

J1's stream-stream window join becomes a time-range self-join in batch; J3's
composite-key pattern join derives its pattern dimension from the data
itself; J6's velocity lookup is the event ⋈ own-window-aggregate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import dec_sum, first_seen_flag
from ..sources.testdata import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# J1 + J1b in one method-tagged frame (merged r11 — the freed window slot
# promoted `merchant_updates`; both branches' per-(purchase, user)
# aggregates are still hash-checked):
#   * error_correlation (StreamJoiner.java:29-49): for each purchase, the
#     same user's error events within ±5 minutes — n = count,
#     score = exact decimal error-value sum;
#   * login_behavior (StreamJoiner.java:183-206): purchases joined to
#     same-user logins within ±2 h (the fixture is sparse; the
#     reference's window is 5 min on a dense stream; signup stands in
#     for login) — n = correlated logins, score = max of the
#     anomalous-login/short-session/navigation risk deltas, capped 1.0.
# ---------------------------------------------------------------------------
def q_time_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"), F.col("value").alias("e_value")
    )
    tr = (
        purchases.join(
            errors,
            (F.col("p_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("p_ts") - F.expr("interval 5 minutes"))
            & (F.col("e_ts") <= F.col("p_ts") + F.expr("interval 5 minutes")),
            "inner",
        )
        .groupBy("p_id", "p_user")
        .agg(
            F.count("*").alias("n"),
            dec_sum("e_value").alias("score"),
        )
        .select(F.lit("error_correlation").alias("method"), "p_id", "p_user", "n", "score")
    )
    logins = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
        (F.col("value") > 300).alias("is_anomalous_login"),
        (F.col("event_id") % 3 == 0).alias("is_short_session"),
        (F.col("event_id") % 7 == 0).alias("is_anomalous_navigation"),
    )
    risk = F.least(
        F.when(F.col("is_anomalous_login"), 0.3).otherwise(F.lit(0.0))
        + F.when(F.col("is_short_session"), 0.2).otherwise(F.lit(0.0))
        + F.when(F.col("is_anomalous_navigation"), 0.2).otherwise(F.lit(0.0)),
        F.lit(1.0),
    )
    br = (
        purchases.join(
            logins,
            (F.col("p_user") == F.col("l_user"))
            & (F.col("l_ts") >= F.col("p_ts") - F.expr("interval 2 hours"))
            & (F.col("l_ts") <= F.col("p_ts") + F.expr("interval 2 hours")),
        )
        .groupBy("p_id", "p_user")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max(risk), 6).alias("score"),
        )
        .select(F.lit("login_behavior").alias("method"), "p_id", "p_user", "n", "score")
    )
    return tr.unionByName(br)


SQL_TIME_RANGE_JOIN = """
SELECT 'error_correlation' AS method, p.event_id AS p_id, p.user_id AS p_user,
       COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS score
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts <= p.ts + INTERVAL 5 MINUTE
GROUP BY 2, 3
UNION ALL
SELECT 'login_behavior' AS method, p.event_id AS p_id, p.user_id AS p_user,
       COUNT(*) AS n,
       ROUND(MAX(LEAST(
         CASE WHEN l.value > 300 THEN 0.3 ELSE 0.0 END
         + CASE WHEN l.event_id % 3 = 0 THEN 0.2 ELSE 0.0 END
         + CASE WHEN l.event_id % 7 = 0 THEN 0.2 ELSE 0.0 END,
       1.0)::DOUBLE), 6) AS score
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'signup') l
  ON p.user_id = l.user_id
 AND l.ts >= p.ts - INTERVAL 2 HOUR AND l.ts <= p.ts + INTERVAL 2 HOUR
GROUP BY 2, 3
"""


# ---------------------------------------------------------------------------
# J3 — composite-key pattern join + similarity score
# (StreamJoiner.java:81-101,159-179,238-292): derive a "historical pattern"
# dimension (key = type:amount-bucket, stats per key), join back, score
# 0.3 key match + 0.4 amount closeness + 0.3 hour closeness.
# ---------------------------------------------------------------------------
def q_pattern_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    key = F.concat_ws(
        ":", "event_type", (F.floor(F.col("value") / 100) * 100).cast("long").cast("string")
    )
    tx = ev.withColumn("pattern_key", key)
    patterns = (
        tx.groupBy("pattern_key")
        .agg(
            F.count("*").alias("occurrence_count"),
            (dec_sum("value") / F.count("*")).alias("pattern_avg_value"),
        )
        .filter(F.col("occurrence_count") >= 50)
    )
    joined = tx.join(F.broadcast(patterns), "pattern_key")
    amount_closeness = 1.0 - F.least(F.abs(F.col("value") % 100) / 100.0, F.lit(1.0))
    hour_closeness = 1.0 - F.abs(F.hour("ts") - 12) / 24.0
    return joined.select(
        "event_id",
        "pattern_key",
        "occurrence_count",
        F.round("pattern_avg_value", 6).alias("pattern_avg_value"),
        F.round(F.lit(0.3) + 0.4 * amount_closeness + 0.3 * hour_closeness, 6).alias(
            "pattern_similarity"
        ),
    )


SQL_PATTERN_SIMILARITY = """
WITH tx AS (
  SELECT *, event_type || ':' || CAST(CAST(FLOOR(value / 100) * 100 AS BIGINT) AS VARCHAR) AS pattern_key
  FROM events),
patterns AS (
  SELECT pattern_key, COUNT(*) AS occurrence_count,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS pattern_avg_value
  FROM tx GROUP BY 1 HAVING COUNT(*) >= 50)
SELECT event_id, tx.pattern_key, occurrence_count,
       ROUND(pattern_avg_value, 6) AS pattern_avg_value,
       ROUND(0.3 + 0.4 * (1.0 - LEAST(ABS(value % 100) / 100.0, 1.0))
                 + 0.3 * (1.0 - ABS(hour(ts) - 12) / 24.0), 6) AS pattern_similarity
FROM tx JOIN patterns ON tx.pattern_key = patterns.pattern_key
"""


# ---------------------------------------------------------------------------
# (J6 — velocity lookup — was absorbed into windows_q.q_rolling_profile
# round 13: each event equi-joined to its own hour-window aggregate, the
# batch form of FeatureExtractor.java:330-363 reading the A8 counters per
# record. The join shape is unchanged inside the merged panel, still
# hash-checked; the slot freed promoted retrieval_eval.)
# ---------------------------------------------------------------------------
# M8 — the reference's interpretable network features as aggregations/joins
# (graph_neural_network.py:170-392; user_id→event_type is the user→merchant
# bipartite graph analog).
# ---------------------------------------------------------------------------
def q_network_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    user_stats = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("_distinct_types"),
        dec_sum("value").alias("_total"),
        F.count("*").alias("_cnt"),
    )
    type_stats = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("_users"))
    out = (
        first_seen_flag(ev, "user_id", "event_type", "ts", "event_id", "community_anomaly")
        .join(F.broadcast(user_stats), "user_id")
        .join(F.broadcast(type_stats), "event_type")
    )
    user_avg = F.col("_total") / F.col("_cnt").cast("double")
    return out.select(
        "event_id",
        F.round(F.least(F.col("_distinct_types") / 10.0, F.lit(1.0)), 6).alias("user_centrality"),
        F.round(F.least(F.col("_users") / 100.0, F.lit(1.0)), 6).alias("merchant_centrality"),
        F.round(F.abs(F.col("value") - user_avg) / F.nullif(user_avg, F.lit(0.0)), 6).alias(
            "path_length_anomaly"
        ),
        "community_anomaly",
    )


SQL_NETWORK_FEATURES = """
WITH user_stats AS (
  SELECT user_id, COUNT(DISTINCT event_type) AS dt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS cnt
  FROM events GROUP BY 1),
type_stats AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS users FROM events GROUP BY 1),
flagged AS (
  SELECT event_id, user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1 AS community_anomaly
  FROM events)
SELECT event_id,
       ROUND(LEAST(dt / 10.0, 1.0), 6) AS user_centrality,
       ROUND(LEAST(users / 100.0, 1.0), 6) AS merchant_centrality,
       ROUND(ABS(value - total / cnt) / NULLIF(total / cnt, 0.0), 6) AS path_length_anomaly,
       community_anomaly
FROM flagged JOIN user_stats USING (user_id) JOIN type_stats USING (event_type)
"""


# ---------------------------------------------------------------------------
# Top-k per group (ensemble_predictor.py:426-431's top-10 feature importance
# generalized): top-3 events by value per type, deterministic tie-break.
# ---------------------------------------------------------------------------
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", "value")
    )


SQL_TOPK_PER_GROUP = """
SELECT event_type, rank, event_id, value FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
  FROM events)
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# J4 — multi-stream correlation: normalize heterogeneous streams to one
# (key, ts, kind, value) shape, union, correlate per key
# (StreamJoiner.java:107-127's declared multi-stream connect).
# ---------------------------------------------------------------------------
def q_multistream_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)

    def norm(event_type: str, kind: str) -> DataFrame:
        return ev.filter(F.col("event_type") == event_type).select(
            "user_id", "ts", F.lit(kind).alias("kind"), F.col("value").alias("val")
        )

    unioned = (
        norm("purchase", "transaction")
        .unionAll(norm("signup", "behavior"))
        .unionAll(norm("error", "alert"))
    )
    return unioned.groupBy("user_id", "kind").agg(
        F.count("*").alias("event_cnt"),
        dec_sum("val").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


SQL_MULTISTREAM_UNION = """
WITH unioned AS (
  SELECT user_id, ts, 'transaction' AS kind, value AS val FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 'behavior', value FROM events WHERE event_type = 'signup'
  UNION ALL
  SELECT user_id, ts, 'alert', value FROM events WHERE event_type = 'error')
SELECT user_id, kind, COUNT(*) AS event_cnt,
       CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM unioned GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# As-of join — for each purchase, the user's most recent 'view' event at or
# before the purchase, LEFT semantics with staleness. Spark side is
# operators/joins.asof_join (union + last-value window, one shuffle); the
# oracle is DuckDB's native ASOF LEFT JOIN, so the window formulation is
# checked against a reference implementation of the operator itself.
# ---------------------------------------------------------------------------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("amount")
    )
    # dedupe right to unique (user_id, ts) so the as-of winner is
    # deterministic in both engines
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(purchases, views, "user_id")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "amount",
        F.col("view_value_asof").alias("last_view_value"),
        F.col("ts_asof").alias("last_view_ts"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("staleness_us"),
    )


SQL_ASOF_JOIN = """
WITH l AS (
  SELECT event_id, user_id, ts, value AS amount FROM events
  WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, MAX(value) AS view_value FROM events
  WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, l.ts, l.amount,
       r.view_value AS last_view_value, r.ts AS last_view_ts,
       epoch_us(l.ts) - epoch_us(r.ts) AS staleness_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---------------------------------------------------------------------------
# J2 — transaction ⋈ merchant-profile-update within ±10 min, applying the
# reference's risk deltas (StreamJoiner.java:55-75,208-236: riskLevel
# increased +0.4, newly blacklisted +0.8, fraud rate increased +0.2,
# capped at 1.0) through operators/joins.merchant_update_join — the one
# §2.3 join that had no driver-visible query before round 10. ORACLED
# since r11 (the time_range_join/behavior_risk merge freed the slot) with
# the same SQL tests/test_merchant_updates.py had pinned bit-exact since
# round 10 (the duplicate_spans promotion pattern).
# Merchant analog: user_id % 50 buckets events into 50 merchants; profile
# updates are the 'error' events with residue-derived flags.
# ---------------------------------------------------------------------------
def q_merchant_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import merchant_update_join

    ev = _events(spark, sf_dir)
    mid = (F.col("user_id") % 50).alias("merchant_id")
    tx = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("tx_id"), mid, "ts", "value"
    )
    updates = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("update_id"),
        mid,
        "ts",
        (F.col("event_id") % 3 == 0).alias("risk_level_increased"),
        (F.col("event_id") % 11 == 0).alias("newly_blacklisted"),
        (F.col("event_id") % 5 == 0).alias("fraud_rate_increased"),
    )
    joined = merchant_update_join(tx, updates, window="10 minutes")
    return joined.select(
        F.col("l.tx_id").alias("tx_id"),
        F.col("l.merchant_id").alias("merchant_id"),
        F.col("r.update_id").alias("update_id"),
        F.round("merchant_risk_delta", 6).alias("merchant_risk_delta"),
    ).orderBy("tx_id", "update_id")


SQL_MERCHANT_UPDATES = """
SELECT t.event_id AS tx_id, t.user_id % 50 AS merchant_id,
       u.event_id AS update_id,
       ROUND(LEAST(
         CASE WHEN u.event_id % 3 = 0 THEN 0.4 ELSE 0.0 END
         + CASE WHEN u.event_id % 11 = 0 THEN 0.8 ELSE 0.0 END
         + CASE WHEN u.event_id % 5 = 0 THEN 0.2 ELSE 0.0 END,
       1.0)::DOUBLE, 6) AS merchant_risk_delta
FROM (SELECT * FROM events WHERE event_type = 'purchase') t
JOIN (SELECT * FROM events WHERE event_type = 'error') u
  ON t.user_id % 50 = u.user_id % 50
 AND u.ts >= t.ts - INTERVAL 10 MINUTE AND u.ts <= t.ts + INTERVAL 10 MINUTE
ORDER BY tx_id, update_id
"""


QUERIES = {
    "time_range_join": q_time_range_join,
    "asof_join": q_asof_join,
    "multistream_union": q_multistream_union,
    "pattern_similarity": q_pattern_similarity,
    "network_features": q_network_features,
    "topk_per_group": q_topk_per_group,
    "merchant_updates": q_merchant_updates,
}

ORACLES = {
    "time_range_join": SQL_TIME_RANGE_JOIN,
    "asof_join": SQL_ASOF_JOIN,
    "multistream_union": SQL_MULTISTREAM_UNION,
    "merchant_updates": SQL_MERCHANT_UPDATES,
    "pattern_similarity": SQL_PATTERN_SIMILARITY,
    "network_features": SQL_NETWORK_FEATURES,
    "topk_per_group": SQL_TOPK_PER_GROUP,
}
