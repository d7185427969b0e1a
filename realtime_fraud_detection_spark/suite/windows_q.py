"""Analytic window queries — SURVEY §2.4 W1-W5 over the events stream table.

Each drives an operator from operators/windows.py against its SQL-window
oracle. These are the batch forms of the reference's Redis rolling state
(capped lists, velocity counters, lag features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import windows as W
from ..operators.windows import dec_sum
from ..sources.testdata import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# W1 — last-N per entity (RedisService.java:296-321)
def q_last_n_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return W.last_n_per_entity(ev, "user_id", "ts", 5, "event_id").select(
        "event_id", "user_id", "ts", "value", "recency_rank"
    )


SQL_LAST_N = """
SELECT event_id, user_id, ts, value, recency_rank FROM (
  SELECT event_id, user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS recency_rank
  FROM events)
WHERE recency_rank <= 5
"""


# W2 + W5 — rolling 24h/1h trailing counters (RedisTransactionSink.java:
# 87-135) AND amount percentile/z-score vs own history (feature_processor.py:
# 74-75) AND J6 velocity lookup (FeatureExtractor.java:330-363 — absorbed
# round 13 from the former velocity_lookup row to free an oracle-window
# slot for the retrieval_eval promotion: each event equi-joined to its own
# hour-window aggregate, the batch form of reading the A8 counters per
# record; the "lookup" stays a genuine equi join on the window key so the
# J6 join shape remains hash-checked), one driver correctness row
# (50-query window). The two window operators chain on the same entity
# partitioning (one shuffle, per-frame sorts); the hourly lookup adds its
# own (user, hour) agg + join.
def q_rolling_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = W.rolling_ranges(
        ev, "user_id", "ts", "value", {"rolling_24h": 86400, "rolling_1h": 3600}
    )
    out = W.amount_profile(out, "user_id", "value", "ts")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("hour_count"), dec_sum("value").alias("hour_amount"))
        .select(F.col("w.start").alias("hour_start"), "user_id", "hour_count", "hour_amount")
    )
    out = out.withColumn("hour_start", F.date_trunc("hour", "ts")).join(
        hourly, ["user_id", "hour_start"]
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        "rolling_24h_count",
        "rolling_24h_amount",
        "rolling_1h_count",
        "rolling_1h_amount",
        "amount_pct_rank",
        F.round("entity_avg_amount", 6).alias("user_avg_value"),
        "amount_zscore",
        "hour_count",
        "hour_amount",
        (F.col("hour_count") > 3).alias("high_velocity_hour"),
    )


SQL_ROLLING_PROFILE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_start, user_id,
         COUNT(*) AS hour_count,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_amount
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_id, user_id, value,
    COUNT(*) OVER w24 AS rolling_24h_count,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w24 AS DOUBLE) AS rolling_24h_amount,
    COUNT(*) OVER w1 AS rolling_1h_count,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w1 AS DOUBLE) AS rolling_1h_amount,
    PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value) AS amount_pct_rank,
    COUNT(*) OVER w AS n,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
    CAST(SUM(CAST(value * value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS s2,
    date_trunc('hour', ts) AS hour_start
  FROM events
  WINDOW
    w24 AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW),
    w1  AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
    w   AS (PARTITION BY user_id)
)
SELECT event_id, stats.user_id, value,
  rolling_24h_count, rolling_24h_amount, rolling_1h_count, rolling_1h_amount,
  amount_pct_rank,
  ROUND(s1 / n, 6) AS user_avg_value,
  ROUND((value - s1 / n) /
        NULLIF(SQRT(GREATEST((s2 - s1 * s1 / n) / NULLIF(n - 1, 0), 0.0)), 0.0), 6) + 0.0 AS amount_zscore,
  hour_count, hour_amount,
  hour_count > 3 AS high_velocity_hour
FROM stats JOIN hourly USING (user_id, hour_start)
"""


# W3 + W4 — time since last event (feature_processor.py:85) AND first-seen
# flag (new-merchant-for-user, graph_neural_network.py:386-387), one row.
def q_recency_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = W.time_since_last(ev, "user_id", "ts")
    out = W.first_seen_flag(out, "user_id", "event_type", "ts", "event_id")
    return out.select(
        "event_id", "user_id", "event_type", "micros_since_last", "is_first_seen"
    )


SQL_RECENCY_FLAGS = """
SELECT event_id, user_id, event_type,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS micros_since_last,
       ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1 AS is_first_seen
FROM events
"""


QUERIES = {
    "last_n_per_user": q_last_n_per_user,
    "rolling_profile": q_rolling_profile,
    "recency_flags": q_recency_flags,
}

ORACLES = {
    "last_n_per_user": SQL_LAST_N,
    "rolling_profile": SQL_ROLLING_PROFILE,
    "recency_flags": SQL_RECENCY_FLAGS,
}
