"""Event-time windowed aggregations — SURVEY §2.5 A1-A11 over the events
stream table, batch form (the streaming forms attach watermarks — see
streaming/). DuckDB oracles reconstruct Spark's epoch-aligned window
assignment explicitly (cross join with the per-event window-start series for
sliding windows; gaps-and-islands for session windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.features import amount_category, geo_grid_cell
from ..operators import aggregations as A
from ..sources.testdata import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# A1 — sliding 5min/1min per-user velocity + composite velocity score
# (WindowProcessor.java:36-49,248-352). Thresholds scaled to the events
# table's value range; the reference-threshold version is
# functions/scoring.velocity_score.
# ---------------------------------------------------------------------------
def q_velocity_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A6/F5 velocity panel (merged round 12 to free the slot that
    promoted target_encoding; both branches are velocity-detection
    aggregates over the same events scan, each still hash-checked):
      method='sliding_5m_1m'  — the composite-scored sliding velocity;
      method='tumbling_5m_hf' — high-frequency detection, tumbling 5-min
          count with the post-agg HAVING (count >= 2); score/amount/ndv
          columns NULL on this branch.
    """
    ev = _events(spark, sf_dir)
    out = A.velocity_windows(
        ev, "user_id", "ts", "value", ndv_col="event_type", size="5 minutes", slide="1 minute"
    )
    cnt, amt, ndv = F.col("tx_count"), F.col("total_amount"), F.col("distinct_counterparties")
    score = (
        F.when(cnt >= 5, 0.5).when(cnt >= 3, 0.3).when(cnt >= 2, 0.15).otherwise(F.lit(0.0))
        + F.when(amt >= 500, 0.3).when(amt >= 200, 0.2).when(amt >= 50, 0.1).otherwise(F.lit(0.0))
        + F.when(ndv >= 4, 0.2).when(ndv >= 2, 0.1).otherwise(F.lit(0.0))
    )
    # rounded: DuckDB evaluates pure decimal-literal CASE sums in exact
    # decimal, Spark in double — identical to 6 dp, not to the last ulp
    sliding = (
        out.withColumn(
            "velocity_score", F.round(F.least(score, F.lit(1.0)), 6)
        )
        .drop("window_end")
        .select(
            F.lit("sliding_5m_1m").alias("method"),
            "window_start",
            "user_id",
            "tx_count",
            "total_amount",
            "distinct_counterparties",
            "velocity_score",
        )
    )
    hf = A.high_frequency(ev, "user_id", "ts", "5 minutes", min_count=2).select(
        F.lit("tumbling_5m_hf").alias("method"),
        "window_start",
        "user_id",
        "tx_count",
        F.lit(None).cast("double").alias("total_amount"),
        F.lit(None).cast("long").alias("distinct_counterparties"),
        F.lit(None).cast("double").alias("velocity_score"),
    )
    return sliding.unionAll(hf)


SQL_VELOCITY_SLIDING = """
WITH expanded AS (
  SELECT date_trunc('minute', ts) - k * INTERVAL 1 MINUTE AS window_start,
         user_id, event_type, value
  FROM events CROSS JOIN range(0, 5) t(k)
), agg AS (
  SELECT window_start, user_id,
         COUNT(*) AS tx_count,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
         COUNT(DISTINCT event_type) AS distinct_counterparties
  FROM expanded GROUP BY window_start, user_id
)
SELECT 'sliding_5m_1m' AS method, window_start, user_id, tx_count,
  total_amount, distinct_counterparties,
  ROUND(CAST(LEAST(
    CASE WHEN tx_count >= 5 THEN 0.5 WHEN tx_count >= 3 THEN 0.3 WHEN tx_count >= 2 THEN 0.15 ELSE 0.0 END
  + CASE WHEN total_amount >= 500 THEN 0.3 WHEN total_amount >= 200 THEN 0.2 WHEN total_amount >= 50 THEN 0.1 ELSE 0.0 END
  + CASE WHEN distinct_counterparties >= 4 THEN 0.2 WHEN distinct_counterparties >= 2 THEN 0.1 ELSE 0.0 END,
  1.0) AS DOUBLE), 6) AS velocity_score
FROM agg
UNION ALL
SELECT 'tumbling_5m_hf', window_start, user_id, tx_count,
  CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM (
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start, user_id,
         COUNT(*) AS tx_count
  FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
"""


# ---------------------------------------------------------------------------
# A2 — tumbling 1h per-key stats with exact population stddev + risk score
# (WindowProcessor.java:55-68,357-484; population variance at :447-457).
# Also carries A10's exact per-window user SET as a sorted CSV
# (RedisTransactionSink.java:227-262 keeps a HashSet<String> of users) —
# merged here round 10 to free an oracle-window slot (the r9
# doc_signatures pattern); both aggregates share the one (window,
# event_type) shuffle.
# ---------------------------------------------------------------------------
def q_hourly_type_stats_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    s1, s2, _ = A.exact_stddev_pop("value")
    out = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("tx_count"),
            s1.alias("_s1"),
            s2.alias("_s2"),
            F.countDistinct("user_id").alias("distinct_users"),
            F.sum(F.when(F.col("value") > 300, 1).otherwise(0)).alias("high_value_count"),
            F.sort_array(F.collect_set("user_id")).alias("_uset"),
        )
    )
    cnt = F.col("tx_count").cast("double")
    mean = F.col("_s1") / cnt
    var_pop = F.round(F.col("_s2") / cnt - mean * mean, 8)
    # + 0.0 normalizes IEEE negative zero: DuckDB's GREATEST(-0.0, 0.0)
    # keeps -0.0 and SQRT(-0.0) = -0.0, while Spark's greatest yields +0.0;
    # -0.0 + 0.0 = +0.0 on both engines (round-1 hash mismatch root cause).
    stddev = F.sqrt(F.greatest(var_pop, F.lit(0.0))) + F.lit(0.0)
    high_share = F.col("high_value_count") / cnt
    volatility = stddev / F.nullif(mean, F.lit(0.0))
    risk = F.least(
        high_share * 0.5
        + F.when(volatility > 2.0, 0.2).when(volatility > 1.0, 0.1).otherwise(F.lit(0.0)),
        F.lit(1.0),
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "tx_count",
        F.col("_s1").alias("total_amount"),
        F.round(mean, 6).alias("avg_amount"),
        F.round(stddev, 6).alias("stddev_pop_amount"),
        "distinct_users",
        "high_value_count",
        F.round(risk, 6).alias("risk_score"),
        F.concat_ws(",", F.transform("_uset", lambda x: x.cast("string"))).alias("user_set_csv"),
    )


SQL_HOURLY_TYPE_STATS = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS tx_count,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS s2,
         COUNT(DISTINCT user_id) AS distinct_users,
         CAST(SUM(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_count,
         array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_set_csv
  FROM events GROUP BY 1, 2
), derived AS (
  SELECT *,
         s1 / tx_count AS mean,
         SQRT(GREATEST(ROUND(s2 / tx_count - (s1 / tx_count) * (s1 / tx_count), 8), 0.0)) + 0.0 AS sd
  FROM agg
)
SELECT window_start, event_type, tx_count, s1 AS total_amount,
       ROUND(mean, 6) AS avg_amount,
       ROUND(sd, 6) AS stddev_pop_amount,
       distinct_users, high_value_count,
       ROUND(LEAST(
         (high_value_count / CAST(tx_count AS DOUBLE)) * 0.5
         + CASE WHEN sd / NULLIF(mean, 0.0) > 2.0 THEN 0.2
                WHEN sd / NULLIF(mean, 0.0) > 1.0 THEN 0.1 ELSE 0.0 END,
         1.0), 6) AS risk_score,
       user_set_csv
FROM derived
"""


# ---------------------------------------------------------------------------
# A3 — session windows, 30-min gap (WindowProcessor.java:74-87). Oracle is
# the classic gaps-and-islands rewrite.
# ---------------------------------------------------------------------------
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return A.session_aggregate(ev, "user_id", "ts", "value", "30 minutes")


SQL_USER_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
FROM numbered GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# A4 + A5 + A7 — the keyed-windowed-bucket panel (merged round 12 to free
# two oracle-window slots for the model_eval / volume_anomalies
# promotions; all three are the SAME shape — (window_start, bucket key,
# tx_count, decimal-summed total_amount) off one events scan — so a
# method-tagged union weakens nothing, each branch stays hash-checked):
#   method='pattern_10m_2m' — fraud-pattern key, sliding 10min/2min
#       (WindowProcessor.java:112-126,198-222):
#       key = pattern_{type}_{amount_bucket};
#   method='geo_15m'        — geographic grid clustering, 15-min tumbling
#       (WindowProcessor.java:93-106,173-193), lat/lon derived
#       deterministically from user_id (the fixture has no geo column —
#       the grid-key derivation is the operator);
#   method='amount_30m'     — amount-magnitude clustering, tumbling 30 min
#       (WindowProcessor.java:153-166,227-241), magnitude bucket via
#       explicit thresholds (a CASE form of floor(log10) exact at bucket
#       boundaries in every engine).
# ---------------------------------------------------------------------------
def q_pattern_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    key = F.concat_ws("_", F.lit("pattern"), F.col("event_type"), amount_category(F.col("value")))
    pattern = (
        ev.withColumn("pattern_key", key)
        .groupBy(F.window("ts", "10 minutes", "2 minutes").alias("w"), "pattern_key")
        .agg(
            F.count("*").alias("tx_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_amount"),
        )
        .select(
            F.lit("pattern_10m_2m").alias("method"),
            F.col("w.start").alias("window_start"),
            F.col("pattern_key").alias("bucket_key"),
            "tx_count",
            "total_amount",
        )
    )

    geo_ev = ev.withColumn(
        "lat", (F.col("user_id") % 140 - 70).cast("double")
    ).withColumn("lon", ((F.col("user_id") * 7) % 360 - 180).cast("double"))
    geo = A.keyed_tumbling_counts(
        geo_ev, geo_grid_cell(F.col("lat"), F.col("lon")), "bucket_key", "ts", "value", "15 minutes"
    ).select(F.lit("geo_15m").alias("method"), "window_start", "bucket_key", "tx_count", "total_amount")

    mag = (
        F.when(F.col("value") < 0.1, -2)
        .when(F.col("value") < 1, -1)
        .when(F.col("value") < 10, 0)
        .when(F.col("value") < 100, 1)
        .when(F.col("value") < 1000, 2)
        .otherwise(3)
    )
    amount_key = F.concat_ws("_", F.lit("amount"), mag.cast("string"))
    amount = A.keyed_tumbling_counts(
        ev, amount_key, "bucket_key", "ts", "value", "30 minutes"
    ).select(F.lit("amount_30m").alias("method"), "window_start", "bucket_key", "tx_count", "total_amount")

    return pattern.unionAll(geo).unionAll(amount)


SQL_PATTERN_BUCKETS = """
WITH expanded AS (
  SELECT make_timestamp((epoch_us(ts) // 120000000) * 120000000 - k * 120000000) AS window_start,
         'pattern_' || event_type || '_' ||
           CASE WHEN value < 10 THEN 'micro' WHEN value < 100 THEN 'small'
                WHEN value < 1000 THEN 'medium' WHEN value < 10000 THEN 'large'
                ELSE 'very_large' END AS pattern_key,
         value
  FROM events CROSS JOIN range(0, 5) t(k)
)
SELECT 'pattern_10m_2m' AS method, window_start, pattern_key AS bucket_key,
       COUNT(*) AS tx_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
FROM expanded GROUP BY 2, 3
UNION ALL
SELECT 'geo_15m', time_bucket(INTERVAL 15 MINUTE, ts),
       'geo_' || CAST(FLOOR(CAST(user_id % 140 - 70 AS DOUBLE)) AS BIGINT)
              || '_' || CAST(FLOOR(CAST((user_id * 7) % 360 - 180 AS DOUBLE)) AS BIGINT),
       COUNT(*),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'amount_30m', time_bucket(INTERVAL 30 MINUTE, ts),
       'amount_' || CAST(CASE WHEN value < 0.1 THEN -2 WHEN value < 1 THEN -1
                              WHEN value < 10 THEN 0 WHEN value < 100 THEN 1
                              WHEN value < 1000 THEN 2 ELSE 3 END AS VARCHAR),
       COUNT(*),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM events GROUP BY 2, 3
"""


# ---------------------------------------------------------------------------
# A9 — hourly + daily global rollups (RedisTransactionSink.java:164-222),
# both grains in one result with a grain tag.
# ---------------------------------------------------------------------------
def q_hourly_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)

    def grain(size: str, tag: str) -> DataFrame:
        return (
            ev.groupBy(F.window("ts", size).alias("w"))
            .agg(
                F.count("*").alias("tx_count"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_amount"),
                F.sum(F.when(F.col("value") > 300, 1).otherwise(0)).alias("high_value_count"),
            )
            .select(
                F.lit(tag).alias("grain"),
                F.col("w.start").alias("window_start"),
                "tx_count",
                "total_amount",
                "high_value_count",
            )
        )

    return grain("1 hour", "hourly").unionAll(grain("1 day", "daily"))


SQL_HOURLY_DAILY = """
SELECT 'hourly' AS grain, date_trunc('hour', ts) AS window_start, COUNT(*) AS tx_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
       CAST(SUM(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_count
FROM events GROUP BY 2
UNION ALL
SELECT 'daily', date_trunc('day', ts), COUNT(*),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE),
       CAST(SUM(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS BIGINT)
FROM events GROUP BY 2
"""


# ---------------------------------------------------------------------------
# A11 — per-feature statistics (FeatureStore.java:204-321): one-pass exact
# stats per numeric column.
# ---------------------------------------------------------------------------
def q_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = A.feature_statistics(ev, ["value", "user_id", "event_id"])
    return out.select(
        "feature", "n", F.round("sum", 4).alias("sum"), "min", "max", "null_count",
        F.round("mean", 6).alias("mean"),
    )


SQL_FEATURE_STATS = """
SELECT 'value' AS feature, COUNT(value) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum,
       CAST(MIN(value) AS DOUBLE) AS min, CAST(MAX(value) AS DOUBLE) AS max,
       COUNT(*) - COUNT(value) AS null_count,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value), 6) AS mean
FROM events
UNION ALL
SELECT 'user_id', COUNT(user_id),
       ROUND(CAST(SUM(CAST(user_id AS DECIMAL(28,6))) AS DOUBLE), 4),
       CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
       COUNT(*) - COUNT(user_id),
       ROUND(CAST(SUM(CAST(user_id AS DECIMAL(28,6))) AS DOUBLE) / COUNT(user_id), 6)
FROM events
UNION ALL
SELECT 'event_id', COUNT(event_id),
       ROUND(CAST(SUM(CAST(event_id AS DECIMAL(28,6))) AS DOUBLE), 4),
       CAST(MIN(event_id) AS DOUBLE), CAST(MAX(event_id) AS DOUBLE),
       COUNT(*) - COUNT(event_id),
       ROUND(CAST(SUM(CAST(event_id AS DECIMAL(28,6))) AS DOUBLE) / COUNT(event_id), 6)
FROM events
"""


# ---------------------------------------------------------------------------
# Time-series resample + gap fill (operators/timeseries.py): per-user hourly
# average purchase value, densified over each user's own [first, last]
# bucket span with forward fill and linear interpolation. Oracle rebuilds
# the spine with generate_series and the fills with IGNORE NULLS windows —
# DuckDB's native form of the same operator.
# ---------------------------------------------------------------------------
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries as T

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    hourly = T.resample(ev, "user_id", "ts", "value", step="1 hour", agg="avg")
    return T.gap_fill(
        hourly, "user_id", "bucket", "value", step="1 hour", interpolate=True
    )


SQL_GAP_FILL = """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1
), spine AS (
  SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL '1 hour')) AS bucket
  FROM span
), dense AS (
  SELECT s.user_id, s.bucket, b.value, b.value IS NULL AS is_gap
  FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.bucket = b.bucket
), f AS (
  SELECT *,
    LAST_VALUE(value IGNORE NULLS) OVER w_back AS value_ffill,
    LAST_VALUE(CASE WHEN NOT is_gap THEN bucket END IGNORE NULLS)
      OVER w_back AS prev_t,
    FIRST_VALUE(value IGNORE NULLS) OVER w_fwd AS next_v,
    FIRST_VALUE(CASE WHEN NOT is_gap THEN bucket END IGNORE NULLS)
      OVER w_fwd AS next_t
  FROM dense
  WINDOW
    w_back AS (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket, value, is_gap, value_ffill,
  CASE WHEN NOT is_gap THEN value
       WHEN next_v IS NULL THEN value_ffill
       WHEN value_ffill IS NOT NULL THEN
         -- parens around the ratio: Spark computes x*(A/B); bare x*A/B
         -- associates as (x*A)/B and differs in the last ulp
         FLOOR((value_ffill + (next_v - value_ffill)
           * (CAST(epoch_us(bucket) - epoch_us(prev_t) AS DOUBLE)
              / CAST(epoch_us(next_t) - epoch_us(prev_t) AS DOUBLE))) * 1e6 + 0.5) / 1e6
  END AS value_interp
FROM f
"""


QUERIES = {
    "velocity_sliding": q_velocity_sliding,
    "gap_fill": q_gap_fill,
    "hourly_type_stats": q_hourly_type_stats_full,
    "user_sessions": q_user_sessions,
    "pattern_buckets": q_pattern_buckets,
    "hourly_daily_rollup": q_hourly_daily_rollup,
    "feature_stats": q_feature_stats,
}

ORACLES = {
    "velocity_sliding": SQL_VELOCITY_SLIDING,
    "gap_fill": SQL_GAP_FILL,
    "hourly_type_stats": SQL_HOURLY_TYPE_STATS,
    "user_sessions": SQL_USER_SESSIONS,
    "pattern_buckets": SQL_PATTERN_BUCKETS,
    "hourly_daily_rollup": SQL_HOURLY_DAILY,
    "feature_stats": SQL_FEATURE_STATS,
}
