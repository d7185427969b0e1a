"""Time-series suite queries: decayed_velocity is rows-only
(transcendental 2^x decay weights; brute-force replay parity lives in
tests/test_time_decay.py); volume_anomalies is oracled (integer counts
make every robust stat an exact dyadic rational — see its note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import time_decayed_sum
from ..sources.testdata import load_table


def q_decayed_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user velocity at every event: decayed event
    count and decayed value mass with a 1-hour half-life — the smooth
    refinement of the fixed-window velocity counters (A1/A8). Rounded to
    6 dp (suite transcendental rule) and fully ordered."""
    ev = load_table(spark, sf_dir, "events")
    out = time_decayed_sum(
        ev, "user_id", ts_col="ts", value_col=None,
        half_life="1 hour", out_col="_dc", tiebreak_cols=["event_id"],
    )
    out = time_decayed_sum(
        out, "user_id", ts_col="ts", value_col="value",
        half_life="1 hour", out_col="_dv", tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("_dc", 6).alias("decayed_events"),
        F.round("_dv", 6).alias("decayed_value"),
    ).orderBy("event_id")


# Seasonal volume anomaly alarms (operators/timeseries.seasonal_anomalies):
# hourly per-type event counts vs their hour-of-day robust median/MAD
# baseline (first ~70% of event time). ORACLED since round 12 (the
# pattern_buckets panel merge freed the slot). The feared
# engine-interpolation hazard is absent for THIS series: the inputs are
# integer counts, so Spark percentile() and DuckDB percentile_cont()
# both interpolate a + (b-a)*0.5 over integers (exact halves), MAD
# interpolates over halves (exact quarters) — every stat is an exactly
# representable dyadic rational whichever interpolation tree the engine
# uses. The score is then ONE IEEE division dev/(1.4826*MAD) of
# bit-identical operands; spike-detection/no-leakage laws stay pinned in
# tests/test_anomalies.py.
def q_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import resample, seasonal_anomalies
    from ..sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = resample(ev, "event_type", "ts", "value", step="1 hour", agg="count")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) * 7 // 10  # 70% point of the span, tz-free
    out = seasonal_anomalies(hourly, "event_type", baseline_until=cut)
    return out.select(
        "event_type",
        "bucket",
        F.col("value").cast("long").alias("n_events"),
        "phase",
        "expected",
        "n_baseline",
        F.round("score", 6).alias("score"),
        "is_anomaly",
    ).orderBy("event_type", "bucket")


# The baseline cutoff replays the Spark query's driver-side computation
# lo + (hi-lo)*7//10 in epoch-microsecond integer arithmetic (Python
# timedelta floor-division floors at µs — identical to BIGINT // 10).
# is_anomaly compares the UNROUNDED score (matching seasonal_anomalies,
# which flags before the suite's 6-dp output rounding).
SQL_VOLUME_ANOMALIES = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
         COUNT(value)::BIGINT AS v
  FROM events GROUP BY 1, 2
), span AS (
  SELECT make_timestamp(epoch_us(MIN(ts))
           + ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) * 7) // 10) AS cut
  FROM events
), base AS (
  SELECT event_type, hour(bucket) AS phase, v
  FROM hourly, span WHERE bucket <= cut
), med AS (
  SELECT event_type, phase,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med,
         COUNT(*)::BIGINT AS n_baseline
  FROM base GROUP BY 1, 2
), mad AS (
  SELECT b.event_type, b.phase,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY ABS(b.v - m.med)) AS mad
  FROM base b JOIN med m ON b.event_type = m.event_type AND b.phase = m.phase
  GROUP BY 1, 2
), sc AS (
  SELECT h.event_type, h.bucket, h.v, hour(h.bucket) AS phase
  FROM hourly h, span WHERE h.bucket > cut
), raw AS (
  SELECT s.event_type, s.bucket, s.v, s.phase, m.med, m.n_baseline,
         CASE WHEN m.med IS NULL THEN NULL
              WHEN 1.4826 * d.mad > 0 THEN ABS(s.v - m.med) / (1.4826 * d.mad)
              WHEN ABS(s.v - m.med) > 0 THEN 'infinity'::DOUBLE
              ELSE 0.0 END AS score
  FROM sc s
  LEFT JOIN med m ON s.event_type = m.event_type AND s.phase = m.phase
  LEFT JOIN mad d ON s.event_type = d.event_type AND s.phase = d.phase
)
SELECT event_type, bucket, v AS n_events, phase,
       med AS expected, n_baseline,
       ROUND(score, 6) AS score,
       score > 3.5 AS is_anomaly
FROM raw
ORDER BY event_type, bucket
"""

QUERIES = {
    "decayed_velocity": q_decayed_velocity,
    "volume_anomalies": q_volume_anomalies,
}
ORACLES: dict[str, str] = {"volume_anomalies": SQL_VOLUME_ANOMALIES}
