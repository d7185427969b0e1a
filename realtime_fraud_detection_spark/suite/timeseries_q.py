"""Time-series suite queries appended AFTER the oracle window (rows-only
— transcendental 2^x decay weights; brute-force replay parity lives in
tests/test_time_decay.py)."""

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
# baseline (first ~70% of event time). Rows-only (exact interpolated
# percentiles have engine-interpolation hazards at the hash boundary);
# spike-detection/no-leakage laws pinned in tests/test_anomalies.py.
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


QUERIES = {
    "decayed_velocity": q_decayed_velocity,
    "volume_anomalies": q_volume_anomalies,
}
ORACLES: dict[str, str] = {}
