"""Watermark policy — SURVEY §2.9.

The reference's bounded-out-of-orderness settings, per stream:
  * 5 s   main transaction pipeline (FraudDetectionJob.java:54)
  * 10 s  windowed aggregations    (WindowProcessor.java:41,60,79,98,118,137)
  * 1 min historical-pattern joins (StreamJoiner.java:93)

Late data beyond the watermark is dropped — the Flink default with no
allowedLateness, which is also Spark's semantics, so parity is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

WATERMARKS = {
    "pipeline": "5 seconds",
    "aggregation": "10 seconds",
    "pattern_join": "1 minute",
}


def with_watermark(df: DataFrame, role: str = "pipeline", ts: str = "ts") -> DataFrame:
    return df.withWatermark(ts, WATERMARKS[role])
