"""Event-time silence detection: a key quiet for > gap fires exactly one
alert once the watermark passes last_seen + gap; active keys never fire.
Exercises the one-batch watermark lag (CLAUDE.md) explicitly."""

from __future__ import annotations

import time

import pandas as pd

from realtime_fraud_detection_spark.streaming.pipeline import to_memory_sink
from realtime_fraud_detection_spark.streaming.stateful import silence_alert_stream

BASE = pd.Timestamp("2024-01-01 10:00:00")


def test_silent_key_fires_active_key_does_not(spark, tmp_path, drain_stream):
    # u1: two events then silence. u2: keeps emitting, advancing the
    # watermark past u1's last_seen + gap.
    batches = [
        pd.DataFrame(
            {
                "user_id": ["u1", "u1", "u2"],
                "ts": [BASE, BASE + pd.Timedelta("1 min"), BASE],
            }
        ),
        pd.DataFrame(
            {"user_id": ["u2"], "ts": [BASE + pd.Timedelta("20 min")]}
        ),
        # two more u2 batches so the (one-batch-lagged) watermark passes
        # u1's 10:01 + 10 min while u2's own gap clock keeps resetting
        pd.DataFrame(
            {"user_id": ["u2"], "ts": [BASE + pd.Timedelta("25 min")]}
        ),
        pd.DataFrame(
            {"user_id": ["u2"], "ts": [BASE + pd.Timedelta("30 min")]}
        ),
    ]
    src = str(tmp_path / "src")
    for b in batches:
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = to_memory_sink(
        silence_alert_stream(stream, gap="10 minutes", watermark="1 minute"),
        "silence_test",
        str(tmp_path / "ck"),
        "append",
    )
    drain_stream(q, "silence_test", expect=1, timeout=180)
    got = spark.sql("select * from silence_test").toPandas()
    u1 = got[got["user_id"] == "u1"]
    assert len(u1) == 1, got
    assert u1.iloc[0]["last_seen"] == BASE + pd.Timedelta("1 min")
    assert u1.iloc[0]["events_seen"] == 2
    # u2 never fires: its 10:00->10:20 gap exceeds the threshold on the
    # event-time axis, but the (one-batch-lagged) watermark was still at
    # 10:00 when the 10:20 event re-armed the timer — timers fire only
    # when the WATERMARK crosses them, the same no-late-alert rule as
    # Flink's event-time timers; the later 5-min spacings stay inside the
    # gap and the final silence is beyond the last watermark
    assert len(got[got["user_id"] == "u2"]) == 0
