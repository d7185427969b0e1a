"""seasonal_anomalies (operators/timeseries.py): hand-built series with a
known seasonal pattern and injected spikes; no-leakage split; MAD-zero
flatline semantics; composition with resample on the events fixture."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.timeseries import (
    resample,
    seasonal_anomalies,
)

T0 = datetime(2026, 1, 1)


def _series(spark, days=10, spike_day=9, spike_hour=3):
    """Hourly series: value = 100 + 10*hour, tiny deterministic wiggle;
    one injected 10x spike after the baseline split."""
    rows = []
    for d in range(days):
        for h in range(24):
            v = 100.0 + 10 * h + (d % 3)  # wiggle gives MAD > 0
            if d == spike_day and h == spike_hour:
                v *= 10
            rows.append(("m1", T0 + timedelta(days=d, hours=h), v))
    return spark.createDataFrame(rows, "key string, bucket timestamp, value double")


def test_spike_flagged_normal_hours_not(spark):
    df = _series(spark)
    out = seasonal_anomalies(
        df, "key", baseline_until=T0 + timedelta(days=8)
    ).collect()
    flagged = [(r["bucket"], r["score"]) for r in out if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0][0] == T0 + timedelta(days=9, hours=3)
    # expected value is the per-hour baseline median
    by_bucket = {r["bucket"]: r for r in out}
    norm = by_bucket[T0 + timedelta(days=9, hours=5)]
    assert norm["expected"] == 150.0 + 1  # median of 150+{0,1,2} wiggles
    assert norm["score"] < 3.5 and not norm["is_anomaly"]


def test_baseline_excludes_scored_window(spark):
    # the spike lands AT the split boundary + 1h: putting it in the scored
    # window must not change the baseline stats (no self-laundering)
    clean = _series(spark, spike_day=99)
    spiky = _series(spark, spike_day=8, spike_hour=23)  # last scored hour? no:
    # split at day 8 hour 22 -> the spike (day 8, 23h) is scored, not baseline
    split = T0 + timedelta(days=8, hours=22)
    base_clean = {
        (r["phase"], r["expected"])
        for r in seasonal_anomalies(clean, "key", baseline_until=split).collect()
    }
    base_spiky = {
        (r["phase"], r["expected"])
        for r in seasonal_anomalies(spiky, "key", baseline_until=split).collect()
    }
    assert base_clean == base_spiky


def test_flatline_mad_zero_semantics(spark):
    rows = [("m", T0 + timedelta(hours=i), 5.0) for i in range(48)]
    rows += [("m", T0 + timedelta(hours=48), 5.0)]
    rows += [("m", T0 + timedelta(hours=49), 6.0)]
    df = spark.createDataFrame(rows, "key string, bucket timestamp, value double")
    out = {
        r["bucket"]: r
        for r in seasonal_anomalies(
            df, "key", baseline_until=T0 + timedelta(hours=47)
        ).collect()
    }
    same = out[T0 + timedelta(hours=48)]
    moved = out[T0 + timedelta(hours=49)]
    assert same["score"] == 0.0 and not same["is_anomaly"]
    assert moved["score"] == float("inf") and moved["is_anomaly"]


def test_unseen_phase_scores_null(spark):
    rows = [("m", T0 + timedelta(days=d), 1.0) for d in range(3)]  # midnight only
    rows.append(("m", T0 + timedelta(days=3, hours=5), 1.0))  # new phase
    df = spark.createDataFrame(rows, "key string, bucket timestamp, value double")
    out = seasonal_anomalies(
        df, "key", baseline_until=T0 + timedelta(days=2)
    ).collect()
    novel = [r for r in out if r["phase"] == 5][0]
    assert novel["expected"] is None and novel["is_anomaly"] is None


def test_composes_with_resample_on_fixture(spark):
    from realtime_fraud_detection_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    hourly = resample(ev, "event_type", "ts", "value", step="1 hour", agg="count")
    split = ev.agg(F.expr("percentile_approx(ts, 0.7)")).first()[0]
    out = seasonal_anomalies(
        hourly, "event_type", baseline_until=split
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["score"] is None or r["score"] >= 0 for r in rows)
    # deterministic across partitionings
    again = seasonal_anomalies(
        hourly.repartition(7), "event_type", baseline_until=split
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
