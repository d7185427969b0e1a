"""resample + gap_fill semantics: bucket alignment, agg modes, spine
densification bounds, forward fill, interpolation arithmetic, and the
no-cross-join plan shape."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.timeseries import gap_fill, resample


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _series(spark):
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:07:00"), 10.0),
            ("a", _ts("2024-01-01 10:22:00"), 20.0),  # same 10:00 hour bucket
            ("a", _ts("2024-01-01 13:40:00"), 40.0),  # 2-bucket interior gap
            ("b", _ts("2024-01-01 00:30:00"), 5.0),   # singleton key
        ],
        ["k", "ts", "value"],
    )


def test_resample_avg_alignment(spark):
    out = resample(_series(spark), "k", "ts", "value", step="1 hour", agg="avg")
    rows = {(r["k"], r["bucket"]): r["value"] for r in out.collect()}
    assert rows[("a", _ts("2024-01-01 10:00:00"))] == 15.0
    assert rows[("a", _ts("2024-01-01 13:00:00"))] == 40.0
    assert rows[("b", _ts("2024-01-01 00:00:00"))] == 5.0
    assert len(rows) == 3


def test_resample_agg_modes(spark):
    df = _series(spark)
    assert {
        r["value"]
        for r in resample(df, "k", "ts", "value", step="1 hour", agg="sum")
        .filter(F.col("k") == "a")
        .collect()
    } == {30.0, 40.0}
    last = {
        (r["k"], r["bucket"]): r["value"]
        for r in resample(df, "k", "ts", "value", step="1 hour", agg="last").collect()
    }
    assert last[("a", _ts("2024-01-01 10:00:00"))] == 20.0  # 10:22 beats 10:07


def test_gap_fill_spine_and_fills(spark):
    hourly = resample(_series(spark), "k", "ts", "value", step="1 hour", agg="avg")
    out = gap_fill(hourly, "k", "bucket", "value", step="1 hour")
    a = {r["bucket"]: r for r in out.filter(F.col("k") == "a").collect()}
    # spine covers 10:00..13:00 inclusive — 4 buckets, 2 of them gaps
    assert sorted(a) == [
        _ts("2024-01-01 10:00:00"),
        _ts("2024-01-01 11:00:00"),
        _ts("2024-01-01 12:00:00"),
        _ts("2024-01-01 13:00:00"),
    ]
    assert a[_ts("2024-01-01 11:00:00")]["is_gap"] and a[_ts("2024-01-01 12:00:00")]["is_gap"]
    # forward fill carries 15.0 through the gap
    assert a[_ts("2024-01-01 11:00:00")]["value_ffill"] == 15.0
    assert a[_ts("2024-01-01 12:00:00")]["value_ffill"] == 15.0
    # linear interpolation: 15 → 40 over 3 steps
    assert abs(a[_ts("2024-01-01 11:00:00")]["value_interp"] - (15 + 25 / 3)) < 1e-6
    assert abs(a[_ts("2024-01-01 12:00:00")]["value_interp"] - (15 + 50 / 3)) < 1e-6
    # observed buckets pass their value through
    assert a[_ts("2024-01-01 10:00:00")]["value_interp"] == 15.0
    # singleton key: one bucket, no gaps
    b = out.filter(F.col("k") == "b").collect()
    assert len(b) == 1 and not b[0]["is_gap"]


def test_gap_fill_no_cross_join_plan(spark):
    hourly = resample(_series(spark), "k", "ts", "value", step="1 hour", agg="avg")
    plan = (
        gap_fill(hourly, "k", "bucket", "value", step="1 hour")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
