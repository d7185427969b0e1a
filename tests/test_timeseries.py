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


def test_time_weighted_avg_hand_computed(spark):
    from realtime_fraud_detection_spark.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 10:00:00"), 10.0),
            ("u", _ts("2024-01-01 10:30:00"), 20.0),
            ("u", _ts("2024-01-01 12:00:00"), 30.0),  # trailing observation
            ("w", _ts("2024-01-01 00:15:00"), 5.0),   # single observation key
        ],
        ["k", "ts", "value"],
    )
    out = {
        (r["k"], r["bucket"]): r
        for r in time_weighted_avg(df, "k", "ts", "value", step="1 hour").collect()
    }
    # 10:00 bucket: 30min@10 + 30min@20 -> 15
    b10 = out[("u", _ts("2024-01-01 10:00:00"))]
    assert b10["twa"] == 15.0 and b10["covered_us"] == 3600 * 1_000_000
    # 11:00 bucket: fully held at 20
    b11 = out[("u", _ts("2024-01-01 11:00:00"))]
    assert b11["twa"] == 20.0 and b11["covered_us"] == 3600 * 1_000_000
    # 12:00 bucket: only the trailing point reading (no phantom overlap
    # from the 10:30->12:00 segment that ENDS exactly at 12:00)
    b12 = out[("u", _ts("2024-01-01 12:00:00"))]
    assert b12["twa"] == 30.0 and b12["covered_us"] == 1 and b12["n_segments"] == 1
    # single-observation key: one point reading in its own bucket
    bw = out[("w", _ts("2024-01-01 00:00:00"))]
    assert bw["twa"] == 5.0 and bw["covered_us"] == 1
    assert len(out) == 4


def test_time_weighted_avg_matches_duckdb(spark):
    """Parity on the events fixture purchases (segments crossing many
    hourly buckets) against a DuckDB formulation of the same semantics."""
    import duckdb

    from realtime_fraud_detection_spark.operators.timeseries import time_weighted_avg
    from realtime_fraud_detection_spark.sources.testdata import load_table
    from conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "purchase"
    )
    got = (
        time_weighted_avg(ev, "user_id", "ts", "value", step="1 hour")
        .orderBy("user_id", "bucket")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH seg AS (
          SELECT user_id, ts AS s,
                 COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) AS e,
                 value AS v
          FROM read_parquet('{SF_SMOKE}/events.parquet') WHERE event_type = 'purchase'
        ), spans AS (
          SELECT user_id, s, e, v,
                 UNNEST(generate_series(date_trunc('hour', s), date_trunc('hour', e),
                                        INTERVAL '1 hour')) AS bucket
          FROM seg
        ), weighted AS (
          SELECT user_id, bucket, v, s, e,
                 CASE WHEN s = e THEN 1
                      ELSE epoch_us(LEAST(e, bucket + INTERVAL '1 hour'))
                           - epoch_us(GREATEST(s, bucket)) END AS w_us
          FROM spans
          WHERE s = e OR epoch_us(LEAST(e, bucket + INTERVAL '1 hour'))
                         > epoch_us(GREATEST(s, bucket))
        )
        SELECT user_id, bucket,
               FLOOR((CAST(SUM(CAST(v AS DECIMAL(12,2)) * w_us) AS DOUBLE)
                      / SUM(w_us)) * 1e6 + 0.5) / 1e6 AS twa,
               COUNT(*) AS n_segments, SUM(w_us) AS covered_us
        FROM weighted GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchdf()
    assert len(got) == len(want)
    for col in ["user_id", "n_segments", "covered_us"]:
        assert (got[col].values == want[col].astype("int64").values).all(), col
    import numpy as np

    assert (
        np.frombuffer(got["twa"].values.tobytes(), dtype="int64")
        == np.frombuffer(want["twa"].values.tobytes(), dtype="int64")
    ).all()
