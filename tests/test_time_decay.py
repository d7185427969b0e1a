"""Time-decayed running sums (operators/timeseries.time_decayed_sum):
half-life law, brute-force replay, per-key isolation, partitioning
invariance, and the decayed-count form."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from realtime_fraud_detection_spark.operators.timeseries import (
    time_decayed_sum,
)


def _ts(minute, second=0):
    return datetime(2026, 1, 1, 12, 0, 0) + timedelta(
        minutes=minute, seconds=second
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "user string, ts timestamp, value double")


def test_half_life_law(spark):
    rows = [("u", _ts(0), 1.0), ("u", _ts(60), 0.0)]
    out = {
        r.ts: r.decayed_sum
        for r in time_decayed_sum(
            _df(spark, rows), "user", half_life="1 hour"
        ).collect()
    }
    assert out[_ts(0)] == pytest.approx(1.0)
    assert out[_ts(60)] == pytest.approx(0.5)  # exactly one half-life later


def test_brute_force_replay(spark):
    rows = [
        ("u", _ts(i, s), float(v))
        for i, s, v in [
            (0, 0, 3.0), (7, 11, 1.5), (22, 40, 2.25),
            (41, 5, 0.5), (59, 59, 4.0),
        ]
    ] + [("w", _ts(3), 10.0), ("w", _ts(33), 7.0)]
    got = {
        (r.user, r.ts): r.decayed_sum
        for r in time_decayed_sum(
            _df(spark, rows), "user", half_life="15 minutes"
        ).collect()
    }
    h = 15 * 60.0
    for u, t, _ in rows:
        expect = sum(
            v * 2.0 ** (-((t - tj).total_seconds() / h))
            for (uj, tj, v) in rows
            if uj == u and tj <= t
        )
        assert got[(u, t)] == pytest.approx(expect, rel=1e-12), (u, t)


def test_keys_isolated_and_monotone_in_events(spark):
    base = [("a", _ts(0), 1.0), ("a", _ts(30), 1.0), ("b", _ts(30), 5.0)]
    out = {
        (r.user, r.ts): r.decayed_sum
        for r in time_decayed_sum(
            _df(spark, base), "user", half_life="1 hour"
        ).collect()
    }
    assert out[("b", _ts(30))] == pytest.approx(5.0)  # a's events invisible
    assert out[("a", _ts(30))] > out[("a", _ts(0))] - 1.0  # decays, never negative


def test_partitioning_invariance_bit_exact(spark):
    rows = [
        ("u%d" % (i % 5), _ts(i % 60, i % 50), float(i % 7) + 0.25)
        for i in range(200)
    ]
    df = _df(spark, rows)
    a = sorted(
        (r.user, r.ts, r.decayed_sum)
        for r in time_decayed_sum(df, "user", half_life="5 minutes").collect()
    )
    b = sorted(
        (r.user, r.ts, r.decayed_sum)
        for r in time_decayed_sum(
            df.repartition(13), "user", half_life="5 minutes",
            tiebreak_cols=["value"],
        ).collect()
    )
    # unique (user, ts) pairs here -> the per-key accumulation order is
    # fixed, so values match bit-for-bit whatever the input partitioning
    assert a == b


def test_decayed_count(spark):
    rows = [("u", _ts(0), 9.9), ("u", _ts(60), 9.9)]
    out = {
        r.ts: r.decayed_events
        for r in time_decayed_sum(
            _df(spark, rows), "user", value_col=None,
            half_life="1 hour", out_col="decayed_events",
        ).collect()
    }
    assert out[_ts(60)] == pytest.approx(1.5)  # 1 + 0.5, values ignored


def test_span_overflow_guard_raises(spark):
    """A key spanning > 1000 half-lives must RAISE with guidance, not emit
    inf/NaN rows (the staged 2^x factorization overflows double past
    ~1023 half-lives)."""
    rows = [
        ("u", _ts(0), 1.0),
        ("u", _ts(1001 * 60), 1.0),  # 1001 hours later at 1-minute ticks
    ]
    df = time_decayed_sum(_df(spark, rows), "user", half_life="1 minute")
    with pytest.raises(Exception, match="1000 half-lives"):
        df.collect()


def test_span_guard_boundary_passes(spark):
    """At exactly 1000 half-lives the guard still passes and the value is
    finite (2^1000 is representable; only ~1024 overflows)."""
    import math

    rows = [("u", _ts(0), 1.0), ("u", _ts(1000), 1.0)]
    out = {
        r.ts: r.decayed_sum
        for r in time_decayed_sum(
            _df(spark, rows), "user", half_life="1 minute"
        ).collect()
    }
    v = out[_ts(1000)]
    assert math.isfinite(v)
    assert v == pytest.approx(1.0)  # the 1000-half-life-old event decayed away
