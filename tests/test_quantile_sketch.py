"""DDSketch quantile rollups (operators/quantile_sketch.py): the
relative-error guarantee vs exact order statistics, the mergeability
law (hour partials summed to day == day partials built directly —
bit-identical counts AND estimates), sign/zero handling, parquet
persistence, and stream==batch partial parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.quantile_sketch import (
    gamma_for,
    merge_quantile_sketch,
    quantile_sketch_partials,
    sketch_quantiles,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

ALPHA = 0.01
QS = [0.5, 0.95, 0.99]


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def _exact_order_stats(values: list[float], qs: list[float]) -> dict[float, float]:
    s = sorted(values)
    return {q: s[math.floor(q * (len(s) - 1))] for q in qs}


def test_relative_error_guarantee_per_hour(spark):
    """Every estimate is within α (relative) of the order statistic at
    index floor(q*(n-1)) — the DDSketch guarantee, checked per hour on
    the real fixture values."""
    ev = _events(spark)
    partials = quantile_sketch_partials(ev, "ts", "value", alpha=ALPHA)
    got = {
        r["hour"]: r
        for r in sketch_quantiles(partials, QS, ["hour"], alpha=ALPHA).collect()
    }
    raw: dict = {}
    for r in ev.select(F.date_trunc("hour", "ts").alias("h"), "value").collect():
        raw.setdefault(r["h"], []).append(r["value"])
    assert set(got) == set(raw)
    for h, vals in raw.items():
        exact = _exact_order_stats(vals, QS)
        assert got[h]["n"] == len(vals)
        for q in QS:
            est = got[h][f"p{q * 100:g}".replace(".", "_")]
            true = exact[q]
            assert abs(est - true) <= ALPHA * abs(true) + 1e-12, (h, q, est, true)


def test_mergeability_bit_exact(spark):
    """Summing hour partials to day grain must equal building day
    partials directly from the events — identical (sign, bucket, cnt)
    rows, hence identical estimates."""
    ev = _events(spark)
    hourly = quantile_sketch_partials(ev, "ts", "value", alpha=ALPHA)
    rolled = merge_quantile_sketch(hourly, "day")
    direct = quantile_sketch_partials(
        ev, "ts", "value", alpha=ALPHA, grain="day"
    ).withColumnRenamed("hour", "day")
    as_set = lambda df: {  # noqa: E731
        (r["day"], r["sign"], r["bucket"], r["cnt"]) for r in df.collect()
    }
    assert as_set(rolled) == as_set(direct)
    qa = sketch_quantiles(rolled, QS, ["day"], alpha=ALPHA).collect()
    qb = sketch_quantiles(direct, QS, ["day"], alpha=ALPHA).collect()
    assert sorted(map(tuple, qa)) == sorted(map(tuple, qb))


def test_signs_and_zeros(spark):
    """Negatives sort before zeros before positives; the zero bucket
    estimates exactly 0.0; each estimate stays within α of its order
    statistic (absolute α·|true| bound degrades to exact at 0)."""
    vals = [-400.0, -3.5, 0.0, 0.0, 2.0, 50.0, 51.0, 52.0, 1000.0]
    df = spark.createDataFrame(
        [(f"2024-01-01 00:00:0{i % 10}", v) for i, v in enumerate(vals)],
        "ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    partials = quantile_sketch_partials(df, "ts", "value", alpha=ALPHA)
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    row = sketch_quantiles(partials, qs, ["hour"], alpha=ALPHA).collect()[0]
    exact = _exact_order_stats(vals, qs)
    for q in qs:
        est = row[f"p{q * 100:g}".replace(".", "_")]
        true = exact[q]
        assert abs(est - true) <= ALPHA * abs(true) + 1e-12, (q, est, true)
    # p25 lands on an exact zero → the sketch must return exactly 0.0
    assert row["p25"] == 0.0


def test_bucket_estimate_bound_is_tight():
    """γ-grid arithmetic: the bucket midpoint 2γ^b/(γ+1) is within α of
    BOTH bucket edges (γ^(b-1), γ^b] — i.e. of every representable
    value."""
    g = gamma_for(ALPHA)
    for b in (-5, 0, 7):
        mid = 2.0 * g**b / (g + 1.0)
        lo, hi = g ** (b - 1), g**b
        assert abs(mid - hi) <= ALPHA * hi * (1 + 1e-12)
        assert abs(mid - lo) <= ALPHA * lo * (1 + 1e-12)


def test_partials_survive_parquet(spark, tmp_path):
    ev = _events(spark)
    partials = quantile_sketch_partials(ev, "ts", "value", alpha=ALPHA)
    p = str(tmp_path / "qsk")
    partials.write.parquet(p)
    reread = spark.read.parquet(p)
    a = sketch_quantiles(
        merge_quantile_sketch(partials, "day"), QS, ["day"], alpha=ALPHA
    ).collect()
    b = sketch_quantiles(
        merge_quantile_sketch(reread, "day"), QS, ["day"], alpha=ALPHA
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_keyed_partials(spark):
    ev = _events(spark)
    partials = quantile_sketch_partials(
        ev, "ts", "value", key_cols=["event_type"], alpha=ALPHA
    )
    day = merge_quantile_sketch(partials, "day", key_cols=["event_type"])
    got = {
        (r["event_type"], r["day"]): r
        for r in sketch_quantiles(
            day, [0.5], ["event_type", "day"], alpha=ALPHA
        ).collect()
    }
    raw: dict = {}
    for r in ev.select(
        "event_type", F.date_trunc("day", "ts").alias("d"), "value"
    ).collect():
        raw.setdefault((r["event_type"], r["d"]), []).append(r["value"])
    assert set(got) == set(raw)
    for k, vals in raw.items():
        true = _exact_order_stats(vals, [0.5])[0.5]
        assert abs(got[k]["p50"] - true) <= ALPHA * abs(true) + 1e-12


def test_streaming_partials_match_batch(spark, tmp_path):
    """Micro-batched ingest through the foreachBatch sink must yield the
    same rolled-up estimates as one batch pass (counts add across batch
    boundaries), and replaying a batch must not move anything."""
    from realtime_fraud_detection_spark.streaming.sinks import (
        quantile_partial_writer,
        quantile_rollup_view,
    )

    ev = _events(spark)
    src = str(tmp_path / "events_src")
    ev.repartition(4).write.parquet(src)
    out = str(tmp_path / "out")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(quantile_partial_writer(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r["hour"]: tuple(r)
        for r in quantile_rollup_view(spark, out, "hour", QS).collect()
    }
    batch_partials = quantile_sketch_partials(ev, "ts", "value", alpha=ALPHA)
    batch = {
        r["hour"]: tuple(r)
        for r in sketch_quantiles(batch_partials, QS, ["hour"]).collect()
    }
    assert streamed == batch

    writer = quantile_partial_writer(out)
    replay = spark.read.parquet(src).limit(250)
    writer(replay, 0)
    first = sorted(
        map(tuple, quantile_rollup_view(spark, out, "hour", QS).collect())
    )
    writer(replay, 0)
    second = sorted(
        map(tuple, quantile_rollup_view(spark, out, "hour", QS).collect())
    )
    assert first == second
