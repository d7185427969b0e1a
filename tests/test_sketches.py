"""HLL distinct-count rollup sketches (operators/sketches.py): accuracy
vs exact distinct counts, the mergeability law (union of hourly partials
== direct coarse sketch — bit-identical estimates), and persistability
of the sketch blobs through parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.sketches import (
    hourly_distinct_sketches,
    rollup_distinct_estimate,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_hourly_estimates_close_to_exact(spark):
    ev = _events(spark)
    est = {
        r["hour"]: r["users_est"]
        for r in hourly_distinct_sketches(ev, "ts", "user_id").collect()
    }
    exact = {
        r["hour"]: r["n"]
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for h, n in exact.items():
        assert abs(est[h] - n) <= max(2, 0.05 * n), (h, est[h], n)


def test_rollup_merge_equals_direct_sketch(spark):
    """The mergeability law: estimating the DAY from unioned hour
    partials must equal sketching the day directly from raw events —
    same algorithm, same input multiset, identical estimate."""
    ev = _events(spark)
    hourly = hourly_distinct_sketches(ev, "ts", "user_id")
    via_rollup = {
        r["day"]: r["users_est"]
        for r in rollup_distinct_estimate(hourly, "day").collect()
    }
    direct = {
        r["day"]: r["users_est"]
        for r in hourly_distinct_sketches(
            ev.withColumn("ts", F.date_trunc("day", "ts")), "ts", "user_id"
        )
        .withColumnRenamed("hour", "day")
        .collect()
    }
    assert via_rollup == direct


def test_sketches_survive_parquet(spark, tmp_path):
    """The stored-partials workflow: persist hour sketches, read back,
    roll up — estimates unchanged (the blob is the state)."""
    ev = _events(spark)
    hourly = hourly_distinct_sketches(ev, "ts", "user_id")
    p = str(tmp_path / "sketches")
    hourly.write.parquet(p)
    reread = spark.read.parquet(p)
    a = {
        r["day"]: r["users_est"]
        for r in rollup_distinct_estimate(hourly, "day").collect()
    }
    b = {
        r["day"]: r["users_est"]
        for r in rollup_distinct_estimate(reread, "day").collect()
    }
    assert a == b


def test_keyed_sketches(spark):
    ev = _events(spark)
    keyed = hourly_distinct_sketches(ev, "ts", "user_id", key_cols=["event_type"])
    assert {"event_type", "hour", "sketch", "users_est"} <= set(keyed.columns)
    day = rollup_distinct_estimate(keyed, "day", key_cols=["event_type"])
    exact = {
        (r["event_type"], r["day"]): r["n"]
        for r in ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in day.collect():
        n = exact[(r["event_type"], r["day"])]
        assert abs(r["users_est"] - n) <= max(2, 0.05 * n)


def test_streaming_partials_match_batch_estimates(spark, tmp_path):
    """Stream the events through the sketch sink in several micro-batches:
    the rolled-up view must equal the batch hourly estimates exactly
    (mergeability across batch boundaries), and replaying a batch must
    not change anything (idempotent partition overwrite)."""
    from realtime_fraud_detection_spark.streaming.sinks import (
        sketch_partial_writer,
        sketch_rollup_view,
    )

    ev = _events(spark)
    src = str(tmp_path / "events_src")
    ev.repartition(4).write.parquet(src)  # 4 files → several micro-batches
    out = str(tmp_path / "out")

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sketch_partial_writer(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r["hour"]: r["users_est"]
        for r in sketch_rollup_view(spark, out, "hour").collect()
    }
    batch = {
        r["hour"]: r["users_est"]
        for r in hourly_distinct_sketches(ev, "ts", "user_id").collect()
    }
    assert streamed == batch

    # replay batch 0 (same data, same id): the second write overwrites
    # the partition with identical content — estimates must not move
    writer = sketch_partial_writer(out)
    replay = spark.read.parquet(src).limit(250)
    writer(replay, 0)
    after_first = {
        r["hour"]: r["users_est"]
        for r in sketch_rollup_view(spark, out, "hour").collect()
    }
    writer(replay, 0)
    after_second = {
        r["hour"]: r["users_est"]
        for r in sketch_rollup_view(spark, out, "hour").collect()
    }
    assert after_first == after_second
