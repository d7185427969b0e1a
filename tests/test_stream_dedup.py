"""Streaming dedup + rollup compaction view."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.streaming.pipeline import to_memory_sink
from realtime_fraud_detection_spark.streaming.stateful import dedup_stream


def test_stream_dedup_across_batches(spark, tmp_path):
    """The same transaction_id redelivered in a later micro-batch (within
    the watermark horizon) must be emitted exactly once."""
    base = pd.Timestamp("2024-01-01 10:00:00")
    b1 = pd.DataFrame(
        {
            "transaction_id": ["t1", "t2", "t3"],
            "ts": [base, base + pd.Timedelta("1s"), base + pd.Timedelta("2s")],
            "amount": [1.0, 2.0, 3.0],
        }
    )
    b2 = pd.DataFrame(  # t2 redelivered + one new
        {
            "transaction_id": ["t2", "t4"],
            "ts": [base + pd.Timedelta("1s"), base + pd.Timedelta("3s")],
            "amount": [2.0, 4.0],
        }
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("transaction_id string, ts timestamp, amount double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = to_memory_sink(dedup_stream(stream), "dedup_test", str(tmp_path / "ck"), "append")
    q.awaitTermination(120)
    q.stop()  # stateful availableNow queries may not self-terminate (pending timers)
    got = spark.sql("select * from dedup_test").toPandas()
    assert sorted(got["transaction_id"]) == ["t1", "t2", "t3", "t4"]


def test_hourly_rollup_view(spark, fraud_data, tmp_path):
    """Partial per-batch aggregates re-compact to the exact global rollup."""
    from realtime_fraud_detection_spark.streaming.pipeline import run_scoring_pipeline
    from realtime_fraud_detection_spark.streaming.sinks import hourly_rollup_view

    users, merchants, tx = fraud_data
    src = str(tmp_path / "src")
    half = tx.count() // 2
    t1 = tx.orderBy("ts", "transaction_id").limit(half)
    t1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    tx.orderBy("ts", "transaction_id").subtract(t1).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    q = run_scoring_pipeline(
        spark.readStream.schema(tx.schema).option("maxFilesPerTrigger", 1).parquet(src),
        users,
        merchants,
        out,
        str(tmp_path / "ck2"),
    )
    q.awaitTermination(180)
    q.stop()  # stateful availableNow queries may not self-terminate (pending timers)
    view = hourly_rollup_view(spark, out).toPandas().set_index("hour").sort_index()
    want = (
        tx.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("tx_count"),
            F.sum(F.col("amount").cast("decimal(18,2)")).cast("double").alias("total_amount"),
        )
        .toPandas()
        .set_index("hour")
        .sort_index()
    )
    assert (view["tx_count"] == want["tx_count"]).all()
    assert (view["total_amount"] - want["total_amount"]).abs().max() < 1e-9

    # compaction preserves the view exactly and shrinks the log
    from realtime_fraud_detection_spark.streaming.sinks import compact_hourly_rollups

    before = spark.read.parquet(os.path.join(out, "hourly_aggregates")).count()
    n = compact_hourly_rollups(spark, out)
    assert n <= before
    after_view = hourly_rollup_view(spark, out).toPandas().set_index("hour").sort_index()
    assert (after_view["tx_count"] == want["tx_count"]).all()
    assert (after_view["total_amount"] - want["total_amount"]).abs().max() < 1e-9
