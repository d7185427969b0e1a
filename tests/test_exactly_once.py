"""Exactly-once delivery across restarts — SURVEY §2.9: the reference
configures Flink exactly-once with 10 s checkpoints (FraudDetectionJob.java:
112-136); our equivalent is the streaming checkpoint + idempotent-by-batch
foreachBatch multi-write. Restarting the query on the same checkpoint must
not re-deliver processed batches."""

from __future__ import annotations

import os
import time

import pandas as pd

from realtime_fraud_detection_spark import pipeline as P
from realtime_fraud_detection_spark.streaming.pipeline import run_scoring_pipeline


def test_restart_from_checkpoint_no_duplicates(spark, fraud_data, tmp_path):
    users, merchants, tx = fraud_data
    half = tx.count() // 2
    first = tx.orderBy("ts", "transaction_id").limit(half)
    second = tx.orderBy("ts", "transaction_id").subtract(first)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: only the first file exists
    first.coalesce(1).write.mode("append").parquet(src)
    q1 = run_scoring_pipeline(
        spark.readStream.schema(tx.schema).parquet(src), users, merchants, out, ckpt
    )
    q1.awaitTermination(120)
    q1.stop()  # stateful availableNow queries may not self-terminate (pending timers)
    n1 = spark.read.parquet(os.path.join(out, "transaction_enriched")).count()
    assert n1 == first.count()

    # run 2: same checkpoint, new file arrives — only the delta is processed
    time.sleep(1.1)  # distinct mtime
    second.coalesce(1).write.mode("append").parquet(src)
    q2 = run_scoring_pipeline(
        spark.readStream.schema(tx.schema).parquet(src), users, merchants, out, ckpt
    )
    q2.awaitTermination(120)
    q2.stop()  # stateful availableNow queries may not self-terminate (pending timers)
    enriched = spark.read.parquet(os.path.join(out, "transaction_enriched"))
    assert enriched.count() == tx.count()  # no batch-0 re-delivery
    dupes = (
        enriched.groupBy("transaction_id").count().filter("count > 1").count()
    )
    assert dupes == 0

    # run 3: restart with NOTHING new — zero additional rows in any sink
    q3 = run_scoring_pipeline(
        spark.readStream.schema(tx.schema).parquet(src), users, merchants, out, ckpt
    )
    q3.awaitTermination(120)
    q3.stop()  # stateful availableNow queries may not self-terminate (pending timers)
    assert (
        spark.read.parquet(os.path.join(out, "transaction_enriched")).count()
        == tx.count()
    )
