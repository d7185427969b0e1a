#!/usr/bin/env python3
"""Live streaming demo — the reference's whole stack in one process.

rate source (synthetic transactions, S9) → profile enrichment (J5) →
feature columns (§2.7) → rule scoring (M1) → decision (F6) →
4-sink fan-out (alerts / enriched / features / hourly rollups) with
per-batch metrics from the listener (M11).

Usage: python examples/streaming_demo.py [seconds] [tps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources import generator as G
from realtime_fraud_detection_spark.sources.kafka import rate_transaction_stream
from realtime_fraud_detection_spark.streaming.metrics import PipelineMetricsListener
from realtime_fraud_detection_spark.streaming.pipeline import run_scoring_pipeline


def main() -> None:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    tps = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    # few shuffle partitions: micro-batches are small, and every sink write
    # otherwise produces 32 files per batch
    spark = get_spark("streaming-demo", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)

    users_pd, merchants_pd = G.generate_profiles(300, 100)
    users, merchants, _ = G.to_spark(
        spark, users_pd, merchants_pd, G.generate_transactions(users_pd, merchants_pd, n=1)
    )

    tx = rate_transaction_stream(spark, rows_per_second=tps)
    # rate stream lacks the full transaction shape; fill the gaps the
    # feature library reads
    from pyspark.sql import functions as F

    tx = (
        tx.withColumn("card_type", F.lit("visa"))
        .withColumn("card_last_four", F.lit("0000"))
        .withColumn("ip_address", F.lit("198.51.100.7"))
        # ~40 devices over ~300 users → users sharing a device form rings
        # (the post-stream entity-link investigation below finds them)
        .withColumn(
            "device_id",
            F.concat(F.lit("dev-"), (F.crc32(F.col("user_id")) % 40).cast("string")),
        )
        .withColumn("device_fingerprint", F.concat(F.lit("fp-"), F.col("user_id")))
        .withColumn("user_agent", F.lit("Mozilla/5.0 (X11; Linux x86_64)"))
        .withColumn(
            "geolocation", F.struct(F.lit(40.0).alias("lat"), F.lit(-74.0).alias("lon"))
        )
        .withColumn(
            "merchant_location",
            F.struct(F.lit(41.0).alias("lat"), F.lit(-75.0).alias("lon")),
        )
        .withColumn("is_weekend", F.dayofweek("ts").isin(1, 7))
        .withColumn("hour_of_day", F.hour("ts"))
        .withColumn("is_fraud", F.lit(False))
        .withColumn("fraud_type", F.lit(None).cast("string"))
        .withColumn("fraud_score", (F.col("amount") / 100.0).cast("double"))
        .withColumn("processing_time_ms", F.lit(1))
        .withColumn("currency", F.lit("USD"))
    )

    out = tempfile.mkdtemp(prefix="fraud_demo_")
    q = run_scoring_pipeline(
        tx,
        users,
        merchants,
        out,
        os.path.join(out, "_checkpoint"),
        trigger={"processingTime": "2 seconds"},
    )
    print(f"streaming at {tps} tps → {out}")
    # run until at least 2 data-carrying batches committed (or hard cap)
    deadline = time.time() + max(seconds, 60)
    while time.time() < deadline:
        data_batches = [b for b in listener.snapshot() if b["input_rows"] > 0]
        if len(data_batches) >= 2:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)

    total = sum(b["input_rows"] for b in listener.snapshot())
    for b in listener.snapshot()[-5:]:
        print(
            f"batch {b['batch_id']:>3}  rows={b['input_rows']:>6}  "
            f"{(b['rows_per_sec'] or 0):>10.0f} rows/s  {b['batch_duration_ms']} ms"
        )
    alerts = spark.read.parquet(os.path.join(out, "fraud_alerts")).count()
    enriched_df = spark.read.parquet(os.path.join(out, "transaction_enriched"))
    enriched = enriched_df.count()
    print(f"TOTAL processed={total}  enriched={enriched}  alerts={alerts}")

    # post-hoc investigation over the streamed output: shared-entity
    # fraud rings (users linked through devices) + sketch-based distinct
    # users per minute from the enriched log
    from realtime_fraud_detection_spark.operators.clustering import (
        entity_link_rings,
    )
    from realtime_fraud_detection_spark.operators.sketches import (
        hourly_distinct_sketches,
    )

    rings = entity_link_rings(enriched_df, "user_id", ["device_id"])
    top = (
        rings.groupBy("ring_id", "ring_actors")
        .count()
        .orderBy(F.desc("ring_actors"), "ring_id")
        .first()
    )
    n_rings = rings.select("ring_id").distinct().count()
    du = (
        hourly_distinct_sketches(enriched_df, "ts", "user_id")
        .agg(F.sum("users_est"))
        .first()[0]
    )
    print(
        f"rings={n_rings}  largest_ring={top['ring_actors']} users  "
        f"distinct-user est (hourly sketches)={du}"
    )

    # maintenance: retire the run's small-files debt offline (the write
    # path stays natural-width — SCALE.md "sink file sizing"); the
    # listener's last committed batch id is the replay guard
    import glob

    from realtime_fraud_detection_spark.streaming.sinks import (
        compact_sink_batches,
    )

    committed = max(b["batch_id"] for b in listener.snapshot())
    enriched_glob = os.path.join(out, "transaction_enriched", "batch_id=*", "part-*")
    pre_files = len(glob.glob(enriched_glob))
    n_rows = compact_sink_batches(
        spark, out, "transaction_enriched", max_batch_id=committed
    )
    print(
        f"compaction: {pre_files} enriched files -> "
        f"{len(glob.glob(enriched_glob))} ({n_rows} rows, one generation)"
    )

    # serve alerts to the RELATIONAL store (embedded Derby — a real JDBC
    # database in this container) through the replay-idempotent sink:
    # the deliberate double-write below converges instead of duplicating
    from realtime_fraud_detection_spark.sources.jdbc import read_jdbc
    from realtime_fraud_detection_spark.streaming.sinks import (
        jdbc_exactly_once_writer,
    )

    url = f"jdbc:derby:{out}/derby;create=true"
    jdbc_writer = jdbc_exactly_once_writer(url, "fraud_alerts")
    alerts_df = spark.read.parquet(os.path.join(out, "fraud_alerts"))
    jdbc_writer(alerts_df, 0)
    jdbc_writer(alerts_df, 0)  # redelivery: DELETE-then-append converges
    served = read_jdbc(spark, url, "fraud_alerts").count()
    print(
        f"relational store: {served} alert rows after a replayed write "
        f"(= {alerts} streamed alerts, no duplicates)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
