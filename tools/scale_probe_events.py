#!/usr/bin/env python3
"""Scale probe for the time-domain operators: asof_join and gap_fill at 10x
the sf0.1 events row count.

10x corpus = 10 replicas of the events fixture with disjoint user_id
spaces (user_id + r * 10_000_000) — per-key series structure is identical,
the key count grows 10x. Both operators are one key-partitioned
shuffle+sort, so runtime should grow ~linearly with rows and the output
exactly 10x. Superlinear time or output growth would indicate a pair/spine
blow-up. Results recorded in SCALE.md.

Usage: python3 tools/scale_probe_events.py [replicas]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scale_events"


def build_corpus(spark, replicas: int) -> None:
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events", fan_out=True)
    parts = [
        ev.select(
            (F.col("event_id") + r * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for r in range(replicas)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionAll(p)
    corpus.repartition(64).write.mode("overwrite").parquet(OUT)


def _read(spark, src):
    # the 1x fixture is one file -> one partition; fan out so both scales
    # use the full core count and the comparison isolates data volume
    df = spark.read.parquet(src)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def run_asof(spark, src) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.joins import asof_join

    ev = _read(spark, src)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("amount")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(purchases, views, "user_id")
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()  # full materialization
    t = time.time() - t0
    return t, out.count()


def run_gap_fill(spark, src) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators import timeseries as T

    ev = _read(spark, src).filter(F.col("event_type") == "purchase")
    hourly = T.resample(ev, "user_id", "ts", "value", step="1 hour", agg="avg")
    out = T.gap_fill(hourly, "user_id", "bucket", "value", step="1 hour")
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()  # full materialization
    t = time.time() - t0
    return t, out.count()


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from realtime_fraud_detection_spark.session import get_spark

    spark = get_spark("scale-probe-events")
    spark.sparkContext.setLogLevel("ERROR")

    base = os.path.join(SF_DIR, "events.parquet")
    for _, fn in [("asof_join", run_asof), ("gap_fill", run_gap_fill)]:
        fn(spark, base)  # warmup: JIT + codegen, discard timings
    for name, fn in [("asof_join", run_asof), ("gap_fill", run_gap_fill)]:
        t1, n1 = fn(spark, base)
        print(f"{name} 1x: {t1:.1f}s rows={n1}")

    build_corpus(spark, replicas)
    for name, fn in [("asof_join", run_asof), ("gap_fill", run_gap_fill)]:
        tn, nn = fn(spark, OUT)
        print(f"{name} {replicas}x: {tn:.1f}s rows={nn}")

    spark.stop()


if __name__ == "__main__":
    main()
