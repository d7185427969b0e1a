"""SparkSession factory.

Defaults are chosen for the local[32] test harness but the knobs are the ones
that matter on a 1000-executor cluster against ~100 TB: AQE (runtime
re-planning, skew-join splitting, partition coalescing), Arrow for any
Python-side exchange, and an explicit shuffle-partition count sized to the
data rather than Spark's static default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB with ~128 MB shuffle targets you'd want O(100k) shuffle partitions;
# AQE coalesces down from an over-provisioned number, so we over-provision
# relative to cores locally and let AQE shrink per-query.
_LOCAL_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def get_spark(
    app_name: str = "realtime-fraud-detection-spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        # --- optimizer / runtime re-planning ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _LOCAL_SHUFFLE_PARTITIONS),
        )
        # split input so every core has work even at small SF; at cluster scale
        # the default 128m is right, locally 32m keeps 32 cores busy on sf0.1
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        # --- Python exchange is always Arrow-batched ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # broadcast threshold: dimension tables (nation/region/customer at test
        # SF; user/merchant profiles in the fraud pipeline) must broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
