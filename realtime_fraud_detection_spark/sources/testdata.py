"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Plain `spark.read.parquet` — the point is that filters and projections applied
by downstream queries reach the scan (PushedFilters / ReadSchema in
`.explain`), which parquet gives us for free.

One wrinkle: `events.parquet`'s `ts` encoding has varied across driver
regenerations — INT64 TIMESTAMP(NANOS) (round 1) vs TIMESTAMP(MICROS)
isAdjustedToUTC=false (round 2). Spark rejects the nanos form outright
(PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong` is set,
and reads the micros form as TIMESTAMP_NTZ. `_load_events` detects which one
it got and normalizes to plain TimestampType either way:

- bigint (nanos-as-long): rebuild with integer division (`div`, not double —
  ns-epoch values ~1.7e18 exceed double's 53-bit exact-integer range).
- timestamp_ntz: cast to timestamp (wall-clock reinterpretation in the
  session timezone; the harness runs UTC so this is value-identical).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False
) -> DataFrame:
    """`fan_out=True` round-robins a scan with fewer input partitions than
    the session's parallelism across all cores. The small fixtures are one
    parquet file → one partition, so a CPU-bound expression stage downstream
    (md5-per-shingle dedup, simhash votes) otherwise runs on ONE core —
    observed 30×+ wall-clock on the winnowing ops. At real scale the scan
    already has thousands of partitions and this is a no-op."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _load_events(spark, path) if name == "events" else spark.read.parquet(path)
    if fan_out:
        par = spark.sparkContext.defaultParallelism
        # file count is a lower bound on scan partitions (each file is at
        # least one split; big files split further by maxPartitionBytes),
        # so >= par files means the scan is already wide — and probing it
        # via inputFiles() costs a file listing, not the RDD conversion
        # df.rdd.getNumPartitions() would force on the whole plan.
        if len(df.inputFiles()) < par:
            df = df.repartition(par)
    return df


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # Epoch-integer column (nanos-as-long under the legacy conf, or a
        # plain INT64 epoch in any unit a future regeneration might pick).
        # Detect the unit per value by magnitude — 2024-epoch is ~1.7e18 ns
        # / ~1.7e15 us / ~1.7e12 ms / ~1.7e9 s, four orders of magnitude
        # apart, so the thresholds are unambiguous for any date within
        # centuries of now. Integer division (`div`, not double — ns values
        # exceed double's 53-bit exact range); one codegen'd CASE, no
        # driver-side action.
        c = F.col("ts")
        micros = (
            F.when(c > F.lit(10**17), F.expr("ts div 1000"))
            .when(c > F.lit(10**14), c)
            .when(c > F.lit(10**11), c * 1000)
            .otherwise(c * 1_000_000)
        )
        return df.withColumn("ts", F.timestamp_micros(micros))
    if ts_type == "timestamp_ntz":
        # Wall-clock reinterpretation in the session timezone; the harness
        # runs UTC so this is value-identical.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
