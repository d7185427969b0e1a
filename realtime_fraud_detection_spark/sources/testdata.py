"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Plain `spark.read.parquet` — the point is that filters and projections applied
by downstream queries reach the scan (PushedFilters / ReadSchema in
`.explain`), which parquet gives us for free.

One wrinkle: `events.parquet`'s `ts` encoding has varied across driver
regenerations — INT64 TIMESTAMP(NANOS) (round 1) vs TIMESTAMP(MICROS)
isAdjustedToUTC=false (round 2). Spark rejects the nanos form outright
(PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong` is set,
and reads the micros form as TIMESTAMP_NTZ. Every declared timestamp column
(`_TS_COLUMNS` — events.ts, orders.o_orderdate, lineitem.l_shipdate, which
share the exact same drift exposure) is detected and normalized to plain
TimestampType whatever it arrives as:

- bigint (nanos-as-long, or a plain INT64 epoch in any unit): rebuild with
  integer division (`div`, not double — ns-epoch values ~1.7e18 exceed
  double's 53-bit exact-integer range), unit detected by magnitude.
- timestamp_ntz: cast to timestamp (wall-clock reinterpretation in the
  session timezone; the harness runs UTC so this is value-identical).
- date: cast to timestamp (midnight) — a plausible regeneration for the
  date-valued orderdate/shipdate columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Timestamp-valued fixture columns, every one exposed to the same
# encoding-drift class that cost round 2 (events.ts was regenerated with a
# different parquet logical type and errored 30/50 gate queries).
_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


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
    ts_cols = _TS_COLUMNS.get(name)
    if ts_cols:
        df = _load_with_ts(spark, path, ts_cols)
    else:
        df = spark.read.parquet(path)
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


def _load_with_ts(spark: SparkSession, path: str, ts_cols: tuple[str, ...]) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for col in ts_cols:
        ts_type = dtypes.get(col)
        if ts_type == "bigint":
            # Epoch-integer column (nanos-as-long under the legacy conf, or a
            # plain INT64 epoch in any unit a future regeneration might pick).
            # Detect the unit per value by magnitude — 2024-epoch is ~1.7e18 ns
            # / ~1.7e15 us / ~1.7e12 ms / ~1.7e9 s, four orders of magnitude
            # apart, so the thresholds are unambiguous for any date within
            # centuries of now. Integer division (`div`, not double — ns values
            # exceed double's 53-bit exact range); one codegen'd CASE, no
            # driver-side action.
            c = F.col(col)
            micros = (
                F.when(c > F.lit(10**17), F.expr(f"{col} div 1000"))
                .when(c > F.lit(10**14), c)
                .when(c > F.lit(10**11), c * 1000)
                .otherwise(c * 1_000_000)
            )
            df = df.withColumn(col, F.timestamp_micros(micros))
        elif ts_type in ("timestamp_ntz", "date"):
            # ntz: wall-clock reinterpretation in the session timezone (the
            # harness runs UTC so this is value-identical); date: midnight.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
