"""Mergeable distinct-count sketches — the pre-aggregated rollup pattern
that exact distinct counting cannot give you at 100 TB.

`hourly_user_sets` (A10) keeps EXACT per-hour user sets; correct, but a
coarser grain (day, week, month) must rescan the events because distinct
counts don't add. Apache DataSketches HLL (exposed as Spark 4's
`hll_sketch_agg` / `hll_union_agg`) closes that: store one fixed-size
sketch per (key, hour) — a few KB regardless of cardinality — and any
coarser grain is a UNION of sketches, never a rescan. This is how
ClickHouse/Druid-style rollup tables answer "distinct users last month"
from hourly partials.

Error is ~1.04/√2^lg_k (~1.6% at the lg_k=12 default); the estimate is
deterministic for a given input multiset (the sketch is a pure fold —
no RNG at query time).

Shapes: one shuffle keyed by (key, hour) builds the partials (map-side
combined — sketches merge on the map side too); every rollup after that
shuffles only sketch blobs, bytes-per-group constant by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12


def hourly_distinct_sketches(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    key_cols: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """(key…, hour, sketch, users_est) — per-hour HLL partials, the
    stored rollup base. `sketch` is the binary DataSketches blob
    (persistable to parquet; unions with any later partial)."""
    keys = key_cols or []
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    out = (
        df.select(*keys, hour, F.col(entity_col).alias("_e"))
        .groupBy(*keys, "hour")
        .agg(F.hll_sketch_agg("_e", F.lit(lg_k)).alias("sketch"))
    )
    return out.withColumn(
        "users_est", F.hll_sketch_estimate("sketch").cast("bigint")
    )


def rollup_distinct_estimate(
    sketches: DataFrame,
    grain: str,
    hour_col: str = "hour",
    key_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Coarser-grain distinct estimates from stored partials: union the
    hour sketches up to `grain` ('day', 'week', 'month', …) — the scan
    cost is the PARTIALS table (sketch blobs), never the events."""
    keys = key_cols or []
    bucket = F.date_trunc(grain, F.col(hour_col)).alias(grain)
    return (
        sketches.groupBy(*keys, bucket)
        .agg(F.hll_union_agg(sketch_col).alias("sketch"))
        .withColumn("users_est", F.hll_sketch_estimate("sketch").cast("bigint"))
    )


def distinct_estimate(df: DataFrame, entity_col: str, lg_k: int = DEFAULT_LG_K) -> Column:
    """One-shot corpus-wide estimate (for comparisons/tests)."""
    return F.hll_sketch_estimate(
        F.hll_sketch_agg(entity_col, F.lit(lg_k))
    ).cast("bigint")
