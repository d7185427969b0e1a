"""Sketch-rollup queries (rows-only tail: DataSketches HLL estimates
have no DuckDB twin — DuckDB's approx_count_distinct is a different HLL
implementation; accuracy and the mergeability law are pinned by
tests/test_sketches.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table


# Per-hour HLL partials rolled to daily distinct-user estimates — the
# stored-partials pattern (rollup scans sketch blobs, never events).
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import (
        hourly_distinct_sketches,
        rollup_distinct_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_distinct_sketches(ev, "ts", "user_id")
    return (
        rollup_distinct_estimate(hourly, "day")
        .select("day", "users_est")
        .orderBy("day")
    )


# Per-hour DDSketch bucket counts rolled to daily p50/p95/p99 value
# estimates — the quantile dual of q_sketch_rollup (stored partials,
# rollups sum counts instead of rescanning events). Rows-only: the
# bucket boundary ceil(ln(x)/ln γ) is transcendental (the bm25 class);
# the α-relative-error guarantee and the bit-exact mergeability law are
# pinned by tests/test_quantile_sketch.py.
def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantile_sketch import (
        merge_quantile_sketch,
        quantile_sketch_partials,
        sketch_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = quantile_sketch_partials(ev, "ts", "value", alpha=0.01)
    daily = merge_quantile_sketch(hourly, "day")
    return (
        sketch_quantiles(daily, [0.5, 0.95, 0.99], ["day"], alpha=0.01)
        .orderBy("day")
    )


# Per-hour Misra–Gries summaries rolled to daily heavy-hitter lists —
# the third stored-partials sketch (truncated top-k lists don't merge;
# MG summaries do, with a proof: every item above n/(capacity+1) share
# survives any rollup). Integer-only, so unlike the HLL/DDSketch rows
# it has a BIT-EXACT DuckDB twin — pinned in tests/test_heavy_hitters.py
# (rows-only here only because the driver's 50-entry oracle window is
# full).
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy_hitters import (
        frequent_items_partials,
        merge_frequent_items,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = frequent_items_partials(ev, "ts", "user_id", capacity=16)
    daily = merge_frequent_items(hourly, "day", capacity=16)
    return daily.orderBy("day", F.col("cnt").desc(), "item")


# Per-hour Count-Min grids rolled to daily point-frequency UPPER bounds
# for a deterministic probe set — the fourth stored-partials sketch and
# the dual of q_heavy_hitters (MG stores lower bounds for the items it
# kept; CM upper-bounds ANY item, so together they bracket every count).
# Integer+md5 only → bit-exact DuckDB twin pinned in
# tests/test_count_min.py (rows-only here only because the driver's
# 50-entry oracle window is full).
def q_cm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.count_min import cm_estimate, cm_partials, merge_cm

    ev = load_table(spark, sf_dir, "events")
    hourly = cm_partials(ev, "user_id", ts_col="ts", grain="hour")
    # the stored-table stand-in: production probes a PERSISTED partials
    # table; composing build+probe in one plan would otherwise recompute
    # the build for cm_estimate's window-list derivation (plan-pinned:
    # events scans == 2 in tests/test_suite_plans.py)
    daily = (
        merge_cm(hourly, "day")
        .withColumnRenamed("day", "hour")
        .localCheckpoint(eager=False)
    )
    probe = ev.select("user_id").distinct().filter(F.col("user_id") % 20 == 0)
    return (
        cm_estimate(daily, probe, "user_id", ["hour"])
        .withColumnRenamed("hour", "day")
        .orderBy("day", "user_id")
    )


QUERIES = {
    "sketch_rollup": q_sketch_rollup,
    "quantile_rollup": q_quantile_rollup,
    "heavy_hitters": q_heavy_hitters,
    "cm_rollup": q_cm_rollup,
}

ORACLES: dict[str, str] = {}
