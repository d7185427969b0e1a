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


QUERIES = {
    "sketch_rollup": q_sketch_rollup,
}

ORACLES: dict[str, str] = {}
