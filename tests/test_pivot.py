"""Pivot / unpivot (§2.6-adjacent reshaping): Spark's pivot with an explicit
value list matches the CASE-sum oracle bit-exactly, and unpivot round-trips.
Explicit values keep the plan single-pass (no distinct-collect planning
step) — the 100 TB form."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.sources.testdata import load_table

from conftest import SF_SMOKE

TYPES = ["click", "error", "purchase", "signup", "view"]


def test_pivot_matches_duckdb(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = (
        ev.groupBy((F.col("user_id") % 10).cast("long").alias("user_bucket"))
        .pivot("event_type", TYPES)
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
        .orderBy("user_bucket")
        .toPandas()
    )
    con = duckdb.connect()
    cases = ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS {t}"
        for t in TYPES
    )
    want = con.execute(
        f"""
        SELECT user_id % 10 AS user_bucket, {cases}
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    assert list(got.columns) == list(want.columns)
    assert (got["user_bucket"].values == want["user_bucket"].values).all()
    for t in TYPES:
        assert (got[t].values == want[t].values).all(), t


def test_unpivot_roundtrip(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    wide = (
        ev.groupBy((F.col("user_id") % 10).cast("long").alias("user_bucket"))
        .pivot("event_type", TYPES)
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    )
    tall = wide.unpivot(
        "user_bucket", TYPES, "event_type", "total_value"
    ).filter(F.col("total_value").isNotNull())
    direct = (
        ev.groupBy(
            (F.col("user_id") % 10).cast("long").alias("user_bucket"), "event_type"
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
    )
    assert tall.exceptAll(direct).count() == 0
    assert direct.exceptAll(tall).count() == 0


def test_exact_percentiles_match_duckdb(spark):
    """Spark percentile() (exact, interpolating) == DuckDB quantile_cont
    bit-for-bit per event_type, with approx_percentile sanity-bounded by
    the exact values (the scale path: t-digest-style sketch, no sort)."""
    ev = load_table(spark, SF_SMOKE, "events")
    got = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
            F.expr("approx_percentile(value, 0.5, 10000)").alias("ap50"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .orderBy("event_type")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    for col in ["p50", "p90", "p99"]:
        assert (got[col].values == want[col].values).all(), col
    # approx within the group's range and near the exact median
    assert ((got["ap50"] >= got["mn"]) & (got["ap50"] <= got["mx"])).all()
    assert (abs(got["ap50"] - got["p50"]) / got["p50"] < 0.05).all()
