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
