"""Bucketed co-located joins — the 100 TB repeated-join strategy (SCALE.md):
write both sides bucketed on the join key, and the join plans with NO
Exchange (shuffle) at all."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.plans.explain import formatted_plan


def _reset_managed_table(spark, name: str) -> None:
    """Drop the catalog entry AND any orphaned warehouse directory: a
    killed session leaves spark-warehouse/<name> on disk with no catalog
    row, and the next saveAsTable dies with LOCATION_ALREADY_EXISTS."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse.rstrip('/')}/{name}", ignore_errors=True)


@pytest.fixture(scope="module")
def bucketed_tables(spark, fraud_data, tmp_path_factory):
    _, _, tx = fraud_data
    left = tx.select("transaction_id", "user_id", "amount")
    right = tx.groupBy("user_id").agg(F.count("*").alias("user_tx_count"))
    _reset_managed_table(spark, "tx_bucketed")
    _reset_managed_table(spark, "user_stats_bucketed")
    left.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable(
        "tx_bucketed"
    )
    right.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable(
        "user_stats_bucketed"
    )
    yield "tx_bucketed", "user_stats_bucketed"
    spark.sql("DROP TABLE IF EXISTS tx_bucketed")
    spark.sql("DROP TABLE IF EXISTS user_stats_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = spark.table(lt).join(spark.table(rt), "user_id")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_unbucketed_join_does_shuffle(spark, fraud_data):
    """Control: the same join without bucketing shuffles both sides."""
    _, _, tx = fraud_data
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = tx.select("transaction_id", "user_id", "amount")
        right = tx.groupBy("user_id").agg(F.count("*").alias("user_tx_count"))
        plan = formatted_plan(left.join(right, "user_id"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_partitioned_write_prunes(spark, fraud_data, tmp_path):
    """Date-partitioned layout + partition pruning: a one-day filter reads
    only that day's files (PartitionFilters in the scan)."""
    _, _, tx = fraud_data
    path = str(tmp_path / "tx_by_day")
    tx.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(path)
    one_day = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = formatted_plan(one_day)
    assert "PartitionFilters: [isnotnull(day" in plan  # pruned at the scan
    assert one_day.count() > 0


def test_behavior_risk_factors(spark):
    from realtime_fraud_detection_spark.operators.joins import (
        behavior_risk_factors,
        windowed_stream_join,
    )

    base = pd.Timestamp("2024-01-01 10:00:00")
    tx = spark.createDataFrame(
        pd.DataFrame({"user_id": ["u1"], "ts": [base], "amount": [5.0]})
    )
    beh = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": ["u1"],
                "ts": [base + pd.Timedelta("1min")],
                "is_anomalous_login": [True],
                "is_short_session": [True],
                "is_anomalous_navigation": [False],
            }
        )
    )
    out = windowed_stream_join(tx, beh, "user_id").withColumn(
        "behavior_risk", behavior_risk_factors()
    )
    assert abs(out.first()["behavior_risk"] - 0.5) < 1e-9


def test_ab_metrics_significance(spark):
    """M10 — biased outcome by variant should be detected as significant."""
    import numpy as np

    from realtime_fraud_detection_spark.ml.ensemble import ab_metrics, ab_variant

    rng = np.random.default_rng(7)
    n = 20000
    pdf = pd.DataFrame({"user_id": [f"u{i}" for i in range(n)]})
    df = spark.createDataFrame(pdf).withColumn("variant", ab_variant(F.col("user_id")))
    # outcome depends on variant: control 5%, treatment 10%
    df = df.withColumn(
        "is_fraud_predicted",
        F.when(
            F.col("variant") == "treatment",
            F.rand(seed=1) < 0.10,
        ).otherwise(F.rand(seed=2) < 0.05),
    )
    out = ab_metrics(df).toPandas().iloc[0]
    assert out["treatment_rate"] > out["control_rate"]
    assert out["p_value"] < 0.01
    assert bool(out["significant"])

    # and a null experiment is not significant
    df0 = spark.createDataFrame(pdf).withColumn(
        "is_fraud_predicted", F.rand(seed=3) < 0.05
    )
    out0 = ab_metrics(df0).toPandas().iloc[0]
    assert out0["p_value"] > 0.01
