"""J2 merchant-update join (operators/joins.merchant_update_join →
suite query `merchant_updates`): the reference's risk-delta arithmetic
(riskLevelIncreased +0.4, newlyBlacklisted +0.8, fraudRateIncreased
+0.2, capped at 1.0 — StreamJoiner.java:55-75,208-236) on a hand-built
case, and bit-exact DuckDB parity of the full suite query (rows-only in
the driver window, so exactness is pinned here — the duplicate_spans
class)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.joins import merchant_update_join
from realtime_fraud_detection_spark.suite.joins_q import (
    SQL_MERCHANT_UPDATES,
    q_merchant_updates,
)
from tests.conftest import SF_SMOKE


def test_risk_deltas_hand_computed(spark):
    tx = spark.createDataFrame(
        [(1, 7, "2024-03-01 10:00:00")],
        "tx_id long, merchant_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    updates = spark.createDataFrame(
        [
            # (id, merchant, ts, risk_up, blacklisted, fraud_up)
            (10, 7, "2024-03-01 10:05:00", True, False, False),   # +0.4
            (11, 7, "2024-03-01 09:55:00", True, True, True),     # capped 1.0
            (12, 7, "2024-03-01 11:00:00", True, True, True),     # outside window
            (13, 8, "2024-03-01 10:00:00", True, True, True),     # other merchant
            (14, 7, "2024-03-01 10:09:00", False, False, True),   # +0.2
        ],
        "update_id long, merchant_id long, ts string, "
        "risk_level_increased boolean, newly_blacklisted boolean, "
        "fraud_rate_increased boolean",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["update_id"]: r["merchant_risk_delta"]
        for r in merchant_update_join(tx, updates, window="10 minutes").collect()
    }
    assert got == {10: pytest.approx(0.4), 11: 1.0, 14: pytest.approx(0.2)}


def test_suite_query_matches_duckdb_bit_exact(spark):
    sdf = q_merchant_updates(spark, SF_SMOKE).toPandas()
    assert len(sdf) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    )
    odf = con.execute(SQL_MERCHANT_UPDATES).fetchdf()
    from tools.check_oracle import compare

    problems = compare("merchant_updates", sdf, odf)
    assert not problems, problems
