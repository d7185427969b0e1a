"""Feature store + metrics listener + J2/M6 operator tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.feature_store import FeatureStore


def test_feature_store_roundtrip_and_online_view(spark, fraud_data, tmp_path):
    users, merchants, tx = fraud_data
    fs = FeatureStore(str(tmp_path / "fs"))
    feat = tx.select("user_id", "ts", "amount").withColumn(
        "amount_log", F.log1p("amount")
    )
    fs.write_features(feat, "tx_features", "user_id", ["amount", "amount_log"])

    offline = fs.read_offline(spark, "tx_features", ["amount"])
    assert offline.select("feature").distinct().count() == 1

    online = fs.online_view(spark, "tx_features")
    # exactly one latest row per (entity, feature)
    dups = online.groupBy("entity_id", "feature").count().filter(F.col("count") > 1)
    assert dups.count() == 0

    served = fs.serve(
        tx.select("transaction_id", "user_id"), online, ["amount", "amount_log"], "user_id"
    )
    assert served.filter(F.col("amount").isNotNull()).count() > 0

    stats = fs.statistics(spark, "tx_features").toPandas().set_index("feature")
    assert stats.loc["amount", "n"] == tx.count()
    assert stats.loc["amount", "min"] >= 1.0  # generator clamps amounts >= 1


def test_merchant_update_join_risk_deltas(spark):
    base = pd.Timestamp("2024-01-01 10:00:00")
    tx = spark.createDataFrame(
        pd.DataFrame({"merchant_id": ["m1", "m2"], "ts": [base, base], "amount": [10.0, 20.0]})
    )
    updates = spark.createDataFrame(
        pd.DataFrame(
            {
                "merchant_id": ["m1", "m2"],
                "ts": [base + pd.Timedelta("5min"), base + pd.Timedelta("5min")],
                "risk_level_increased": [True, False],
                "fraud_rate_increased": [False, False],
                "newly_blacklisted": [True, False],
            }
        )
    )
    from realtime_fraud_detection_spark.operators.joins import merchant_update_join

    out = merchant_update_join(tx, updates).toPandas().set_index("amount")
    assert out.loc[10.0, "merchant_risk_delta"] == 1.0  # 0.4 + 0.8 clamped
    assert out.loc[20.0, "merchant_risk_delta"] == 0.0


def test_sequence_features(spark, fraud_data):
    _, _, tx = fraud_data
    from realtime_fraud_detection_spark.ml.models import sequence_features

    out = sequence_features(tx, n=5)
    pdf = out.filter(F.col("user_id") == tx.first()["user_id"]).orderBy("ts").toPandas()
    lens = pdf["amount_sequence"].map(len)
    assert lens.iloc[0] == 1 and lens.max() <= 5
    assert (lens.diff().dropna() >= 0).head(4).all()  # grows until cap


def test_metrics_listener(spark, tmp_path):
    import time

    from realtime_fraud_detection_spark.streaming.metrics import PipelineMetricsListener

    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    try:
        pdf = pd.DataFrame(
            {"user_id": ["u1"] * 4, "ts": pd.date_range("2024-01-01", periods=4, freq="min"), "amount": [1.0] * 4}
        )
        src = str(tmp_path / "msrc")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = spark.readStream.schema("user_id string, ts timestamp, amount double").parquet(src)
        q = (
            stream.groupBy("user_id")
            .count()
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "mck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # filter to THIS query's events: the shared session may have other
        # (even leaked) streaming queries whose progress the listener also
        # records, and delivery is async — poll with a generous deadline
        mine = []
        for _ in range(120):
            mine = [s for s in listener.snapshot() if s["query"] == "metrics_probe"]
            if mine:
                break
            time.sleep(0.5)
        assert mine and mine[0]["input_rows"] == 4
    finally:
        spark.streams.removeListener(listener)


def test_training_set_is_point_in_time_correct(spark, tmp_path):
    """Each label row must see the latest feature value AT OR BEFORE its
    own timestamp — never a future write (the leakage a latest-value
    join commits), with equal-ts inclusion and write_ts tie-break."""
    from datetime import datetime as dt

    fs = FeatureStore(str(tmp_path / "fs"))
    feats = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 10), 10.0, 1.0),
            (1, dt(2024, 1, 1, 12), 20.0, 2.0),
            (2, dt(2024, 1, 1, 11), 99.0, 9.0),
        ],
        "user long, ts timestamp, velocity double, risk double",
    )
    fs.write_features(feats, "g", "user", ["velocity", "risk"], ts_col="ts")

    labels = spark.createDataFrame(
        [
            (100, 1, dt(2024, 1, 1, 9), 0),   # before any feature -> nulls
            (101, 1, dt(2024, 1, 1, 10), 0),  # equal ts -> included
            (102, 1, dt(2024, 1, 1, 11), 1),  # between writes -> first value
            (103, 1, dt(2024, 1, 1, 13), 1),  # after both -> latest
            (104, 2, dt(2024, 1, 1, 12), 0),
            (105, 3, dt(2024, 1, 1, 12), 0),  # unseen entity -> nulls
        ],
        "label_id long, user long, ts timestamp, y int",
    )
    out = {
        r["label_id"]: (r["velocity"], r["risk"], r["y"])
        for r in fs.training_set(
            spark, labels, "g", ["velocity", "risk"], "user", "ts"
        ).collect()
    }
    assert out[100] == (None, None, 0)
    assert out[101] == (10.0, 1.0, 0)
    assert out[102] == (10.0, 1.0, 1)   # the 12:00 write must NOT leak back
    assert out[103] == (20.0, 2.0, 1)
    assert out[104] == (99.0, 9.0, 0)
    assert out[105] == (None, None, 0)
    assert len(out) == 6  # every label row survives, label columns intact


def test_training_set_backfill_tiebreak(spark, tmp_path):
    """Two writes with the SAME event_ts (a backfill correcting a value):
    the later write_ts wins."""
    import time
    from datetime import datetime as dt

    fs = FeatureStore(str(tmp_path / "fs2"))
    first = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10), 10.0)], "user long, ts timestamp, v double"
    )
    fs.write_features(first, "g", "user", ["v"], ts_col="ts")
    time.sleep(0.05)  # distinct write_ts
    fix = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10), 11.5)], "user long, ts timestamp, v double"
    )
    fs.write_features(fix, "g", "user", ["v"], ts_col="ts")
    labels = spark.createDataFrame(
        [(1, 1, dt(2024, 1, 1, 12))], "label_id long, user long, ts timestamp"
    )
    row = fs.training_set(spark, labels, "g", ["v"], "user", "ts").first()
    assert row["v"] == 11.5


def test_training_set_explicit_null_shadows_older_value(spark, tmp_path):
    """A feature row whose value is LEGITIMATELY NULL (an explicit
    unset/correction) must shadow earlier values — later labels see null,
    not the stale pre-unset value (the struct presence marker in
    training_set's forward-fill)."""
    from datetime import datetime as dt

    fs = FeatureStore(str(tmp_path / "fs3"))
    feats = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10), 10.0), (1, dt(2024, 1, 1, 12), None)],
        "user long, ts timestamp, v double",
    )
    fs.write_features(feats, "g", "user", ["v"], ts_col="ts")
    labels = spark.createDataFrame(
        [
            (100, 1, dt(2024, 1, 1, 11)),  # before the unset -> 10.0
            (101, 1, dt(2024, 1, 1, 13)),  # after the unset -> null
        ],
        "label_id long, user long, ts timestamp",
    )
    out = {
        r["label_id"]: r["v"]
        for r in fs.training_set(spark, labels, "g", ["v"], "user", "ts").collect()
    }
    assert out == {100: 10.0, 101: None}
