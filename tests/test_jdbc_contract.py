"""S10 — the relational-store connectors, exercised END-TO-END against an
embedded Apache Derby database (on Spark's classpath), with table shapes
mirroring the reference's Postgres store (docker/postgres/init.sql:100-170:
users / merchants / transactions). Plus the Kafka S1/S4-S6 contract, pinned
without a broker (no broker in this sandbox): exact consumer/producer
options and the (topic, key, value-JSON) wire frames.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from realtime_fraud_detection_spark import pipeline as P
from realtime_fraud_detection_spark.sources import kafka as K
from realtime_fraud_detection_spark.sources.jdbc import read_jdbc, write_jdbc


# ---------------------------------------------------------------------------
# JDBC against embedded Derby
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "store"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip_users_table(spark, fraud_data, derby_url):
    """users-shaped dimension (init.sql:100-109) writes and reads back
    losslessly through the JDBC path."""
    users, _, _ = fraud_data
    dim = users.select("user_id", "kyc_status", "risk_score", "created_at")
    write_jdbc(dim, derby_url, "users", mode="overwrite")
    back = read_jdbc(spark, derby_url, "users")
    assert back.count() == dim.count()
    assert sorted(back.columns) == sorted(dim.columns)
    a = dim.orderBy("user_id").toPandas()
    b = back.orderBy("user_id").toPandas()[a.columns]
    assert (a["user_id"] == b["user_id"]).all()
    assert (a["risk_score"] - b["risk_score"]).abs().max() < 1e-12


def test_jdbc_partitioned_read_same_rows(spark, fraud_data, derby_url):
    """A partitioned parallel read (partitionColumn + bounds → N concurrent
    connections) returns exactly the same rows as the single-connection
    read — and actually splits the scan."""
    _, _, tx = fraud_data
    fact = tx.select(
        "transaction_id",
        "user_id",
        "merchant_id",
        "amount",
        "is_fraud",
        "fraud_score",
        F.row_number().over(Window.orderBy("transaction_id")).alias("rownum"),
    )
    write_jdbc(fact, derby_url, "transactions", mode="overwrite")
    n = fact.count()
    serial = read_jdbc(spark, derby_url, "transactions")
    parallel = read_jdbc(
        spark,
        derby_url,
        "transactions",
        partition_column="rownum",
        num_partitions=4,
        lower_bound=1,
        upper_bound=n + 1,
    )
    assert parallel.rdd.getNumPartitions() == 4
    assert parallel.count() == serial.count() == n
    assert parallel.select(F.sum("rownum")).first()[0] == n * (n + 1) // 2


def test_jdbc_append_mode(spark, fraud_data, derby_url):
    _, merchants, _ = fraud_data
    dim = merchants.select("merchant_id", "category", "risk_level", "is_blacklisted")
    write_jdbc(dim, derby_url, "merchants", mode="overwrite")
    write_jdbc(dim.limit(5), derby_url, "merchants", mode="append")
    assert read_jdbc(spark, derby_url, "merchants").count() == dim.count() + 5


# ---------------------------------------------------------------------------
# Kafka contract (no broker: pin options + wire frames)
# ---------------------------------------------------------------------------
def test_kafka_source_options_match_reference():
    """FraudDetectionJob.java:141-157: payment-transactions, the job's group
    id, latest offsets, read_committed."""
    opts = K.kafka_source_options("kafka-1:9092")
    assert opts == {
        "kafka.bootstrap.servers": "kafka-1:9092",
        "subscribe": "payment-transactions",
        "startingOffsets": "latest",
        "kafka.group.id": "fraud-detection-flink-job",
        "kafka.isolation.level": "read_committed",
    }


def test_kafka_sink_options_and_topics():
    """S4-S6 route to the topics of create-topics.sh:92-124."""
    assert K.SINK_TOPICS == {
        "fraud_alerts": "fraud-alerts",
        "transaction_enriched": "transaction-enriched",
        "transaction_features": "transaction-features",
    }
    opts = K.kafka_sink_options("kafka-1:9092", K.TOPIC_ALERTS, "/ckpt/alerts")
    assert opts == {
        "kafka.bootstrap.servers": "kafka-1:9092",
        "topic": "fraud-alerts",
        "checkpointLocation": "/ckpt/alerts",
    }


def test_kafka_sink_frames_wire_contract(spark, fraud_data):
    """Every fan-out frame is the kafka writer shape — exactly (key, value),
    key = transaction_id, value = the full row as JSON."""
    users, merchants, tx = fraud_data
    scored = P.score_transactions(tx.limit(200), users, merchants)
    frames = K.kafka_sink_frames(scored)
    assert set(frames) == {"fraud-alerts", "transaction-enriched", "transaction-features"}
    for topic, frame in frames.items():
        assert frame.columns == ["key", "value"], topic
        row = frame.first()
        if row is None:  # alerts can be empty on a low-fraud sample
            continue
        body = json.loads(row["value"])
        assert row["key"] == body["transaction_id"], topic
    enriched = frames["transaction-enriched"].limit(1).collect()[0]
    body = json.loads(enriched["value"])
    # enriched payload carries the scored row, not a projection
    for col in ("amount", "model_score", "decision", "risk_level"):
        assert col in body
