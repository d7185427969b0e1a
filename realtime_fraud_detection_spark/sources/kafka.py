"""Kafka + rate streaming sources and the JSON serde — SURVEY §2.1 S1-S6.

The Kafka readers/writers mirror the reference's source/sink wiring
(FraudDetectionJob.java:141-213): subscribe `payment-transactions` from
latest offsets, fan results out to `fraud-alerts` / `transaction-enriched` /
`transaction-features`. They require the spark-sql-kafka package on the
classpath; in this container there is no broker, so tests exercise the serde
and topology through file/rate/memory sources instead — the DataFrame logic
is source-agnostic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRANSACTION

TOPIC_TRANSACTIONS = "payment-transactions"
TOPIC_ALERTS = "fraud-alerts"
TOPIC_ENRICHED = "transaction-enriched"
TOPIC_FEATURES = "transaction-features"

# FraudDetectionJob.java:16 (JobConfig default)
CONSUMER_GROUP_ID = "fraud-detection-flink-job"

# the S4-S6 fan-out routing (FraudDetectionJob.java:162-196, topics created
# at scripts/setup/create-topics.sh:92-124)
SINK_TOPICS = {
    "fraud_alerts": TOPIC_ALERTS,
    "transaction_enriched": TOPIC_ENRICHED,
    "transaction_features": TOPIC_FEATURES,
}


def kafka_source_options(
    brokers: str,
    topic: str = TOPIC_TRANSACTIONS,
    starting_offsets: str = "latest",
    group_id: str = CONSUMER_GROUP_ID,
) -> dict[str, str]:
    """S1's exact consumer contract (FraudDetectionJob.java:141-157): the
    reference subscribes `payment-transactions` with its own group id, latest
    offsets, auto-commit off (Spark manages offsets via the checkpoint —
    same intent as Flink's enable.auto.commit=false), and read_committed
    isolation. Pure so the contract is testable without a broker."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "kafka.group.id": group_id,
        "kafka.isolation.level": "read_committed",
    }


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = TOPIC_TRANSACTIONS,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1 — Kafka source wired from :func:`kafka_source_options`."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(brokers, topic, starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load()


def parse_transactions(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S2 — JSON deserialization with the reference's error fallback
    (TransactionDeserializationSchema.java:28-49): a malformed payload
    becomes a placeholder ERROR transaction instead of failing the job.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), TRANSACTION).alias("tx"),
        F.col(value_col).cast("string").alias("_raw"),
    )
    bad = F.col("tx.transaction_id").isNull()
    return parsed.select(
        F.when(
            bad,
            F.concat(F.lit("ERROR_"), F.md5(F.coalesce(F.col("_raw"), F.lit("")))),
        )
        .otherwise(F.col("tx.transaction_id"))
        .alias("transaction_id"),
        F.when(bad, F.lit("ERROR")).otherwise(F.col("tx.user_id")).alias("user_id"),
        F.when(bad, F.lit("ERROR")).otherwise(F.col("tx.merchant_id")).alias("merchant_id"),
        F.when(bad, F.lit(0.0)).otherwise(F.col("tx.amount")).alias("amount"),
        *[
            F.col(f"tx.{f.name}").alias(f.name)
            for f in TRANSACTION.fields
            if f.name not in ("transaction_id", "user_id", "merchant_id", "amount")
        ],
        bad.alias("is_parse_error"),
    )


def serialize_for_kafka(df: DataFrame, key_col: str = "transaction_id") -> DataFrame:
    """S3 — to_json(struct(*)) → (key, value) shape the kafka sink expects
    (TransactionSerializationSchema.java:27-45)."""
    payload = [c for c in df.columns if c != key_col]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(key_col, *payload)).alias("value"),
    )


def kafka_sink_options(brokers: str, topic: str, checkpoint: str) -> dict[str, str]:
    """S4-S6's producer contract (FraudDetectionJob.java:162-196): one topic
    per sink, offsets tracked by the streaming checkpoint."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def write_kafka_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
):
    """S4/S5/S6 — Kafka sink wired from :func:`kafka_sink_options`; the
    frame is the (key, value-JSON) shape from :func:`serialize_for_kafka`."""
    writer = serialize_for_kafka(df).writeStream.format("kafka")
    for k, v in kafka_sink_options(brokers, topic, checkpoint).items():
        writer = writer.option(k, v)
    return writer.start()


def kafka_sink_frames(scored: DataFrame) -> dict[str, DataFrame]:
    """The S4-S6 fan-out as (topic → (key, value) frame): exactly what a
    foreachBatch kafka writer (or `write_kafka_stream` per topic) sends.
    Testable without a broker — the frames ARE the wire contract."""
    from .. import pipeline as P

    return {
        SINK_TOPICS["fraud_alerts"]: serialize_for_kafka(
            P.fraud_alerts(scored), key_col="transaction_id"
        ),
        SINK_TOPICS["transaction_enriched"]: serialize_for_kafka(
            scored, key_col="transaction_id"
        ),
        SINK_TOPICS["transaction_features"]: serialize_for_kafka(
            P.feature_vector(scored).drop("features"), key_col="transaction_id"
        ),
    }


def rate_transaction_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S9 (streaming form) — rate source dressed as a transaction stream for
    live demos (simulator.py:430-460's generator thread, minus Kafka).
    Deterministic per `value`; same derivations as the batch generator's
    statistical shapes, expression-only."""
    r = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    v = F.col("value")
    return r.select(
        F.concat(F.lit("tx_"), v.cast("string")).alias("transaction_id"),
        F.concat(F.lit("user_"), F.lpad((v % 300).cast("string"), 5, "0")).alias("user_id"),
        F.concat(F.lit("merch_"), F.lpad((v % 100).cast("string"), 5, "0")).alias("merchant_id"),
        (F.round(F.exp((v % 37).cast("double") / 9.0), 2) + 1.0).alias("amount"),
        F.lit("USD").alias("currency"),
        F.element_at(
            F.array(F.lit("purchase"), F.lit("refund"), F.lit("authorization")),
            ((v % 20) % 3 + 1).cast("int"),
        ).alias("transaction_type"),
        F.element_at(
            F.array(
                F.lit("credit_card"), F.lit("debit_card"), F.lit("digital_wallet"), F.lit("bank_transfer")
            ),
            ((v % 4) + 1).cast("int"),
        ).alias("payment_method"),
        F.col("timestamp").alias("ts"),
    )
