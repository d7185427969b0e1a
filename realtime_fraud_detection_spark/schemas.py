"""Explicit StructTypes for every record type in the engine.

Fraud-domain schemas reconstructed in SURVEY §1.3 from the reference's
simulator dataclasses (services/data-simulator/src/main/python/simulator.py:40-101),
Postgres DDL (docker/postgres/init.sql:100-170), and Flink getter usage
(TransactionProcessor.java / FeatureExtractor.java). Testdata schemas mirror
/root/testdata (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

GEO = T.StructType(
    [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
)

# Transaction event (simulator.py:78-101, init.sql:151-170)
TRANSACTION = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("user_id", T.StringType()),
        T.StructField("merchant_id", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("currency", T.StringType()),
        T.StructField("transaction_type", T.StringType()),
        T.StructField("payment_method", T.StringType()),
        T.StructField("card_type", T.StringType()),
        T.StructField("card_last_four", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ip_address", T.StringType()),
        T.StructField("device_id", T.StringType()),
        T.StructField("device_fingerprint", T.StringType()),
        T.StructField("user_agent", T.StringType()),
        T.StructField("geolocation", GEO),
        T.StructField("merchant_location", GEO),
        T.StructField("is_weekend", T.BooleanType()),
        T.StructField("hour_of_day", T.IntegerType()),
        T.StructField("is_fraud", T.BooleanType()),
        T.StructField("fraud_type", T.StringType()),
        T.StructField("fraud_score", T.DoubleType()),
        T.StructField("processing_time_ms", T.IntegerType()),
    ]
)

# UserProfile (simulator.py:40-60, init.sql:100-109)
USER_PROFILE = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("date_of_birth", T.DateType()),
        T.StructField("country", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("zip_code", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("kyc_status", T.StringType()),
        T.StructField("risk_score", T.DoubleType()),
        T.StructField("avg_transaction_amount", T.DoubleType()),
        T.StructField("transaction_frequency", T.IntegerType()),
        T.StructField("preferred_merchants", T.ArrayType(T.StringType())),
        T.StructField("device_fingerprints", T.ArrayType(T.StringType())),
        T.StructField(
            "behavioral_patterns",
            T.StructType(
                [
                    T.StructField("preferred_time_start", T.IntegerType()),
                    T.StructField("preferred_time_end", T.IntegerType()),
                    T.StructField("weekend_activity", T.DoubleType()),
                    T.StructField("international_transactions", T.DoubleType()),
                    T.StructField("online_preference", T.DoubleType()),
                ]
            ),
        ),
    ]
)

# MerchantProfile (simulator.py:62-75, init.sql:139-149)
MERCHANT_PROFILE = T.StructType(
    [
        T.StructField("merchant_id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("mcc", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("risk_level", T.StringType()),
        T.StructField("avg_transaction_amount", T.DoubleType()),
        T.StructField("fraud_rate", T.DoubleType()),
        T.StructField("is_blacklisted", T.BooleanType()),
        T.StructField(
            "operating_hours",
            T.StructType(
                [
                    T.StructField("start_hour", T.IntegerType()),
                    T.StructField("end_hour", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# UserBehaviorEvent (simulator.py:388-403, flags StreamJoiner.java:194-199)
USER_BEHAVIOR = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("merchant_category", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("geolocation", GEO),
        T.StructField("device_fingerprint", T.StringType()),
        T.StructField("is_anomalous_login", T.BooleanType()),
        T.StructField("is_short_session", T.BooleanType()),
        T.StructField("is_anomalous_navigation", T.BooleanType()),
    ]
)

# FraudAlert (simulator.py:405-421, FraudDetectionJob.java:78)
FRAUD_ALERT = T.StructType(
    [
        T.StructField("alert_id", T.StringType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("fraud_score", T.DoubleType()),
        T.StructField("fraud_type", T.StringType()),
        T.StructField("alert_level", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# merchant_updates SCD stream (StreamJoiner.java:55-75 accessor usage)
MERCHANT_UPDATE = T.StructType(
    [
        T.StructField("merchant_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("risk_level_increased", T.BooleanType()),
        T.StructField("fraud_rate_increased", T.BooleanType()),
        T.StructField("newly_blacklisted", T.BooleanType()),
    ]
)

# historical_fraud_patterns (StreamJoiner.java:81-101,238-292)
FRAUD_PATTERN = T.StructType(
    [
        T.StructField("payment_method", T.StringType()),
        T.StructField("merchant_category", T.StringType()),
        T.StructField("amount_range", T.DoubleType()),
        T.StructField("hour_of_day", T.IntegerType()),
        T.StructField("fraud_rate", T.DoubleType()),
        T.StructField("occurrence_count", T.IntegerType()),
        T.StructField("is_recent_pattern", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
