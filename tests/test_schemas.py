"""Schema conformance: the declared StructTypes (SURVEY §1.3) are valid,
and the JSON serde produces rows conforming to TRANSACTION."""

from __future__ import annotations

import json

from realtime_fraud_detection_spark import schemas as S
from realtime_fraud_detection_spark.sources.kafka import parse_transactions, serialize_for_kafka


def test_all_schemas_instantiate(spark):
    for st in (
        S.TRANSACTION,
        S.USER_PROFILE,
        S.MERCHANT_PROFILE,
        S.USER_BEHAVIOR,
        S.FRAUD_ALERT,
        S.MERCHANT_UPDATE,
        S.FRAUD_PATTERN,
    ):
        df = spark.createDataFrame([], st)
        assert df.schema == st


def test_serde_roundtrip_conforms_to_schema(spark):
    payload = {
        "transaction_id": "tx9",
        "user_id": "u9",
        "merchant_id": "m9",
        "amount": 12.5,
        "currency": "USD",
        "transaction_type": "purchase",
        "payment_method": "credit_card",
        "card_type": "visa",
        "card_last_four": "1234",
        "ts": "2024-01-01T10:00:00.000Z",
        "ip_address": "10.0.0.1",
        "geolocation": {"lat": 1.0, "lon": 2.0},
        "is_fraud": False,
        "fraud_score": 0.1,
    }
    raw = spark.createDataFrame([(json.dumps(payload),)], ["value"])
    parsed = parse_transactions(raw)
    tx_fields = {f.name for f in S.TRANSACTION.fields}
    assert tx_fields <= set(parsed.columns)
    row = parsed.first()
    assert row["transaction_id"] == "tx9"
    assert row["geolocation"]["lat"] == 1.0
    assert row["ts"] is not None
    # and back out: serialized payload parses as JSON with the key first
    out = serialize_for_kafka(parsed.select(*tx_fields)).first()
    body = json.loads(out["value"])
    assert body["transaction_id"] == "tx9"
    assert out["key"] == "tx9"
