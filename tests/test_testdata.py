"""load_table normalization: events.ts must come out as plain TimestampType
regardless of how the driver encoded the fixture (INT64 TIMESTAMP(NANOS) in
round 1, TIMESTAMP(MICROS)/NTZ in round 2). Regression for the round-2 gate
collapse (ADVICE.md r2)."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import TimestampType

from realtime_fraud_detection_spark.sources.testdata import load_table

from conftest import SF_SMOKE

EXPECTED = datetime.datetime(2024, 3, 1, 12, 34, 56, 789000)
EPOCH_US = int(EXPECTED.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def _fixture_dir(tmp_path, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["purchase"]),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(['{"k":1}']),
        }
    )
    d = tmp_path / "sf"
    d.mkdir(parents=True)
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_real_fixture_ts_is_timestamp(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    assert ev.count() > 0


def test_nanos_as_long_encoding(spark, tmp_path):
    arr = pa.array([EPOCH_US * 1000], pa.timestamp("ns"))
    sf = _fixture_dir(tmp_path, arr)
    ev = load_table(spark, sf, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    assert ev.first()["ts"] == EXPECTED


def test_plain_int64_epoch_encodings(spark, tmp_path):
    # a future regeneration might write ts as a raw epoch integer in any
    # unit — the loader detects the unit by magnitude
    for unit, v in [
        ("us", EPOCH_US),
        ("ms", EPOCH_US // 1000),
        ("s", EPOCH_US // 1_000_000),
    ]:
        arr = pa.array([v], pa.int64())
        sf = _fixture_dir(tmp_path / unit, arr)
        ev = load_table(spark, sf, "events")
        assert isinstance(ev.schema["ts"].dataType, TimestampType), unit
        expected = EXPECTED.replace(microsecond=0) if unit == "s" else EXPECTED
        assert ev.first()["ts"] == expected, unit


def test_micros_ntz_encoding(spark, tmp_path):
    arr = pa.array([EXPECTED], pa.timestamp("us"))
    sf = _fixture_dir(tmp_path, arr)
    ev = load_table(spark, sf, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    assert ev.first()["ts"] == EXPECTED


def test_micros_utc_adjusted_encoding(spark, tmp_path):
    # isAdjustedToUTC=true reads as plain TIMESTAMP already — pass-through.
    arr = pa.array([EPOCH_US], pa.timestamp("us", tz="UTC"))
    sf = _fixture_dir(tmp_path, arr)
    ev = load_table(spark, sf, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    assert ev.first()["ts"] == EXPECTED

def test_millis_encodings(spark, tmp_path):
    # TIMESTAMP(MILLIS) in both isAdjustedToUTC variants — Spark reads
    # NTZ as timestamp_ntz (cast branch) and UTC as plain timestamp
    for name, arr in [
        ("ntz", pa.array([EXPECTED], pa.timestamp("ms"))),
        ("utc", pa.array([EPOCH_US // 1000], pa.timestamp("ms", tz="UTC"))),
    ]:
        sf = _fixture_dir(tmp_path / name, arr)
        ev = load_table(spark, sf, "events")
        assert isinstance(ev.schema["ts"].dataType, TimestampType), name
        assert ev.first()["ts"] == EXPECTED, name


def test_nanos_utc_adjusted_encoding(spark, tmp_path):
    # TIMESTAMP(NANOS, isAdjustedToUTC=true): nanosAsLong still surfaces
    # it as bigint; the magnitude branch rebuilds the timestamp
    arr = pa.array([EPOCH_US * 1000], pa.timestamp("ns", tz="UTC"))
    sf = _fixture_dir(tmp_path, arr)
    ev = load_table(spark, sf, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    assert ev.first()["ts"] == EXPECTED


# ---------------------------------------------------------------------------
# orders.o_orderdate / lineitem.l_shipdate carry the same drift exposure as
# events.ts (currently TIMESTAMP(us)/NTZ fixtures) — the normalization must
# cover them table-generically.
# ---------------------------------------------------------------------------

def _orders_dir(tmp_path, date_array):
    table = pa.table(
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([7], pa.int64()),
            "o_orderstatus": pa.array(["O"]),
            "o_totalprice": pa.array([10.5], pa.float64()),
            "o_orderdate": date_array,
            "o_orderpriority": pa.array(["1-URGENT"]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir(parents=True)
    pq.write_table(table, os.path.join(str(d), "orders.parquet"))
    return str(d)


def test_real_fixture_order_and_ship_dates_are_timestamps(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    assert isinstance(orders.schema["o_orderdate"].dataType, TimestampType)
    li = load_table(spark, SF_SMOKE, "lineitem")
    assert isinstance(li.schema["l_shipdate"].dataType, TimestampType)


def test_orders_date_encodings_normalize(spark, tmp_path):
    cases = [
        ("nanos", pa.array([EPOCH_US * 1000], pa.timestamp("ns"))),
        ("ntz_us", pa.array([EXPECTED], pa.timestamp("us"))),
        ("int64_ms", pa.array([EPOCH_US // 1000], pa.int64())),
        ("utc_us", pa.array([EPOCH_US], pa.timestamp("us", tz="UTC"))),
    ]
    for name, arr in cases:
        sf = _orders_dir(tmp_path / name, arr)
        orders = load_table(spark, sf, "orders")
        assert isinstance(orders.schema["o_orderdate"].dataType, TimestampType), name
        assert orders.first()["o_orderdate"] == EXPECTED, name


def test_orders_date32_encoding_normalizes_to_midnight(spark, tmp_path):
    # DATE is the most plausible regeneration for an orderdate column
    arr = pa.array([EXPECTED.date()], pa.date32())
    sf = _orders_dir(tmp_path, arr)
    orders = load_table(spark, sf, "orders")
    assert isinstance(orders.schema["o_orderdate"].dataType, TimestampType)
    assert orders.first()["o_orderdate"] == datetime.datetime(2024, 3, 1)
