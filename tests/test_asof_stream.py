"""Streaming as-of enrichment == batch asof_join on the same data when
reference rows arrive no later than the events they should match (the
append-mode contract), including matches carried ACROSS micro-batches."""

from __future__ import annotations

import time

import pandas as pd

from realtime_fraud_detection_spark.operators.joins import asof_join
from realtime_fraud_detection_spark.streaming.pipeline import to_memory_sink
from realtime_fraud_detection_spark.streaming.stateful import asof_enrich_stream

BASE = pd.Timestamp("2024-01-01 10:00:00")


def _tagged_frames():
    # batch 1: two reference observations, one event between them
    b1 = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": [
                BASE,
                BASE + pd.Timedelta("5 min"),
                BASE + pd.Timedelta("3 min"),
                BASE + pd.Timedelta("1 min"),
            ],
            "is_left": [0, 0, 1, 1],
            "row_id": [100, 101, 1000, 2000],
            "value": [10.0, 20.0, 0.0, 0.0],
        }
    )
    # batch 2: an event whose match (ref at +5min) arrived in batch 1,
    # plus a same-timestamp ref+event pair (equal-ts must match)
    b2 = pd.DataFrame(
        {
            "user_id": [1, 2, 2],
            "ts": [
                BASE + pd.Timedelta("7 min"),
                BASE + pd.Timedelta("8 min"),
                BASE + pd.Timedelta("8 min"),
            ],
            "is_left": [1, 0, 1],
            "row_id": [1001, 102, 2001],
            "value": [0.0, 30.0, 0.0],
        }
    )
    return b1, b2


def test_asof_stream_matches_batch(spark, tmp_path, drain_stream):
    b1, b2 = _tagged_frames()
    src = str(tmp_path / "src")
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, is_left long, row_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = to_memory_sink(
        asof_enrich_stream(stream), "asof_stream_test", str(tmp_path / "ck"), "append"
    )
    drain_stream(q, "asof_stream_test", expect=4)
    got = (
        spark.sql("select * from asof_stream_test")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )

    # expectations
    assert len(got) == 4
    # u1 event at +3min matches ref at +0 (10.0), not the later +5min ref
    assert got.loc[1000, "matched_value"] == 10.0
    # u2 event at +1min has no ref at all -> null match
    assert pd.isna(got.loc[2000, "matched_value"])
    # u1 event at +7min (batch 2) matches the +5min ref from batch 1 —
    # state carries across batches
    assert got.loc[1001, "matched_value"] == 20.0
    # u2 equal-timestamp ref+event in one batch: ref visible at equal ts
    assert got.loc[2001, "matched_value"] == 30.0

    # and the whole output equals the batch operator on the union
    allrows = spark.createDataFrame(pd.concat([b1, b2]))
    left = allrows.filter("is_left = 1").select("user_id", "ts", "row_id")
    right = allrows.filter("is_left = 0").select(
        "user_id", "ts", "value"
    )
    batch = asof_join(left, right, "user_id").toPandas().set_index("row_id").sort_index()
    assert list(batch.index) == list(got.index)
    for rid in got.index:
        bm, gm = batch.loc[rid, "value_asof"], got.loc[rid, "matched_value"]
        assert (pd.isna(bm) and pd.isna(gm)) or bm == gm
        bt, gt = batch.loc[rid, "ts_asof"], got.loc[rid, "matched_ts"]
        assert (pd.isna(bt) and pd.isna(gt)) or bt == gt


def test_asof_stream_retention_parse(spark):
    """Any '<n> unit' retention parses; garbage raises (no silent 24h)."""
    import pytest

    from realtime_fraud_detection_spark.streaming import stateful

    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, is_left int, row_id long, value double"
    )
    # parses without error (the bug was '6 hours' silently becoming 24h)
    for r in ("6 hours", "90 seconds", "1 day", "15 minutes"):
        asof_enrich_stream(df, retention=r)
    with pytest.raises(ValueError, match="retention"):
        asof_enrich_stream(df, retention="fortnight")
