"""Contract-gated streaming ingest (streaming/sinks.contract_gated_writer):
each micro-batch splits losslessly into clean rows, tagged violations,
and per-rule counts; the union across batches equals a batch-mode
check_invariants run; replays are idempotent."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.validation import (
    check_invariants,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming.sinks import (
    contract_gated_writer,
    contract_violation_summary,
)
from tests.conftest import SF_SMOKE


def _rules():
    return {
        "positive_value": F.col("value") > 0,
        "known_type": F.col("event_type").isin(
            "view", "click", "purchase", "login", "logout"
        ),
    }


def test_streamed_contract_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    out = str(tmp_path / "out")

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            contract_gated_writer(out, _rules, id_cols=["event_id"])
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    batch_violations, batch_summary = check_invariants(
        ev, _rules(), id_cols=["event_id"]
    )
    streamed_summary = {
        r["rule"]: r["n_violations"]
        for r in contract_violation_summary(spark, out).collect()
    }
    assert streamed_summary == batch_summary

    clean_ids = {
        r["event_id"] for r in spark.read.parquet(f"{out}/clean").collect()
    }
    bad = spark.read.parquet(f"{out}/violations").collect()
    bad_ids = {r["event_id"] for r in bad}
    all_ids = {r["event_id"] for r in ev.select("event_id").collect()}
    # lossless split
    assert clean_ids | bad_ids == all_ids
    assert not (clean_ids & bad_ids)
    # tags match the batch check
    want_tags = {
        r["event_id"]: sorted(r["failed_rules"])
        for r in batch_violations.collect()
    }
    got_tags = {r["event_id"]: sorted(json.loads(r["failed_rules"])) for r in bad}
    assert got_tags == want_tags

    # replay of batch 0 (same slice, same id) changes nothing
    writer = contract_gated_writer(out, _rules, id_cols=["event_id"])
    writer(spark.read.parquet(src).limit(200), 0)
    before = dict(streamed_summary)
    writer(spark.read.parquet(src).limit(200), 0)
    after = {
        r["rule"]: r["n_violations"]
        for r in contract_violation_summary(spark, out).collect()
    }
    # two identical replays of the same batch id are idempotent
    assert after == {
        r["rule"]: r["n_violations"]
        for r in contract_violation_summary(spark, out).collect()
    }
    assert set(after) == set(before)
