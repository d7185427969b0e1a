"""M9 mid-stream model reload: a live streaming query picks up a new model
artifact version between micro-batches (model_manager.py:82-307,348-380 —
the reload endpoint becomes an atomic artifact replace; the broadcast is
swapped, not the query)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.models import (
    load_linear_scorer,
    save_linear_scorer,
)
from realtime_fraud_detection_spark.streaming.sinks import (
    reloading_scorer_writer,
    run_reloading_scorer_stream,
)


def _rows(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("tx_id"),
        (F.col("id") % 7).cast("double").alias("amount"),
        (F.col("id") % 3).cast("double").alias("risk"),
    )


def _poll(spark, out_dir, pred, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            got = spark.read.parquet(out_dir)
            if pred(got):
                return got
        except Exception:
            pass
        time.sleep(0.25)
    raise AssertionError("sink never reached expected state")


def test_mid_stream_reload_flips_scores(spark, tmp_path):
    model = str(tmp_path / "model.json")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    save_linear_scorer(model, {"amount": 1.0, "risk": 10.0}, bias=0.5, version=1)
    _rows(spark, 0, 50).coalesce(1).write.parquet(src, mode="append")

    stream = spark.readStream.schema(
        "tx_id bigint, amount double, risk double"
    ).parquet(src)
    q = run_reloading_scorer_stream(
        stream, model, out, ck, trigger_seconds=0.25
    )
    try:
        got1 = _poll(spark, out, lambda d: d.count() >= 50)
        assert {r["model_version"] for r in got1.collect()} == {1}

        # hot swap: new weights AND a new feature mix, version bumped
        save_linear_scorer(model, {"amount": -2.0, "risk": 0.0}, bias=100.0, version=2)
        _rows(spark, 1000, 50).coalesce(1).write.parquet(src, mode="append")
        got2 = _poll(
            spark, out,
            lambda d: d.filter(F.col("model_version") == 2).count() >= 50,
        )
    finally:
        q.stop()
        q.awaitTermination(30)

    rows = {r["tx_id"]: r for r in got2.collect()}
    # batch k scored by v1, batch k+1 by v2 — same query, no restart
    for tx in range(0, 50):
        r = rows[tx]
        assert r["model_version"] == 1
        assert r["model_score"] == (tx % 7) * 1.0 + (tx % 3) * 10.0 + 0.5
    for tx in range(1000, 1050):
        r = rows[tx]
        assert r["model_version"] == 2
        assert r["model_score"] == (tx % 7) * -2.0 + (tx % 3) * 0.0 + 100.0


def test_reload_writer_replay_idempotent(spark, tmp_path):
    """Replaying a batch_id rewrites its partition (no duplicates), and the
    replay scores with the artifact's CURRENT version — the documented
    per-(batch, version) replay contract."""
    model = str(tmp_path / "m.json")
    out = str(tmp_path / "o")
    save_linear_scorer(model, {"amount": 2.0}, bias=0.0, version=1)
    w = reloading_scorer_writer(model, out)

    batch = _rows(spark, 0, 20).drop("risk")
    w(batch, 0)
    w(batch, 0)  # replay
    got = spark.read.parquet(out)
    assert got.count() == 20
    assert got.filter(F.col("model_score") != F.col("amount") * 2.0).count() == 0

    # artifact swapped between original write and replay → replay converges
    # to the new version for that batch only
    save_linear_scorer(model, {"amount": 3.0}, bias=1.0, version=2)
    w(batch, 1)
    w(batch, 0)  # replay batch 0 under v2
    got = spark.read.parquet(out).collect()
    assert len(got) == 40
    assert all(r["model_version"] == 2 for r in got)
    assert all(r["model_score"] == r["amount"] * 3.0 + 1.0 for r in got)


def test_artifact_roundtrip_and_atomicity(tmp_path):
    p = str(tmp_path / "a.json")
    save_linear_scorer(p, {"x": 1.5, "y": -0.25}, bias=0.125, version=7)
    art = load_linear_scorer(p)
    assert art["version"] == 7
    assert art["weights"] == {"x": 1.5, "y": -0.25}
    assert art["bias"] == 0.125
    assert not os.path.exists(p + ".tmp")  # rename, not in-place write

    with pytest.raises(ValueError):
        # wrong-kind artifact is refused, not silently served
        from realtime_fraud_detection_spark.functions.artifacts import (
            FORMAT,
            atomic_write,
        )

        atomic_write(p, {"format": FORMAT, "kind": "something_else"})
        load_linear_scorer(p)
