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


def test_mid_stream_encoder_reload(spark, tmp_path):
    """The serve-side target encoder hot-reloads mid-stream (M9 contract
    applied to ml/encoding's artifact): batch k encodes under version 1's
    level stats, batch k+1 under version 2's — same query, no restart,
    every row stamped with encoder_version."""
    from realtime_fraud_detection_spark.ml.encoding import (
        apply_target_encoder,
        fit_target_encoder,
        load_target_encoder,
        save_target_encoder,
    )
    from realtime_fraud_detection_spark.streaming.sinks import (
        run_reloading_encoder_stream,
    )

    enc_path = str(tmp_path / "encoder")
    src = str(tmp_path / "esrc")
    out = str(tmp_path / "eout")
    ck = str(tmp_path / "eck")
    os.makedirs(src)

    def _train(spark, flip):
        rows = [
            (i, "a" if i % 2 == 0 else "b", (i % 3 == 0) != flip)
            for i in range(40)
        ]
        return spark.createDataFrame(
            [(i, c, int(y)) for i, c, y in rows],
            "id long, cat string, label int",
        )

    levels1, meta1 = fit_target_encoder(_train(spark, False), "cat", "label")
    save_target_encoder(levels1, meta1, enc_path, model_version=1)

    def _batch(start):
        return spark.range(start, start + 30).select(
            F.col("id").alias("tx_id"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("cat"),
        )

    _batch(0).coalesce(1).write.parquet(src, mode="append")
    stream = spark.readStream.schema("tx_id bigint, cat string").parquet(src)
    q = run_reloading_encoder_stream(stream, enc_path, out, ck,
                                     trigger_seconds=0.25)
    try:
        got1 = _poll(spark, out, lambda d: d.count() >= 30)
        assert {r["encoder_version"] for r in got1.collect()} == {1}

        # hot swap: re-fit on flipped labels, version bumped
        levels2, meta2 = fit_target_encoder(_train(spark, True), "cat", "label")
        save_target_encoder(levels2, meta2, enc_path, model_version=2)
        _batch(1000).coalesce(1).write.parquet(src, mode="append")
        got2 = _poll(
            spark, out,
            lambda d: d.filter(F.col("encoder_version") == 2).count() >= 30,
        )
    finally:
        q.stop()
        q.awaitTermination(30)

    rows = {r["tx_id"]: r for r in got2.collect()}
    # batch-version stamps: first batch v1, second v2, same query
    assert rows[0]["encoder_version"] == 1
    assert rows[1000]["encoder_version"] == 2
    # the loadable artifact now holds v2 (the swap is on disk too)
    assert load_target_encoder(spark, enc_path)[1]["model_version"] == 2
    # the encoded values match the batch-form apply under EACH version
    want2 = {
        r["tx_id"]: r["cat_te"]
        for r in apply_target_encoder(_batch(1000), levels2, meta2).collect()
    }
    for tx in range(1000, 1030):
        assert rows[tx]["cat_te"] == want2[tx]
    want1 = {
        r["tx_id"]: r["cat_te"]
        for r in apply_target_encoder(_batch(0), levels1, meta1).collect()
    }
    for tx in range(0, 30):
        assert rows[tx]["cat_te"] == want1[tx]
    # and the two versions genuinely disagree (the flip moved the stats)
    assert rows[0]["cat_te"] != rows[1000]["cat_te"]
