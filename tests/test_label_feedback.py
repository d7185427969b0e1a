"""Delayed-label feedback loop (streaming/pipeline.label_feedback_join →
streaming/sinks.eval_partial_writer): scores stream now, outcomes stream
later; the joined pairs' streamed ranking metrics must equal a batch
binary_eval over the matched pairs bit-exactly, duplicate label
deliveries must not double-count, and labels outside the feedback window
must not match."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.hashing import md5_bigint
from realtime_fraud_detection_spark.ml.evaluation import binary_eval
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming.pipeline import (
    label_feedback_join,
)
from realtime_fraud_detection_spark.streaming.sinks import (
    eval_partial_writer,
    eval_rollup_view,
)
from tests.conftest import SF_SMOKE


def _frames(spark, delay_minutes=2):
    ev = load_table(spark, SF_SMOKE, "events").filter(F.col("event_id") < 600)
    score = F.round(((F.col("event_id") * 37) % 1000) / 1000.0, 6)
    scored = ev.select("event_id", "ts", score.alias("score"))
    coin = (
        md5_bigint(F.col("event_id").cast("string"), "fb:") % 1_000_000
    ) / 1e6
    labels = ev.select(
        "event_id",
        (F.col("ts") + F.expr(f"interval {delay_minutes} minutes")).alias(
            "ts"
        ),
        F.when(coin < 0.3, 1).otherwise(0).alias("label"),
    )
    return scored, labels


def _stream(spark, df, path):
    # one file per side: the fixture's event times are not ordered across
    # files, so per-file triggers would advance the watermark past
    # still-unseen earlier scores and evict their join state — a real
    # property of out-of-order REPLAY, not of the live stream this
    # models (labels trail scores by minutes; the watermark trails with
    # them). The window-exclusion law is pinned separately below.
    df.coalesce(1).write.parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def test_streamed_feedback_metrics_match_batch(spark, tmp_path):
    scored, labels = _frames(spark)
    s = _stream(spark, scored, str(tmp_path / "scores"))
    l = _stream(spark, labels, str(tmp_path / "labels"))
    joined = label_feedback_join(s, l, max_delay="10 minutes")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.foreachBatch(eval_partial_writer(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    streamed = eval_rollup_view(spark, out).first()
    # batch twin over the same matched pairs (all labels arrive in-window)
    batch = binary_eval(
        scored.join(labels.select("event_id", "label"), "event_id")
    ).first()
    assert streamed == batch
    assert streamed["n"] == 600 and 0.3 < streamed["auc"] < 0.7


def test_duplicate_label_delivery_not_double_counted(spark, tmp_path):
    scored, labels = _frames(spark)
    dup_labels = labels.unionAll(labels)  # at-least-once delivery
    s = _stream(spark, scored, str(tmp_path / "scores"))
    l = _stream(spark, dup_labels, str(tmp_path / "labels"))
    joined = label_feedback_join(s, l, max_delay="10 minutes")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.foreachBatch(eval_partial_writer(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    assert eval_rollup_view(spark, out).first()["n"] == 600


def test_labels_outside_window_do_not_match(spark, tmp_path):
    scored, labels = _frames(spark, delay_minutes=30)  # past max_delay
    s = _stream(spark, scored, str(tmp_path / "scores"))
    l = _stream(spark, labels, str(tmp_path / "labels"))
    joined = label_feedback_join(s, l, max_delay="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("fb_window")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert spark.table("fb_window").count() == 0


def test_shadowed_label_column_raises(spark):
    """A label-side payload column sharing a name with a score-side
    column would be silently dropped — downstream eval would consume the
    stale decision-time value as ground truth. The join must refuse
    instead (round-9 advice)."""
    scored, labels = _frames(spark)
    poisoned = labels.withColumnRenamed("label", "score")  # clashes
    with pytest.raises(ValueError, match="shadow"):
        label_feedback_join(scored, poisoned, max_delay="10 minutes")
