"""Streaming model-evaluation rollups (streaming/sinks.eval_partial_writer
/ eval_rollup_view): the streamed store must reproduce batch
ml/evaluation.binary_eval BIT-EXACTLY (per-score pos/neg partials merge
losslessly; everything up to the final division is integer arithmetic),
and replaying a batch must change nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.hashing import md5_bigint
from realtime_fraud_detection_spark.ml.evaluation import binary_eval
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming.sinks import (
    eval_partial_writer,
    eval_rollup_view,
)
from tests.conftest import SF_SMOKE


def _scored(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    score = ((F.col("event_id") * 37) % 1000) / 1000.0
    coin = (
        md5_bigint(F.col("event_id").cast("string"), "ev:") % 1_000_000
    ) / 1e6
    return ev.select(
        "event_type",
        # round exactly as the sink's score_decimals=6 contract does
        F.round(score, 6).alias("score"),
        F.when(coin < score * score, 1).otherwise(0).alias("label"),
    )


def _metrics(df):
    return {tuple(r)[0]: tuple(r)[1:] for r in df.collect()}


def test_streamed_eval_matches_batch_bit_exactly(spark, tmp_path):
    scored = _scored(spark)
    src = str(tmp_path / "src")
    scored.repartition(4).write.parquet(src)

    q = (
        spark.readStream.schema(scored.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            eval_partial_writer(str(tmp_path / "out"), key_cols=["event_type"])
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    streamed = _metrics(
        eval_rollup_view(spark, str(tmp_path / "out"), key_cols=["event_type"])
    )
    batch = _metrics(binary_eval(scored, by=["event_type"]))
    assert streamed == batch and len(streamed) >= 4
    for _, (n, pos, auc, ks, ap) in streamed.items():
        assert 0.5 < auc <= 1.0 and 0.0 < ks <= 1.0 and 0.0 < ap <= 1.0


def test_replay_is_idempotent(spark, tmp_path):
    scored = _scored(spark).limit(500)
    out = str(tmp_path / "out")
    writer = eval_partial_writer(out, key_cols=["event_type"])
    writer(scored, 0)
    first = _metrics(eval_rollup_view(spark, out, key_cols=["event_type"]))
    writer(scored, 0)
    second = _metrics(eval_rollup_view(spark, out, key_cols=["event_type"]))
    assert first == second and len(first) > 0


def test_partial_state_is_bounded_by_rounding(spark, tmp_path):
    # scores with 12 significant decimals collapse to <= 10^2 groups at
    # score_decimals=2 — the per-batch state bound
    df = spark.range(5000).select(
        (F.col("id") / 4999.0).alias("score"),
        (F.col("id") % 2).alias("label"),
    )
    out = str(tmp_path / "out")
    eval_partial_writer(out, score_decimals=2)(df, 0)
    partials = spark.read.parquet(out + "/eval_partials")
    assert partials.count() <= 101
    assert partials.agg(F.sum("pos") + F.sum("neg")).first()[0] == 5000
