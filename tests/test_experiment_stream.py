"""Streaming A/B experiment monitoring (streaming/sinks.
experiment_partial_writer → experiment_rollup_view): the rolled-up
analysis over micro-batched results must equal the batch
experiment_analysis over the union BIT-exactly (moments are counts +
exact decimal sums — lossless merge), and replaying a batch must not
move the view (partition-overwrite idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.experiments import (
    assign_variants,
    experiment_analysis,
    experiments_table,
)
from realtime_fraud_detection_spark.streaming.sinks import (
    experiment_partial_writer,
    experiment_rollup_view,
)

RESULT_SCHEMA = (
    "transaction_id long, user_id long, model_used string, "
    "prediction double, decision string, actual_fraud boolean, "
    "processing_time_ms double"
)


def _results(spark, n=600):
    rows = []
    for i in range(n):
        pred = ((i * i * 37) % 1000) / 1000.0
        decision = (
            "DECLINE" if pred >= 0.8
            else "REVIEW" if pred >= 0.6
            else "APPROVE_WITH_MONITORING" if pred >= 0.4
            else "APPROVE"
        )
        rows.append(
            (i, i % 131, "m", pred, decision, bool((i * 13) % 5 == 0),
             float(5 + i % 20))
        )
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def _exps(spark):
    return experiments_table(
        spark,
        [
            dict(
                test_name="rate", control_model="a", treatment_model="b",
                traffic_split=0.5, success_metric="fraud_detection_rate",
                min_sample_size=100, significance_level=0.05,
            ),
            dict(
                test_name="score", control_model="a", treatment_model="b",
                traffic_split=0.4, success_metric="prediction_score",
                min_sample_size=100, significance_level=0.05,
            ),
        ],
    )


def _rows(df):
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def test_streamed_rollup_equals_batch_bit_exact(spark, tmp_path):
    results = _results(spark)
    exps = _exps(spark)
    src = str(tmp_path / "src")
    results.repartition(4).write.parquet(src)
    out = str(tmp_path / "out")

    stream = (
        spark.readStream.schema(results.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(experiment_partial_writer(out, exps))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    streamed = _rows(experiment_rollup_view(spark, out))
    batch = _rows(
        experiment_analysis(assign_variants(results, exps), exps)
    )
    assert streamed == batch  # bit-exact: floats compare with ==
    assert len(streamed) == 2


def test_replay_does_not_move_the_view(spark, tmp_path):
    results = _results(spark, 300)
    exps = _exps(spark)
    out = str(tmp_path / "out")
    writer = experiment_partial_writer(out, exps)
    writer(results.filter(F.col("transaction_id") < 150), 0)
    writer(results.filter(F.col("transaction_id") >= 150), 1)
    first = _rows(experiment_rollup_view(spark, out))
    # replay batch 1 (same data, same id) — partition overwrite, no drift
    writer(results.filter(F.col("transaction_id") >= 150), 1)
    second = _rows(experiment_rollup_view(spark, out))
    assert first == second


def test_store_is_moment_sized(spark, tmp_path):
    results = _results(spark, 500)
    exps = _exps(spark)
    out = str(tmp_path / "out")
    writer = experiment_partial_writer(out, exps)
    writer(results, 0)
    import os

    store = spark.read.parquet(os.path.join(out, "experiment_partials"))
    # ≤ |experiments| × 2 variants rows per batch, whatever the batch size
    assert store.count() <= 4


def test_streamed_metric_block_equals_batch_bit_exact(spark, tmp_path):
    """The per-variant metric block (decision rates, means, labeled
    confusion metrics) derived from the streamed moments must equal the
    batch variant_metrics over the union bit-exactly — every ingredient
    is a summable count or decimal sum."""
    from realtime_fraud_detection_spark.ml.experiments import (
        variant_metrics,
    )
    from realtime_fraud_detection_spark.streaming.sinks import (
        experiment_metrics_view,
    )

    results = _results(spark, 500)
    exps = _exps(spark)
    out = str(tmp_path / "out")
    writer = experiment_partial_writer(out, exps)
    writer(results.filter(F.col("transaction_id") % 3 == 0), 0)
    writer(results.filter(F.col("transaction_id") % 3 == 1), 1)
    writer(results.filter(F.col("transaction_id") % 3 == 2), 2)

    streamed = _rows(experiment_metrics_view(spark, out))
    batch = _rows(variant_metrics(assign_variants(results, exps)))
    assert streamed == batch
    assert len(streamed) == 4  # 2 experiments x 2 arms
