#!/usr/bin/env python3
"""Online sequential scoring demo — the round-10 pieces composed:

  batch history → trailing-window features (ml/sequential) → decimal-exact
    logistic fit → fold standardization into the M9 linear artifact
  live stream → stateful sequence features (streaming/stateful, bit-equal
    to the batch features) → artifact scoring → named A/B experiment
    (champion artifact vs challenger fit) with streamed moment partials

The point this demo proves end to end: the features a deployed sequence
model scores ONLINE are bit-identical to the ones it was TRAINED on in
batch (tests/test_sequence_stream.py pins it; here it is the wiring),
and the experiment verdict is computable from stored moments without
ever retaining per-event state.

Usage: python examples/online_sequence_scoring.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.experiments import (
    experiments_table,
)
from realtime_fraud_detection_spark.ml.models import (
    linear_scorer_udf,
    load_linear_scorer,
    save_linear_scorer,
)
from realtime_fraud_detection_spark.ml.sequential import (
    SEQ_FEATURES,
    lagged_sequence_features,
    to_linear_artifact,
    train_sequential_scorer,
)
from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources import generator as G
from realtime_fraud_detection_spark.streaming import stateful as ST
from realtime_fraud_detection_spark.streaming.sinks import (
    experiment_partial_writer,
    experiment_rollup_view,
)


def main() -> None:
    spark = get_spark("online-sequence-scoring")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    work = tempfile.mkdtemp(prefix="onlineseq_")

    # 1. history: seeded fraud fixture; train the sequential scorer on
    # the first two days, hold out day 3 as "the live stream"
    users, merchants = G.generate_profiles(n_users=400, n_merchants=80, seed=42)
    tx = G.generate_transactions(users, merchants, n=12_000, seed=42, days=3)
    _, _, t = G.to_spark(spark, users, merchants, tx)
    cut = t.agg(F.expr("percentile_approx(cast(ts as double), 0.66)")).first()[0]
    hist = t.filter(F.col("ts").cast("double") <= cut)
    live = t.filter(F.col("ts").cast("double") > cut)

    feats = lagged_sequence_features(
        hist, "user_id", "ts", "amount", "transaction_id"
    ).withColumn("label", F.col("is_fraud").cast("int"))
    # warm_start: closed-form Newton init riding the standardization
    # aggregate — on learnable labels like these it reaches cold@2k
    # quality in k rounds (SCALE.md sequence_scores A/B), so 8 rounds
    # here match the old 15-round cold fit at half the scheduled jobs
    model = train_sequential_scorer(feats, "label", iters=8, warm_start=True)
    weights, bias = to_linear_artifact(model)
    art_path = os.path.join(work, "seq_scorer.json")
    save_linear_scorer(art_path, weights, bias, version=1)
    print(f"trained on {feats.count()} events; artifact v1 at {art_path}")

    # 2. the live stream: day-3 events through the stateful feature
    # operator (two micro-batches), scored with the broadcast artifact
    src = os.path.join(work, "live")
    live.orderBy("ts", "transaction_id").coalesce(2).write.parquet(src)
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seq_stream = ST.sequence_feature_stream(stream)
    bc = spark.sparkContext.broadcast(load_linear_scorer(art_path))

    exps = experiments_table(
        spark,
        [dict(
            test_name="sequence_scorer_rollout",
            control_model="rules_v1",
            treatment_model="seq_v1",
            traffic_split=0.5,
            success_metric="prediction_score",
            min_sample_size=100,
            significance_level=0.05,
        )],
    )

    def score_and_monitor(batch, batch_id):
        margin = linear_scorer_udf(bc, SEQ_FEATURES)
        scored = batch.withColumn(
            "prediction", F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        ).select(
            "transaction_id",
            "user_id",
            F.lit("seq_v1").alias("model_used"),
            "prediction",
            F.when(F.col("prediction") >= 0.6, "REVIEW")
            .otherwise("APPROVE")
            .alias("decision"),
            F.lit(None).cast("boolean").alias("actual_fraud"),
            F.lit(1.0).alias("processing_time_ms"),
        )
        experiment_partial_writer(work, exps)(scored, batch_id)

    q = (
        seq_stream.writeStream.foreachBatch(score_and_monitor)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    row = experiment_rollup_view(spark, work).first()
    print(
        f"live experiment: control_n={row['control_n']} "
        f"treatment_n={row['treatment_n']} "
        f"treatment_mean_score={row['treatment_mean']:.4f} "
        f"test={row['test_type']}"
    )

    # 3. the online == offline law, demonstrated on the live slice
    online = ST.sequence_feature_batch(live).select(
        "transaction_id", *SEQ_FEATURES
    )
    offline = lagged_sequence_features(
        live, "user_id", "ts", "amount", "transaction_id"
    ).select("transaction_id", *SEQ_FEATURES)
    diff = online.exceptAll(offline).count()
    print(f"online-vs-offline feature rows differing: {diff} (must be 0)")
    assert diff == 0

    print(f"done in {time.time() - t0:.1f}s")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
