#!/usr/bin/env python3
"""Model-monitoring loop demo — what runs AROUND a deployed scorer:

  scores stream at decision time → outcomes arrive minutes later
    → watermarked label-feedback join (state bounded by the window)
    → per-batch mergeable eval partials (streaming/sinks)
    → whole-stream ranking metrics (AUC / KS / AP, bit-exact vs batch)
    → score-distribution drift (PSI vs the first window)
    → volume anomaly alarms (seasonal robust median/MAD)
    → isotonic calibration (Brier + ECE before/after)
    → AUC with its DeLong confidence interval
    → champion/challenger paired DeLong test on the same rows
    → measured operating point (max-F1 and expected-cost thresholds)

The reference tracks rolling accuracy counters and exposes hardcoded
0.95/0.8/0.6 decision bands; this loop derives every one of those
numbers from measured outcomes, with the exact-merge partials making the
streamed metrics identical to a batch recomputation (SCALE.md
"Evaluation metrics").

Usage: python examples/model_monitoring_loop.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.hashing import md5_bigint
from realtime_fraud_detection_spark.ml.calibration import (
    brier_score,
    calibrate,
    fit_isotonic_calibrator,
)
from realtime_fraud_detection_spark.ml.drift import psi_numeric
from realtime_fraud_detection_spark.operators.timeseries import (
    resample,
    seasonal_anomalies,
)
from realtime_fraud_detection_spark.ml.evaluation import (
    auc_with_ci,
    best_threshold,
    delong_paired_test,
    expected_calibration_error,
)
from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming.pipeline import (
    label_feedback_join,
)
from realtime_fraud_detection_spark.streaming.sinks import (
    eval_partial_writer,
    eval_rollup_view,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("model-monitoring-loop")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    work = tempfile.mkdtemp(prefix="monitoring_")

    # a deployed scorer: deterministic miscalibrated pseudo-model
    # (P(y=1|s) = s² — the shape an uncalibrated ranker actually has)
    ev = load_table(spark, sf_dir, "events")
    score = F.round(((F.col("event_id") * 37) % 1000) / 1000.0, 6)
    coin = (
        md5_bigint(F.col("event_id").cast("string"), "mon:") % 1_000_000
    ) / 1e6
    scored = ev.select(
        "event_id", "ts", "event_type", score.alias("score")
    )
    outcomes = ev.select(
        "event_id",
        (F.col("ts") + F.expr("interval 3 minutes")).alias("ts"),
        F.when(coin < score * score, 1).otherwise(0).alias("label"),
    )
    print(f"scored events: {scored.count()}")

    # 1. stream the feedback loop: scores ⋈ delayed outcomes → partials
    sdir, ldir = os.path.join(work, "scores"), os.path.join(work, "labels")
    scored.coalesce(1).write.parquet(sdir)
    outcomes.coalesce(1).write.parquet(ldir)
    joined = label_feedback_join(
        spark.readStream.schema(scored.schema).parquet(sdir),
        spark.readStream.schema(outcomes.schema).parquet(ldir),
        max_delay="10 minutes",
    )
    q = (
        joined.writeStream.foreachBatch(
            eval_partial_writer(work, key_cols=["event_type"])
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    matched = spark.read.parquet(os.path.join(work, "eval_partials"))
    print(
        "feedback-joined pairs:",
        matched.agg(F.sum(F.col("pos") + F.col("neg"))).first()[0],
    )

    # 2. whole-stream ranking metrics from the merged partials
    metrics = eval_rollup_view(spark, work, key_cols=["event_type"]).orderBy(
        "event_type"
    )
    for r in metrics.collect():
        print(
            f"ranking metrics {r['event_type']}: auc={r['auc']:.4f} "
            f"ks={r['ks']:.4f} ap={r['ap']:.4f} (n={r['n']})"
        )

    # 3. score drift: first half of event time is the baseline window
    pairs = scored.join(outcomes.select("event_id", "label"), "event_id")
    mid = pairs.agg(F.expr("percentile_approx(score, 0.5)")).first()[0]
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    base = pairs.filter(F.col("ts") <= F.lit(cut))
    cur = pairs.filter(F.col("ts") > F.lit(cut))
    psi = psi_numeric(base, cur, "score", n_buckets=10).first()["psi"]
    print(f"score drift PSI vs first window: {psi:.5f} (median score {mid:.3f})")

    # 3b. volume anomaly alarm: hourly event counts vs their seasonal
    # (hour-of-day) robust baseline from the first window
    hourly = resample(ev, "event_type", "ts", "value", step="1 hour", agg="count")
    alarms = seasonal_anomalies(hourly, "event_type", baseline_until=cut)
    n_scored = alarms.count()
    n_alarm = alarms.filter(F.col("is_anomaly")).count()
    print(f"volume anomalies: {n_alarm}/{n_scored} scored buckets flagged")

    # 4. calibration: raw scores claim s, outcomes deliver s²
    cal = fit_isotonic_calibrator(pairs, "score", "label")
    calibrated = calibrate(pairs, cal, "score")
    b_raw = brier_score(calibrated, "score", "label")
    b_cal = brier_score(calibrated, "calibrated", "label")
    e_raw = expected_calibration_error(calibrated, "score", "label").first()["ece"]
    e_cal = expected_calibration_error(calibrated, "calibrated", "label").first()["ece"]
    print(f"brier raw={b_raw:.5f} calibrated={b_cal:.5f}")
    print(f"ece raw={e_raw:.5f} calibrated={e_cal:.5f}")

    # 4b. overall AUC with its DeLong confidence interval, and a
    # champion/challenger decision: the deployed scorer vs a degraded
    # variant (score half-mixed with hash noise) on the SAME rows
    ci = auc_with_ci(pairs).first()
    print(f"auc={ci['auc']:.4f} ci=[{ci['lo']:.4f}, {ci['hi']:.4f}]")
    noise = (
        md5_bigint(F.col("event_id").cast("string"), "nz:") % 1000
    ) / 1000.0
    both = pairs.withColumn(
        "challenger", (F.col("score") + noise) / 2
    )
    duel = delong_paired_test(both, "score", "challenger").first()
    print(
        f"champion vs challenger: delta={duel['delta']:.4f} "
        f"z={duel['z']:.2f} significant={duel['significant']}"
    )

    # 5. measured operating points vs the reference's hardcoded bands
    sweep = [i / 20 for i in range(1, 20)]
    f1 = best_threshold(pairs, sweep).first()
    cost = best_threshold(
        pairs, sweep, objective="cost", fp_cost=1.0, fn_cost=20.0
    ).first()
    print(
        f"operating point: max-F1 t={f1['threshold']:.2f} "
        f"(f1={f1['f1']:.4f}); min-cost t={cost['threshold']:.2f} "
        f"(fp={cost['fp']}, fn={cost['fn']})"
    )

    # 8. named A/B experiment over the same scored stream (round 10):
    # champion vs challenger as a dimension-table experiment — streamed
    # moment partials, rolled-up analysis identical to the batch block
    from realtime_fraud_detection_spark.ml.experiments import (
        experiments_table,
    )
    from realtime_fraud_detection_spark.streaming.sinks import (
        experiment_partial_writer,
        experiment_rollup_view,
    )

    exps = experiments_table(
        spark,
        [dict(
            test_name="challenger_rollout", control_model="champion",
            treatment_model="challenger", traffic_split=0.5,
            success_metric="prediction_score", min_sample_size=100,
            significance_level=0.05,
        )],
    )
    results = scored.select(
        F.col("event_id").alias("transaction_id"),
        F.col("event_id").alias("user_id"),
        F.lit("champion").alias("model_used"),
        F.col("score").alias("prediction"),
        F.when(F.col("score") >= 0.8, "DECLINE")
        .when(F.col("score") >= 0.6, "REVIEW")
        .otherwise("APPROVE").alias("decision"),
        F.lit(None).cast("boolean").alias("actual_fraud"),
        F.lit(1.0).alias("processing_time_ms"),
    )
    from realtime_fraud_detection_spark.ml.experiments import (
        assign_variants,
        experiment_ranking_eval,
    )

    labeled = results.join(
        outcomes.select(
            F.col("event_id").alias("transaction_id"), "label"
        ),
        "transaction_id",
    ).withColumn("actual_fraud", F.col("label") == 1)
    rank_row = experiment_ranking_eval(
        assign_variants(labeled, exps)
    ).first()
    print(
        f"experiment ranking: control_auc={rank_row['control_auc']:.4f} "
        f"treatment_auc={rank_row['treatment_auc']:.4f} "
        f"lift={rank_row['auc_lift']:.4f} p={rank_row['p_value']:.4f}"
    )

    exp_writer = experiment_partial_writer(work, exps)
    exp_writer(results.filter(F.col("transaction_id") % 2 == 0), 0)
    exp_writer(results.filter(F.col("transaction_id") % 2 == 1), 1)
    row = experiment_rollup_view(spark, work).first()
    print(
        f"experiment {row['test_name']}: control_n={row['control_n']} "
        f"treatment_n={row['treatment_n']} test={row['test_type']} "
        f"p={row['p_value']:.4f} effect={row['effect_size']:.4f}"
    )

    print(f"done in {time.time() - t0:.1f}s")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
