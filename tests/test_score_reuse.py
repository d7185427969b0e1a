"""Prediction-cache equivalence (ml/ensemble.score_distinct): the
reference's repeat-feature-vector cache (ensemble_predictor.py:437-471)
as within-batch distinct-score-join — the model runs once per distinct
vector, results are identical to direct scoring, and NULL features are
cache keys rather than dropped rows."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from realtime_fraud_detection_spark.ml.ensemble import score_distinct


def _repeat_heavy(spark):
    # 1200 rows, 40 distinct (amount, risk) vectors, incl. a NULL vector
    base = spark.range(0, 1200).select(
        F.col("id").alias("tx_id"),
        F.when(F.col("id") % 40 == 39, None)
        .otherwise((F.col("id") % 40).cast("double"))
        .alias("amount"),
        ((F.col("id") % 40) * 2).cast("double").alias("risk"),
    )
    return base


def test_model_runs_once_per_distinct_vector(spark):
    acc = spark.sparkContext.accumulator(0)

    def scorer(feats):
        @F.pandas_udf("double")
        def s(a: pd.Series, r: pd.Series) -> pd.Series:
            acc.add(len(a))
            return a.fillna(-1.0) * 2 + r
        return feats.withColumn("score", s("amount", "risk"))

    out = score_distinct(_repeat_heavy(spark), ["amount", "risk"], scorer)
    rows = out.collect()
    assert len(rows) == 1200
    # the model saw each distinct vector exactly once, not 1200 rows
    assert acc.value == 40


def test_results_match_direct_scoring_including_nulls(spark):
    def scorer(feats):
        return feats.withColumn(
            "score", F.coalesce(F.col("amount"), F.lit(-1.0)) * 2 + F.col("risk")
        )

    df = _repeat_heavy(spark)
    via_cache = {r["tx_id"]: r["score"] for r in score_distinct(df, ["amount", "risk"], scorer).collect()}
    direct = {r["tx_id"]: r["score"] for r in scorer(df).collect()}
    assert via_cache == direct  # bit-identical, and no NULL-keyed row lost


def test_multiple_score_columns_and_column_order(spark):
    def scorer(feats):
        return feats.withColumn("s1", F.col("risk") + 1).withColumn(
            "s2", F.lit("ok")
        )

    out = score_distinct(_repeat_heavy(spark), ["amount", "risk"], scorer)
    assert out.columns == ["tx_id", "amount", "risk", "s1", "s2"]
    assert out.filter(F.col("s2") != "ok").count() == 0
