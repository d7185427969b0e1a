"""Named A/B experiment lifecycle (ml/experiments.py): the reference's
statistical arithmetic (ab_testing.py:314-374 — sample stds ddof=1,
pooled std, Cohen's-d effect size, 1.96·SE CI, relative improvement,
|d|>0.2 significance) replayed in NumPy on hand-built results; the
chi-square/t-test selection layer; deterministic sticky assignment;
config validation; lifecycle transitions; per-variant metric blocks;
min-sample gating."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.experiments import (
    active_experiments,
    assign_variants,
    create_experiment,
    experiment_analysis,
    experiments_table,
    export_results,
    stop_experiment,
    variant_metrics,
)

RESULT_SCHEMA = (
    "transaction_id long, user_id long, model_used string, "
    "prediction double, decision string, actual_fraud boolean, "
    "processing_time_ms double"
)


def _cfg(name="exp1", **kw):
    base = dict(
        test_name=name,
        control_model="rf_v1",
        treatment_model="rf_v2",
        traffic_split=0.5,
        success_metric="prediction_score",
        min_sample_size=100,
        significance_level=0.05,
    )
    base.update(kw)
    return base


def _results(spark, n=400, labeled=True):
    """Deterministic synthetic results: prediction from a quadratic
    residue, decision by threshold, labels by a different residue."""
    rows = []
    for i in range(n):
        pred = ((i * i * 37) % 1000) / 1000.0
        decision = (
            "DECLINE" if pred >= 0.8
            else "REVIEW" if pred >= 0.6
            else "APPROVE_WITH_MONITORING" if pred >= 0.4
            else "APPROVE"
        )
        fraud = bool((i * 13) % 5 == 0) if labeled else None
        rows.append((i, i % 97, "rf", pred, decision, fraud, float(5 + i % 20)))
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def _assigned(spark, metric="prediction_score", n=400):
    exps = experiments_table(spark, [_cfg(success_metric=metric)])
    return assign_variants(_results(spark, n), exps, user_col="user_id")


# ---------------------------------------------------------------------------
# Reference arithmetic parity (NumPy replay of ab_testing.py:314-374)
# ---------------------------------------------------------------------------
def test_analysis_matches_reference_arithmetic_continuous(spark):
    tagged = _assigned(spark, "prediction_score")
    got = experiment_analysis(
        tagged, experiments_table(spark, [_cfg()])
    ).collect()[0]

    rows = tagged.select("ab_variant", "prediction").collect()
    control = np.array([r["prediction"] for r in rows if r["ab_variant"] == "control"])
    treatment = np.array([r["prediction"] for r in rows if r["ab_variant"] == "treatment"])
    assert len(control) >= 100 and len(treatment) >= 100

    cmean, tmean = np.mean(control), np.mean(treatment)
    cstd, tstd = np.std(control, ddof=1), np.std(treatment, ddof=1)
    pooled = np.sqrt(
        ((len(control) - 1) * cstd**2 + (len(treatment) - 1) * tstd**2)
        / (len(control) + len(treatment) - 2)
    )
    effect = (tmean - cmean) / pooled
    se = pooled * np.sqrt(1 / len(control) + 1 / len(treatment))
    rel = (tmean - cmean) / cmean * 100

    assert got["control_n"] == len(control)
    assert got["treatment_n"] == len(treatment)
    assert got["control_mean"] == pytest.approx(cmean, abs=1e-9)
    assert got["treatment_mean"] == pytest.approx(tmean, abs=1e-9)
    assert got["control_std"] == pytest.approx(cstd, abs=1e-9)
    assert got["treatment_std"] == pytest.approx(tstd, abs=1e-9)
    assert got["effect_size"] == pytest.approx(effect, abs=1e-9)
    assert got["relative_improvement_percent"] == pytest.approx(rel, abs=1e-9)
    assert got["ci95_low"] == pytest.approx((tmean - cmean) - 1.96 * se, abs=1e-9)
    assert got["ci95_high"] == pytest.approx((tmean - cmean) + 1.96 * se, abs=1e-9)
    assert got["is_significant"] == (abs(effect) > 0.2)
    # continuous metric → t-test; statistic = mean diff / SE
    assert got["test_type"] == "t_test"
    assert got["test_statistic"] == pytest.approx((tmean - cmean) / se, abs=1e-9)
    # p-value: two-sided normal approx, |err| < 1.5e-7 vs math.erfc
    z = abs((tmean - cmean) / se)
    assert got["p_value"] == pytest.approx(math.erfc(z / math.sqrt(2)), abs=2e-7)
    assert got["rejects_null"] == (got["p_value"] < 0.05)


def test_chi_square_selection_for_binary_metric(spark):
    tagged = _assigned(spark, "fraud_detection_rate")
    got = experiment_analysis(
        tagged, experiments_table(spark, [_cfg(success_metric="fraud_detection_rate")])
    ).collect()[0]
    assert got["test_type"] == "chi_square"

    rows = tagged.select("ab_variant", "decision").collect()
    flag = lambda r: 1.0 if r["decision"] in ("DECLINE", "REVIEW") else 0.0  # noqa: E731
    c = np.array([flag(r) for r in rows if r["ab_variant"] == "control"])
    t = np.array([flag(r) for r in rows if r["ab_variant"] == "treatment"])
    p_pool = (c.sum() + t.sum()) / (len(c) + len(t))
    se = math.sqrt(p_pool * (1 - p_pool) * (1 / len(c) + 1 / len(t)))
    z = (t.mean() - c.mean()) / se
    # χ² = z² for the two-proportion test (df=1)
    assert got["test_statistic"] == pytest.approx(z * z, abs=1e-9)
    assert got["p_value"] == pytest.approx(math.erfc(abs(z) / math.sqrt(2)), abs=2e-7)
    # the effect-size block still follows the reference formulas on the
    # 0/1 metric values
    pooled = math.sqrt(
        ((len(c) - 1) * np.std(c, ddof=1) ** 2 + (len(t) - 1) * np.std(t, ddof=1) ** 2)
        / (len(c) + len(t) - 2)
    )
    assert got["effect_size"] == pytest.approx((t.mean() - c.mean()) / pooled, abs=1e-9)


def test_precision_metric_counts_only_flagged_rows(spark):
    tagged = _assigned(spark, "precision")
    got = experiment_analysis(
        tagged, experiments_table(spark, [_cfg(success_metric="precision")])
    ).collect()[0]
    rows = tagged.select("ab_variant", "decision", "actual_fraud").collect()
    per = {"control": [], "treatment": []}
    for r in rows:
        if r["decision"] in ("DECLINE", "REVIEW"):
            per[r["ab_variant"]].append(1.0 if r["actual_fraud"] else 0.0)
    assert got["control_n"] == len(per["control"])
    assert got["treatment_n"] == len(per["treatment"])
    # the 100-sample gate counts per-arm RESULT rows (ab_testing.py:222),
    # not metric samples — with 400 results both arms clear it, so the
    # block is analyzed even if fewer than 100 rows carry a metric value
    byv = {"control": 0, "treatment": 0}
    for r in rows:
        byv[r["ab_variant"]] += 1
    assert got["control_rows"] == byv["control"] >= 100
    assert got["treatment_rows"] == byv["treatment"] >= 100
    assert got["control_mean"] == pytest.approx(np.mean(per["control"]), abs=1e-9)


# ---------------------------------------------------------------------------
# Assignment: deterministic, sticky, split-accurate, active-only
# ---------------------------------------------------------------------------
def test_assignment_deterministic_and_split(spark):
    exps = experiments_table(
        spark, [_cfg("a", traffic_split=0.3), _cfg("b", traffic_split=0.7)]
    )
    res = _results(spark, 300)
    t1 = assign_variants(res, exps).select("test_name", "user_id", "ab_variant")
    t2 = assign_variants(res, exps).select("test_name", "user_id", "ab_variant")
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))
    # sticky: one variant per (experiment, user)
    per_user = (
        t1.groupBy("test_name", "user_id")
        .agg(F.countDistinct("ab_variant").alias("k"))
        .agg(F.max("k"))
        .collect()[0][0]
    )
    assert per_user == 1
    # split lands near the configured fraction (md5 uniformity over 97 users)
    shares = {
        r["test_name"]: r["share"]
        for r in t1.groupBy("test_name")
        .agg(F.avg((F.col("ab_variant") == "treatment").cast("int")).alias("share"))
        .collect()
    }
    assert abs(shares["a"] - 0.3) < 0.15
    assert abs(shares["b"] - 0.7) < 0.15
    # every event gets every active experiment
    assert t1.count() == 300 * 2


def test_lifecycle_create_stop_active(spark):
    exps = experiments_table(spark, [_cfg("a")])
    exps = create_experiment(exps, _cfg("b", traffic_split=0.2))
    with pytest.raises(ValueError, match="already exists"):
        create_experiment(exps, _cfg("a"))
    stopped = stop_experiment(exps, "a")
    assert {r["test_name"] for r in active_experiments(stopped).collect()} == {"b"}
    # stopped experiments no longer assign; the row survives for audit
    tagged = assign_variants(_results(spark, 50), stopped)
    assert tagged.select("test_name").distinct().collect()[0]["test_name"] == "b"
    assert stopped.filter(F.col("test_name") == "a").count() == 1


def test_config_validation_bounds(spark):
    with pytest.raises(ValueError, match="traffic_split"):
        experiments_table(spark, [_cfg(traffic_split=1.5)])
    with pytest.raises(ValueError, match="min_sample_size"):
        experiments_table(spark, [_cfg(min_sample_size=10)])
    with pytest.raises(ValueError, match="significance_level"):
        experiments_table(spark, [_cfg(significance_level=0.2)])
    with pytest.raises(ValueError, match="success_metric"):
        experiments_table(spark, [_cfg(success_metric="vibes")])
    with pytest.raises(ValueError, match="duplicate"):
        experiments_table(spark, [_cfg("x"), _cfg("x")])


def test_min_sample_gating_nulls_analysis(spark):
    tagged = _assigned(spark, n=60)  # ~30 per arm, below the 100 floor
    got = experiment_analysis(
        tagged, experiments_table(spark, [_cfg()])
    ).collect()[0]
    assert got["control_mean"] is None
    assert got["effect_size"] is None
    assert got["p_value"] is None
    assert got["is_significant"] is None
    assert got["meets_min_samples"] is False
    # counts still reported so the caller can see progress
    assert got["control_n"] + got["treatment_n"] == 60


# ---------------------------------------------------------------------------
# Per-variant metric block (ab_testing.py:248-312) on a hand-built case
# ---------------------------------------------------------------------------
def test_variant_metrics_hand_computed(spark):
    rows = [
        # (txid, user, model, prediction, decision, fraud, ms, variant)
        (1, 1, "m", 0.9, "DECLINE", True, 10.0, "treatment"),
        (2, 2, "m", 0.7, "REVIEW", False, 20.0, "treatment"),
        (3, 3, "m", 0.2, "APPROVE", False, 30.0, "treatment"),
        (4, 4, "m", 0.5, "APPROVE_WITH_MONITORING", True, 40.0, "treatment"),
        (5, 5, "m", 0.1, "APPROVE", None, 50.0, "control"),
        (6, 6, "m", 0.95, "DECLINE", True, 60.0, "control"),
    ]
    df = spark.createDataFrame(
        rows, RESULT_SCHEMA + ", ab_variant string"
    ).withColumn("test_name", F.lit("exp1"))
    got = {r["ab_variant"]: r for r in variant_metrics(df).collect()}

    t = got["treatment"]
    assert t["n"] == 4
    assert t["fraud_detection_rate"] == pytest.approx(0.5)
    assert t["avg_processing_time_ms"] == pytest.approx(25.0)
    assert t["avg_prediction_score"] == pytest.approx((0.9 + 0.7 + 0.2 + 0.5) / 4)
    assert t["decline_rate"] == pytest.approx(0.25)
    assert t["review_rate"] == pytest.approx(0.25)
    assert t["approve_rate"] == pytest.approx(0.25)
    assert t["approve_with_monitoring_rate"] == pytest.approx(0.25)
    # labeled: tp=1 (txid1), fp=1 (txid2), tn=1 (txid3), fn=1 (txid4)
    assert t["labeled_samples"] == 4
    assert t["precision"] == pytest.approx(0.5)
    assert t["recall"] == pytest.approx(0.5)
    assert t["f1_score"] == pytest.approx(0.5)
    assert t["accuracy"] == pytest.approx(0.5)

    c = got["control"]
    assert c["n"] == 2
    assert c["labeled_samples"] == 1
    assert c["precision"] == pytest.approx(1.0)
    assert c["accuracy"] == pytest.approx(1.0)


def test_export_results_projection(spark):
    tagged = _assigned(spark, n=40)
    out = export_results(tagged, "exp1")
    assert out.count() == 40
    assert set(out.columns) == {
        "test_name", "transaction_id", "ab_variant", "model_used",
        "prediction", "decision", "actual_fraud", "processing_time_ms",
    }


def test_analysis_matches_duckdb_twin_cross_engine(spark):
    """Cross-engine twin of the WHOLE pipeline — md5 variant assignment,
    metric extraction, decimal moments, and the staged statistical
    arithmetic — simulated independently in DuckDB SQL with the same
    float association order. Every column except p_value must match
    BIT-exactly (decimal sums + IEEE /,*,sqrt are correctly rounded on
    both engines); p_value goes through exp(), which is not guaranteed
    correctly rounded, so it gets a 5e-7 band (the erfc approximation's
    own error is 1.5e-7)."""
    import math

    import duckdb

    from realtime_fraud_detection_spark.functions.hashing import (
        md5_bigint_sql,
    )

    exps = experiments_table(
        spark,
        [
            _cfg("rate", traffic_split=0.5,
                 success_metric="fraud_detection_rate"),
            _cfg("score", traffic_split=0.25,
                 success_metric="prediction_score"),
        ],
    )
    results = _results(spark, 500)
    got = {
        r["test_name"]: r
        for r in experiment_analysis(
            assign_variants(results, exps), exps
        ).collect()
    }

    con = duckdb.connect()
    con.register("results", results.toPandas())
    con.register("exps", exps.toPandas())
    coin = md5_bigint_sql(
        "(e.test_name || '_' || CAST(r.user_id AS VARCHAR))", salt="ab:"
    )
    sql = f"""
WITH tagged AS (
  SELECT r.*, e.test_name, e.success_metric,
         CASE WHEN ({coin} % 100)
                   < CAST(trunc(e.traffic_split * 100) AS INT)
              THEN 'treatment' ELSE 'control' END AS ab_variant
  FROM results r CROSS JOIN exps e WHERE e.status = 'active'
), vals AS (
  SELECT test_name, success_metric, ab_variant,
         CASE
           WHEN success_metric = 'fraud_detection_rate'
             THEN CASE WHEN decision IN ('DECLINE','REVIEW')
                       THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
           WHEN success_metric = 'prediction_score'
             THEN CAST(prediction AS DOUBLE)
         END AS v
  FROM tagged
), m AS (
  SELECT test_name, success_metric, ab_variant,
         COUNT(v) AS n,
         SUM(CAST(v AS DECIMAL(28,10))) AS s1,
         SUM(CAST(v * v AS DECIMAL(38,10))) AS s2
  FROM vals GROUP BY 1, 2, 3
), wide AS (
  SELECT test_name, success_metric,
         MAX(CASE WHEN ab_variant = 'control' THEN n END) AS cn_i,
         MAX(CASE WHEN ab_variant = 'treatment' THEN n END) AS tn_i,
         CAST(MAX(CASE WHEN ab_variant = 'control' THEN s1 END) AS DOUBLE) AS cs1,
         CAST(MAX(CASE WHEN ab_variant = 'treatment' THEN s1 END) AS DOUBLE) AS ts1,
         CAST(MAX(CASE WHEN ab_variant = 'control' THEN s2 END) AS DOUBLE) AS cs2,
         CAST(MAX(CASE WHEN ab_variant = 'treatment' THEN s2 END) AS DOUBLE) AS ts2
  FROM m GROUP BY 1, 2
), s1_ AS (
  SELECT *, CAST(cn_i AS DOUBLE) AS cn, CAST(tn_i AS DOUBLE) AS tn,
         cs1 / CAST(cn_i AS DOUBLE) AS cmean,
         ts1 / CAST(tn_i AS DOUBLE) AS tmean,
         (cs2 - cs1 * cs1 / CAST(cn_i AS DOUBLE)) / (CAST(cn_i AS DOUBLE) - 1) AS cvar,
         (ts2 - ts1 * ts1 / CAST(tn_i AS DOUBLE)) / (CAST(tn_i AS DOUBLE) - 1) AS tvar,
         (cs1 + ts1) / (CAST(cn_i AS DOUBLE) + CAST(tn_i AS DOUBLE)) AS poolp
  FROM wide
), s2_ AS (
  SELECT *, SQRT(GREATEST(((cn - 1) * cvar + (tn - 1) * tvar) / (cn + tn - 2),
                          CAST(0 AS DOUBLE))) AS pooled,
         SQRT(poolp * (1 - poolp) * (CAST(1 AS DOUBLE) / cn + CAST(1 AS DOUBLE) / tn)) AS seprop,
         tmean - cmean AS diff
  FROM s1_
), s3_ AS (
  SELECT *, pooled * SQRT(CAST(1 AS DOUBLE) / cn + CAST(1 AS DOUBLE) / tn) AS se,
         CASE WHEN pooled > 0 THEN diff / pooled ELSE CAST(0 AS DOUBLE) END AS effect,
         CASE WHEN seprop > 0 THEN diff / seprop ELSE CAST(0 AS DOUBLE) END AS zprop
  FROM s2_
), s4_ AS (
  SELECT *, CASE WHEN se > 0 THEN diff / se ELSE CAST(0 AS DOUBLE) END AS tstat
  FROM s3_
), s5_ AS (
  SELECT *, ABS(CASE WHEN success_metric IN ('fraud_detection_rate','precision')
                     THEN zprop ELSE tstat END) AS absstat
  FROM s4_
)
SELECT test_name, cn_i AS control_n, tn_i AS treatment_n,
       cmean AS control_mean, tmean AS treatment_mean,
       SQRT(GREATEST(cvar, CAST(0 AS DOUBLE))) AS control_std,
       SQRT(GREATEST(tvar, CAST(0 AS DOUBLE))) AS treatment_std,
       effect AS effect_size,
       diff - CAST(1.96 AS DOUBLE) * se AS ci95_low,
       diff + CAST(1.96 AS DOUBLE) * se AS ci95_high,
       CASE WHEN success_metric IN ('fraud_detection_rate','precision')
            THEN zprop * zprop ELSE tstat END AS test_statistic,
       (CAST(0.254829592 AS DOUBLE) * (CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(0.3275911 AS DOUBLE) * (absstat / CAST(1.4142135623730951 AS DOUBLE))))) AS _t1,
       absstat
FROM s5_
"""
    want = {t[0]: t for t in con.execute(sql).fetchall()}
    cols = [
        "control_n", "treatment_n", "control_mean", "treatment_mean",
        "control_std", "treatment_std", "effect_size", "ci95_low",
        "ci95_high", "test_statistic",
    ]
    for name, g in got.items():
        w = dict(zip(["test_name"] + cols + ["_t1", "absstat"], want[name]))
        for c in cols:
            assert g[c] == w[c], (name, c, g[c], w[c])  # bit-exact
        # p_value through exp(): replay the polynomial in Python on the
        # BIT-EXACT absstat DuckDB computed, allow only exp()'s ulp band
        xx = w["absstat"] / float(2**0.5)
        t = 1.0 / (1.0 + 0.3275911 * xx)
        poly = (
            0.254829592 * t
            - 0.284496736 * t * t
            + 1.421413741 * t * t * t
            - 1.453152027 * t * t * t * t
            + 1.061405429 * t * t * t * t * t
        )
        want_p = poly * math.exp(-xx * xx)
        assert g["p_value"] == pytest.approx(want_p, abs=5e-7), name


# ---------------------------------------------------------------------------
# Per-arm ranking eval (unpaired DeLong AUC z-test)
# ---------------------------------------------------------------------------
def test_ranking_eval_matches_per_arm_auc_and_replay(spark):
    from realtime_fraud_detection_spark.ml.evaluation import auc_with_ci
    from realtime_fraud_detection_spark.ml.experiments import (
        experiment_ranking_eval,
    )

    tagged = _assigned(spark, "prediction_score")
    got = experiment_ranking_eval(tagged).collect()[0]
    per = {
        r["ab_variant"]: r
        for r in auc_with_ci(
            tagged.withColumn("_lbl", F.col("actual_fraud").cast("int")),
            "prediction",
            "_lbl",
            by=["ab_variant"],
        ).collect()
    }
    assert got["control_auc"] == per["control"]["auc"]
    assert got["treatment_auc"] == per["treatment"]["auc"]
    assert got["control_se"] == per["control"]["se"]
    # unpaired z replay
    lift = per["treatment"]["auc"] - per["control"]["auc"]
    se = math.sqrt(per["control"]["se"] ** 2 + per["treatment"]["se"] ** 2)
    assert got["auc_lift"] == pytest.approx(lift, abs=1e-12)
    assert got["z_score"] == pytest.approx(lift / se, abs=1e-9)
    assert got["p_value"] == pytest.approx(
        math.erfc(abs(lift / se) / math.sqrt(2)), abs=2e-7
    )
    assert got["rejects_null"] == (got["p_value"] < 0.05)


def test_ranking_eval_detects_a_better_challenger(spark):
    """Treatment scores correlate with the label, control scores are
    hash noise — the AUC z-test must reject the null; when both arms
    score with the SAME noise, it must not."""
    from realtime_fraud_detection_spark.ml.experiments import (
        experiment_ranking_eval,
    )

    rows = []
    for i in range(2000):
        label = (i * 13) % 4 == 0
        noise = ((i * i * 57) % 1000) / 1000.0
        good = 0.7 * (1.0 if label else 0.0) + 0.3 * noise
        rows.append((i, i, "m", good, noise, label))
    df = spark.createDataFrame(
        rows,
        "transaction_id long, user_id long, model_used string, "
        "good double, noise double, actual_fraud boolean",
    )
    exps = experiments_table(spark, [_cfg("rank")])
    tagged = assign_variants(df, exps).withColumn(
        "prediction",
        F.when(F.col("ab_variant") == "treatment", F.col("good")).otherwise(
            F.col("noise")
        ),
    )
    strong = experiment_ranking_eval(tagged).collect()[0]
    assert strong["auc_lift"] > 0.3
    assert strong["rejects_null"] is True

    null_tagged = tagged.withColumn("prediction", F.col("noise"))
    null = experiment_ranking_eval(null_tagged).collect()[0]
    assert abs(null["auc_lift"]) < 0.1
    assert null["rejects_null"] is False


def test_assign_variants_refuses_dimension_column_clash(spark):
    exps = experiments_table(spark, [_cfg()])
    poisoned = _results(spark, 20).withColumn(
        "traffic_split", F.lit(0.9)
    )
    with pytest.raises(ValueError, match="collide"):
        assign_variants(poisoned, exps)
