"""M10 — named A/B experiment lifecycle as a dimension table.

The reference manages named experiments in a driver-process registry
(`ab_testing.py:69-427`: create/validate/stop, per-user sticky variant
assignment, per-variant metric blocks, and a pooled-effect-size
significance analysis gated on a minimum per-arm sample). A
process-local dict does not survive a cluster, so the Spark-first
re-expression makes the registry a small DIMENSION TABLE — experiments
are rows, lifecycle transitions are dimension updates, and assignment /
analysis are joins against it:

* the experiments table broadcasts (a handful of rows) — tagging a
  100 TB result stream with variants is one broadcast hash join, no
  shuffle on the fact side;
* variant assignment is the reference's ``hash(test_name + '_' +
  user) % 100 < split*100`` rule with the process-seeded ``hash()``
  replaced by md5 (functions/hashing.md5_bigint) so assignment is a
  pure function of (experiment, user) on every executor, every run —
  the determinism the reference only gets within one process from its
  assignment cache;
* per-variant metrics and the statistical analysis are one grouped
  aggregation over (test_name, ab_variant) from EXACT decimal sums
  (means/stds are derived from sum and sum-of-squares, so results are
  partitioning-independent), then a two-column pivot;
* the reference's analysis arithmetic is reproduced exactly
  (ab_testing.py:314-374): sample stds (ddof=1), pooled std, Cohen's-d
  effect size, 1.96·SE confidence interval, relative improvement, and
  ``is_significant = |effect_size| > 0.2`` — pinned against a NumPy
  replay in tests/test_experiments.py; on top of it, the test-selection
  layer the reference leaves implicit: binary success metrics
  (proportions) get a two-proportion chi-square test (χ² = z², df 1),
  continuous ones a t-statistic, both with normal-approximation
  p-values via the same erfc rational approximation as
  ml/ensemble.ab_metrics.

Lifecycle parity: create validates the reference's bounds
(traffic_split ∈ [0,1], min_sample_size ≥ 100, significance_level ∈
[0.01, 0.1]) and refuses duplicate names; stop flips status (the row
stays — an audit trail the reference's ``del`` loses); only ACTIVE
experiments assign variants; the analysis block is emitted only when
both arms have ≥ 100 samples (the reference's hard floor), with a
separate per-experiment ``meets_min_samples`` flag for the configured
minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint

EXPERIMENT_SCHEMA = (
    "test_name string, control_model string, treatment_model string, "
    "traffic_split double, success_metric string, min_sample_size int, "
    "significance_level double, status string, "
    "start_time string, end_time string"
)

# success metrics that are 0/1 proportions → chi-square; the rest are
# continuous → t-test (ab_testing.py:375-394's extraction families)
_BINARY_METRICS = {"fraud_detection_rate", "precision"}
_METRICS = _BINARY_METRICS | {"processing_time", "prediction_score"}
_FLAGGED = ("DECLINE", "REVIEW")
_CLEARED = ("APPROVE", "APPROVE_WITH_MONITORING")


def _validate(cfg: dict) -> None:
    """The reference's config bounds (ab_testing.py:229-247)."""
    if not (0.0 <= cfg["traffic_split"] <= 1.0):
        raise ValueError("traffic_split must be between 0.0 and 1.0")
    if cfg.get("min_sample_size", 1000) < 100:
        raise ValueError("min_sample_size must be at least 100")
    if not (0.01 <= cfg.get("significance_level", 0.05) <= 0.1):
        raise ValueError("significance_level must be between 0.01 and 0.1")
    if cfg.get("success_metric", "fraud_detection_rate") not in _METRICS:
        raise ValueError(f"unknown success_metric: {cfg['success_metric']}")


def _row(cfg: dict) -> tuple:
    return (
        cfg["test_name"],
        cfg["control_model"],
        cfg["treatment_model"],
        float(cfg["traffic_split"]),
        cfg.get("success_metric", "fraud_detection_rate"),
        int(cfg.get("min_sample_size", 1000)),
        float(cfg.get("significance_level", 0.05)),
        "active",
        cfg.get("start_time", ""),
        cfg.get("end_time", ""),
    )


def experiments_table(spark: SparkSession, configs: list[dict]) -> DataFrame:
    """Build the experiments dimension from config dicts, validated with
    the reference's bounds; duplicate names refuse (create_test's
    conflict check)."""
    names = [c["test_name"] for c in configs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate experiment names: {names}")
    for c in configs:
        _validate(c)
    return spark.createDataFrame([_row(c) for c in configs], EXPERIMENT_SCHEMA)


def create_experiment(experiments: DataFrame, cfg: dict) -> DataFrame:
    """Lifecycle: add one validated experiment; refuses an existing name
    (active OR stopped — stopped rows are the audit trail, and reusing a
    name would corrupt sticky assignments)."""
    _validate(cfg)
    spark = experiments.sparkSession
    if experiments.filter(F.col("test_name") == cfg["test_name"]).count() > 0:
        raise ValueError(f"experiment {cfg['test_name']!r} already exists")
    new = spark.createDataFrame([_row(cfg)], EXPERIMENT_SCHEMA)
    return experiments.unionByName(new)


def stop_experiment(experiments: DataFrame, test_name: str) -> DataFrame:
    """Lifecycle: flip status to 'stopped' (the row stays for audit; the
    reference deletes it)."""
    return experiments.withColumn(
        "status",
        F.when(F.col("test_name") == test_name, F.lit("stopped")).otherwise(
            F.col("status")
        ),
    )


def active_experiments(experiments: DataFrame) -> DataFrame:
    return experiments.filter(F.col("status") == "active")


def assign_variants(
    df: DataFrame, experiments: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """One row per (input row, ACTIVE experiment) with `ab_variant`
    attached — the reference's sticky hash split
    (``hash(f"{test_name}_{user}") % 100 < split*100`` →
    ab_testing.py:119-133) with md5 replacing the process-seeded
    ``hash()`` so assignment is deterministic everywhere. The experiments
    side broadcasts; the fact side never shuffles."""
    carried = [
        "test_name", "traffic_split", "success_metric", "min_sample_size",
        "significance_level",
    ]
    clash = [c for c in carried if c in set(df.columns)]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the experiment-dimension "
            "columns the cross join carries — rename them first"
        )
    exp = F.broadcast(active_experiments(experiments).select(*carried))
    bucket = F.pmod(
        md5_bigint(
            F.concat_ws("_", F.col("test_name"), F.col(user_col).cast("string")),
            salt="ab:",
        ),
        F.lit(100),
    )
    return df.crossJoin(exp).withColumn(
        "ab_variant",
        F.when(
            bucket < (F.col("traffic_split") * 100).cast("int"), "treatment"
        ).otherwise("control"),
    )


def _metric_value() -> F.Column:
    """The per-row value of each experiment's success metric
    (ab_testing.py:375-394): binary detection flag, processing time,
    prediction score, or precision-over-flagged (NULL rows drop out of
    the aggregate, matching the reference's filtered list)."""
    flagged = F.col("decision").isin(*_FLAGGED)
    return (
        F.when(F.col("success_metric") == "fraud_detection_rate",
               flagged.cast("double"))
        .when(F.col("success_metric") == "processing_time",
              F.col("processing_time_ms").cast("double"))
        .when(F.col("success_metric") == "prediction_score",
              F.col("prediction").cast("double"))
        .when(
            (F.col("success_metric") == "precision") & flagged,
            F.col("actual_fraud").cast("int").cast("double"),
        )
    )


def variant_metrics(results: DataFrame) -> DataFrame:
    """Per-(experiment, variant) metric block (ab_testing.py:248-312):
    n, fraud detection rate, mean processing time / prediction score,
    the four decision rates, and — where actual_fraud labels exist —
    precision/recall/f1/accuracy over the labeled subset. One grouped
    aggregation from exact decimal sums."""
    flagged = F.col("decision").isin(*_FLAGGED)
    cleared = F.col("decision").isin(*_CLEARED)
    labeled = F.col("actual_fraud").isNotNull()
    dec = lambda c: F.sum(c.cast("decimal(28,10)"))  # noqa: E731
    agg = results.groupBy("test_name", "ab_variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(flagged.cast("int")).alias("_flagged"),
        dec(F.col("processing_time_ms")).alias("_pt"),
        dec(F.col("prediction")).alias("_pred"),
        *[
            F.sum((F.col("decision") == d).cast("int")).alias(f"_d_{d.lower()}")
            for d in (*_CLEARED, *_FLAGGED)
        ],
        F.sum(labeled.cast("int")).alias("labeled_samples"),
        F.sum((labeled & flagged & F.col("actual_fraud")).cast("int")).alias("_tp"),
        F.sum((labeled & flagged & ~F.col("actual_fraud")).cast("int")).alias("_fp"),
        F.sum((labeled & cleared & ~F.col("actual_fraud")).cast("int")).alias("_tn"),
        F.sum((labeled & cleared & F.col("actual_fraud")).cast("int")).alias("_fn"),
    )
    n = F.col("n").cast("double")
    precision = F.when(
        F.col("_tp") + F.col("_fp") > 0,
        F.col("_tp") / (F.col("_tp") + F.col("_fp")),
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("_tp") + F.col("_fn") > 0,
        F.col("_tp") / (F.col("_tp") + F.col("_fn")),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        precision + recall > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    out = agg.select(
        "test_name",
        "ab_variant",
        "n",
        (F.col("_flagged") / n).alias("fraud_detection_rate"),
        (F.col("_pt").cast("double") / n).alias("avg_processing_time_ms"),
        (F.col("_pred").cast("double") / n).alias("avg_prediction_score"),
        *[
            (F.col(f"_d_{d.lower()}") / n).alias(f"{d.lower()}_rate")
            for d in (*_CLEARED, *_FLAGGED)
        ],
        "labeled_samples",
        F.when(F.col("labeled_samples") > 0, precision).alias("precision"),
        F.when(F.col("labeled_samples") > 0, recall).alias("recall"),
        F.when(F.col("labeled_samples") > 0, f1).alias("f1_score"),
        F.when(
            F.col("labeled_samples") > 0,
            (F.col("_tp") + F.col("_tn")) / F.col("labeled_samples"),
        ).alias("accuracy"),
    )
    return out


def _erfc_half(x: F.Column) -> F.Column:
    """Two-sided normal p-value from |z|: erfc(|z|/sqrt(2)) via the
    Abramowitz–Stegun 7.1.26 rational approximation (|err| < 1.5e-7) —
    same form as ml/ensemble.ab_metrics. Callers must pass a bound
    COLUMN (not a deep expression tree): the t⁵ polynomial references its
    argument 16 times, and Catalyst re-inlines unbound subtrees per
    reference (the 64 KB-codegen blow-up class — see
    experiment_analysis's staged selects)."""
    xx = x / float(2**0.5)
    t = 1.0 / (1.0 + 0.3275911 * xx)
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    return poly * F.exp(-xx * xx)


def experiment_analysis(results: DataFrame, experiments: DataFrame) -> DataFrame:
    """One row per experiment: the reference's statistical block
    (ab_testing.py:314-374) — control/treatment means, sample stds
    (ddof=1), pooled std, Cohen's-d effect size, 95% CI on the mean
    difference, relative improvement %, ``is_significant`` =
    |effect_size| > 0.2 — emitted only when both arms have ≥ 100
    metric samples (the reference's floor), plus the explicit
    test-selection layer: χ² (= z², two-proportion) for binary success
    metrics, t statistic for continuous ones, normal-approx p_value,
    ``rejects_null`` = p_value < significance_level, and
    ``meets_min_samples`` for the configured per-experiment minimum.

    `results` must carry (test_name, ab_variant, success_metric,
    min_sample_size, significance_level) — i.e. be the output of
    :func:`assign_variants` with decision/prediction columns attached.
    Means and stds derive from exact decimal sum / sum-of-squares, so
    the analysis is partitioning-independent."""
    return analysis_from_moments(experiment_moments(results))


def experiment_moments(results: DataFrame) -> DataFrame:
    """The grouped moment table behind :func:`experiment_analysis`:
    (test_name, success_metric, min_sample_size, significance_level,
    ab_variant) → (n, _s1, _s2) with EXACT decimal sums, plus every
    COUNT the reference's per-variant metric block needs (rows, decision
    counts, processing/prediction sums, labeled confusion cells —
    ab_testing.py:248-312), all integers/decimals so the table merges
    losslessly. streaming/sinks.experiment_partial_writer stores these
    per batch; the rollup reproduces BOTH the statistical analysis and
    variant_metrics bit-exactly over the whole stream."""
    val = _metric_value()
    flagged = F.col("decision").isin(*_FLAGGED)
    cleared = F.col("decision").isin(*_CLEARED)
    labeled = F.col("actual_fraud").isNotNull()
    dec = lambda c: F.sum(c.cast("decimal(28,10)"))  # noqa: E731
    tagged = results.withColumn("_v", val)
    return tagged.groupBy(
        "test_name", "success_metric", "min_sample_size",
        "significance_level", "ab_variant",
    ).agg(
        F.count("_v").alias("n"),
        F.sum(F.col("_v").cast("decimal(28,10)")).alias("_s1"),
        F.sum((F.col("_v") * F.col("_v")).cast("decimal(38,10)")).alias("_s2"),
        F.count(F.lit(1)).alias("rows"),
        F.sum(flagged.cast("long")).alias("flagged"),
        dec(F.col("processing_time_ms")).alias("pt_sum"),
        dec(F.col("prediction")).alias("pred_sum"),
        *[
            F.sum((F.col("decision") == d).cast("long")).alias(f"d_{d.lower()}")
            for d in (*_CLEARED, *_FLAGGED)
        ],
        F.sum(labeled.cast("long")).alias("labeled"),
        F.sum((labeled & flagged & F.col("actual_fraud")).cast("long")).alias("tp"),
        F.sum((labeled & flagged & ~F.col("actual_fraud")).cast("long")).alias("fp"),
        F.sum((labeled & cleared & ~F.col("actual_fraud")).cast("long")).alias("tn"),
        F.sum((labeled & cleared & F.col("actual_fraud")).cast("long")).alias("fn"),
    )


# every experiment_moments column that merges by plain summation (the
# grouped keys carry through; used by the streaming rollup)
MOMENT_SUM_COLS = [
    "n", "_s1", "_s2", "rows", "flagged", "pt_sum", "pred_sum",
    "d_approve", "d_approve_with_monitoring", "d_review", "d_decline",
    "labeled", "tp", "fp", "tn", "fn",
]


def metrics_from_moments(moments: DataFrame) -> DataFrame:
    """The reference's per-variant metric block (ab_testing.py:248-312)
    derived from the (merged) moment table — same columns and arithmetic
    as :func:`variant_metrics`, but computable from stored partials
    without the raw results."""
    n = F.col("rows").cast("double")
    precision = F.when(
        F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        precision + recall > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return moments.select(
        "test_name",
        "ab_variant",
        F.col("rows").alias("n"),
        (F.col("flagged") / n).alias("fraud_detection_rate"),
        (F.col("pt_sum").cast("double") / n).alias("avg_processing_time_ms"),
        (F.col("pred_sum").cast("double") / n).alias("avg_prediction_score"),
        *[
            (F.col(f"d_{d.lower()}") / n).alias(f"{d.lower()}_rate")
            for d in (*_CLEARED, *_FLAGGED)
        ],
        F.col("labeled").alias("labeled_samples"),
        F.when(F.col("labeled") > 0, precision).alias("precision"),
        F.when(F.col("labeled") > 0, recall).alias("recall"),
        F.when(F.col("labeled") > 0, f1).alias("f1_score"),
        F.when(
            F.col("labeled") > 0,
            (F.col("tp") + F.col("tn")) / F.col("labeled"),
        ).alias("accuracy"),
    )


def analysis_from_moments(agg: DataFrame) -> DataFrame:
    """The statistical block from an (already grouped or rolled-up)
    moment table — see :func:`experiment_analysis` for the columns.

    Gating matches the reference exactly (ab_testing.py:222 then :325-326):
    the 100-sample floor counts per-arm RESULT rows (`rows`), not metric
    samples — for success_metric='precision' only flagged rows carry a
    value, and the reference still analyzes once each arm has 100
    results; a second guard nulls the block when an arm has ZERO metric
    values (the reference's 'Insufficient data' error branch)."""
    wide = (
        agg.groupBy(
            "test_name", "success_metric", "min_sample_size",
            "significance_level",
        )
        .pivot("ab_variant", ["control", "treatment"])
        .agg(
            F.first("n").alias("n"),
            F.first("_s1").alias("s1"),
            F.first("_s2").alias("s2"),
            F.first("rows").alias("rows"),
        )
    )
    # Staged selects: every derived statistic is bound as a COLUMN before
    # the next stage references it. Inlining them as Python-variable
    # expression trees duplicates the whole subtree per reference (the
    # erfc polynomial alone references its argument 16 times) — measured
    # here as a >64 KB generated method, i.e. codegen fallback. Each
    # alias below is referenced ≥2 times downstream, which stops
    # CollapseProject from re-inlining it.
    cn = F.col("control_n").cast("double")
    tn = F.col("treatment_n").cast("double")
    s1 = wide.select(
        "*",
        (F.col("control_s1").cast("double") / cn).alias("_cmean"),
        (F.col("treatment_s1").cast("double") / tn).alias("_tmean"),
        # sample variance (ddof=1) from exact sums: (s2 - s1²/n) / (n-1)
        (
            (
                F.col("control_s2").cast("double")
                - F.col("control_s1").cast("double")
                * F.col("control_s1").cast("double") / cn
            )
            / (cn - 1)
        ).alias("_cvar"),
        (
            (
                F.col("treatment_s2").cast("double")
                - F.col("treatment_s1").cast("double")
                * F.col("treatment_s1").cast("double") / tn
            )
            / (tn - 1)
        ).alias("_tvar"),
        (
            (F.col("control_s1").cast("double") + F.col("treatment_s1").cast("double"))
            / (cn + tn)
        ).alias("_poolp"),
        F.col("success_metric").isin(*sorted(_BINARY_METRICS)).alias("_binary"),
    )
    s2 = s1.select(
        "*",
        F.sqrt(
            F.greatest(
                ((cn - 1) * F.col("_cvar") + (tn - 1) * F.col("_tvar"))
                / (cn + tn - 2),
                F.lit(0.0),
            )
        ).alias("_pooled"),
        F.sqrt(
            F.col("_poolp") * (1 - F.col("_poolp")) * (1.0 / cn + 1.0 / tn)
        ).alias("_seprop"),
        (F.col("_tmean") - F.col("_cmean")).alias("_diff"),
    )
    s3 = s2.select(
        "*",
        (F.col("_pooled") * F.sqrt(1.0 / cn + 1.0 / tn)).alias("_se"),
        F.when(
            F.col("_pooled") > 0, F.col("_diff") / F.col("_pooled")
        ).otherwise(F.lit(0.0)).alias("_effect"),
        F.when(
            F.col("_seprop") > 0, F.col("_diff") / F.col("_seprop")
        ).otherwise(F.lit(0.0)).alias("_zprop"),
    )
    s4 = s3.select(
        "*",
        F.when(F.col("_se") > 0, F.col("_diff") / F.col("_se"))
        .otherwise(F.lit(0.0))
        .alias("_tstat"),
    )
    s5 = s4.select(
        "*",
        F.abs(
            F.when(F.col("_binary"), F.col("_zprop")).otherwise(F.col("_tstat"))
        ).alias("_absstat"),
    )
    s6 = s5.select("*", _erfc_half(F.col("_absstat")).alias("_pval"))
    gated = (
        (F.col("control_rows") >= 100)
        & (F.col("treatment_rows") >= 100)
        & (F.col("control_n") >= 1)
        & (F.col("treatment_n") >= 1)
    )
    g = lambda c: F.when(gated, c)  # noqa: E731
    return s6.select(
        "test_name",
        F.col("success_metric").alias("metric"),
        "control_n",
        "treatment_n",
        "control_rows",
        "treatment_rows",
        g(F.col("_cmean")).alias("control_mean"),
        g(F.col("_tmean")).alias("treatment_mean"),
        g(F.sqrt(F.greatest(F.col("_cvar"), F.lit(0.0)))).alias("control_std"),
        g(F.sqrt(F.greatest(F.col("_tvar"), F.lit(0.0)))).alias("treatment_std"),
        g(F.col("_effect")).alias("effect_size"),
        g(
            F.when(
                F.col("_cmean") != 0, F.col("_diff") / F.col("_cmean") * 100
            ).otherwise(F.lit(0.0))
        ).alias("relative_improvement_percent"),
        g(F.col("_diff") - 1.96 * F.col("_se")).alias("ci95_low"),
        g(F.col("_diff") + 1.96 * F.col("_se")).alias("ci95_high"),
        g(F.abs(F.col("_effect")) > 0.2).alias("is_significant"),
        F.when(F.col("_binary"), F.lit("chi_square"))
        .otherwise(F.lit("t_test"))
        .alias("test_type"),
        g(
            F.when(
                F.col("_binary"), F.col("_zprop") * F.col("_zprop")
            ).otherwise(F.col("_tstat"))
        ).alias("test_statistic"),
        g(F.col("_pval")).alias("p_value"),
        g(F.col("_pval") < F.col("significance_level")).alias("rejects_null"),
        (
            (F.col("control_rows") >= F.col("min_sample_size"))
            & (F.col("treatment_rows") >= F.col("min_sample_size"))
        ).alias("meets_min_samples"),
    )


def experiment_ranking_eval(
    tagged: DataFrame,
    score_col: str = "prediction",
    label_col: str = "actual_fraud",
) -> DataFrame:
    """Per-arm RANKING quality for each experiment — what a model A/B
    actually decides on, beyond the reference's mean-of-metric block:
    ROC-AUC with its DeLong standard error per (experiment, variant)
    (ml/evaluation.auc_with_ci — decimal-exact placements, no
    resampling), then an UNPAIRED two-sample z-test on the AUC
    difference (arms are disjoint users, so the correlated
    delong_paired_test would be wrong here):
    z = (auc_t − auc_c) / √(se_t² + se_c²), p via the same erfc
    approximation as the mean-metric analysis. One grouped window pass;
    `rejects_null` gates on each experiment's significance_level.

    `tagged` is assign_variants output with `score_col` and a boolean/
    0-1 `label_col`. Arms with <2 positives or <2 negatives get null
    se → null z/p (auc still reported)."""
    from .evaluation import auc_with_ci

    per = auc_with_ci(
        tagged.withColumn("_lbl", F.col(label_col).cast("int")),
        score_col,
        "_lbl",
        by=["test_name", "significance_level", "ab_variant"],
    )
    wide = (
        per.groupBy("test_name", "significance_level")
        .pivot("ab_variant", ["control", "treatment"])
        .agg(
            F.first("n").alias("n"),
            F.first("pos").alias("pos"),
            F.first("auc").alias("auc"),
            F.first("se").alias("se"),
        )
    )
    s1 = wide.select(
        "*",
        (F.col("treatment_auc") - F.col("control_auc")).alias("_lift"),
        F.sqrt(
            F.col("control_se") * F.col("control_se")
            + F.col("treatment_se") * F.col("treatment_se")
        ).alias("_se"),
    )
    s2 = s1.select(
        "*",
        F.when(F.col("_se") > 0, F.col("_lift") / F.col("_se")).alias("_z"),
    )
    s3 = s2.select("*", _erfc_half(F.abs(F.col("_z"))).alias("_p"))
    return s3.select(
        "test_name",
        "control_n",
        "treatment_n",
        "control_pos",
        "treatment_pos",
        "control_auc",
        "treatment_auc",
        "control_se",
        "treatment_se",
        F.col("_lift").alias("auc_lift"),
        F.col("_z").alias("z_score"),
        F.col("_p").alias("p_value"),
        (F.col("_p") < F.col("significance_level")).alias("rejects_null"),
    )


def export_results(results: DataFrame, test_name: str) -> DataFrame:
    """The reference's export (ab_testing.py:404-427): every recorded
    result row for one experiment, projection-stable."""
    return results.filter(F.col("test_name") == test_name).select(
        "test_name", "transaction_id", "ab_variant", "model_used",
        "prediction", "decision", "actual_fraud", "processing_time_ms",
    )
