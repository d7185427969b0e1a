"""Score calibration + time-ordered evaluation splits.

The reference maps raw ensemble scores straight to decision bands
(ensemble_predictor.py:344-369) — its 0.95/0.8/0.6 thresholds implicitly
assume the score IS a probability. Raw model scores rarely are; a
calibrator fit on held-out outcomes makes "score ≥ 0.9" mean "≥ 90% of
such transactions were fraudulent", which is what a threshold policy and
any expected-cost decision actually need.

Isotonic regression (pool-adjacent-violators) is the standard
distribution-free calibrator (Zadrozny & Elkan, KDD'02); MLlib's
implementation runs PAV on sorted per-partition chunks and merges —
distributed, deterministic, model-sized output (a piecewise-constant
boundary/prediction table folded back into the plan as a literal-backed
model transform).

`rolling_origin_splits` is the temporal complement of
`operators.sampling.kfold_splits`: random/hash K-fold is WRONG for fraud
evaluation (it trains on the future to predict the past); rolling-origin
(a.k.a. forward-chaining) folds train on everything before a time
boundary and test on the next slice — the only split shape whose
measured performance predicts deployment. Boundaries come from
`approx_quantile` on the event-time column (one pass), so folds are
near-equal-mass without collecting data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_isotonic_calibrator(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
):
    """Fit a monotone score→probability map on held-out (score, outcome)
    pairs. Returns the fitted MLlib model (persistable with .save();
    apply with :func:`calibrate`). The model is a piecewise-constant
    table of (boundary, prediction) pairs — model-sized, broadcast to
    executors by MLlib's transform."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    prepared = VectorAssembler(
        inputCols=[score_col], outputCol="_cal_features"
    ).transform(
        scored.select(
            F.col(score_col).cast("double").alias(score_col),
            F.col(label_col).cast("double").alias(label_col),
        )
    )
    iso = IsotonicRegression(
        featuresCol="_cal_features",
        labelCol=label_col,
        predictionCol="calibrated",
        isotonic=True,
    )
    return iso.fit(prepared)


def calibrate(
    df: DataFrame,
    model,
    score_col: str = "score",
    out_col: str = "calibrated",
) -> DataFrame:
    """Apply a fitted calibrator: adds `out_col` (the calibrated
    probability for `score_col`) and drops the assembler scratch."""
    from pyspark.ml.feature import VectorAssembler

    prepared = VectorAssembler(
        inputCols=[score_col], outputCol="_cal_features"
    ).transform(df.withColumn(score_col, F.col(score_col).cast("double")))
    out = model.transform(prepared).drop("_cal_features")
    if model.getPredictionCol() != out_col:
        out = out.withColumnRenamed(model.getPredictionCol(), out_col)
    return out


def brier_score(
    df: DataFrame, prob_col: str, label_col: str = "label"
) -> float:
    """Mean squared error of predicted probability vs outcome — the
    standard proper scoring rule for checking a calibrator helped.
    Decimal-summed for a deterministic cross-run value."""
    n = df.count()
    if n == 0:
        raise ValueError("brier_score on an empty frame")
    total = df.select(
        F.sum(
            F.pow(
                F.col(prob_col).cast("double")
                - F.col(label_col).cast("double"),
                2,
            ).cast("decimal(28,12)")
        ).alias("s")
    ).first()["s"]
    return float(total) / n


def reliability_table(
    df: DataFrame,
    prob_col: str,
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, mean_pred, frac_pos) — the calibration-curve table: a
    calibrated model has mean_pred ≈ frac_pos per bin. One groupBy."""
    b = F.least(
        F.floor(F.col(prob_col).cast("double") * n_bins).cast("int"),
        F.lit(n_bins - 1),
    )
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col(prob_col).cast("double")).alias("mean_pred"),
            F.avg(F.col(label_col).cast("double")).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def rolling_origin_splits(
    df: DataFrame,
    ts_col: str,
    n_folds: int = 4,
    relative_error: float = 0.001,
) -> list[tuple[DataFrame, DataFrame]]:
    """Forward-chaining evaluation folds: [(train_1, test_1), …] where
    train_i = rows before boundary i and test_i = rows in
    [boundary_i, boundary_{i+1}). Boundaries are event-time quantiles
    (one approx_quantile pass, driver state = n_folds timestamps), so
    each test slice carries ~1/(n_folds+1) of the rows and no train row
    is at-or-after its test slice — the no-future-leakage property
    pinned by test."""
    if n_folds < 1:
        raise ValueError(f"n_folds must be >= 1, got {n_folds}")
    ordinal = F.col(ts_col).cast("double")
    probs = [(i + 1) / (n_folds + 1) for i in range(n_folds)]
    cuts = df.select(ordinal.alias("_t")).approxQuantile(
        "_t", probs, relative_error
    )
    folds: list[tuple[DataFrame, DataFrame]] = []
    for i, lo in enumerate(cuts):
        hi: Column | None = (
            F.lit(cuts[i + 1]) if i + 1 < len(cuts) else None
        )
        train = df.filter(ordinal < F.lit(lo))
        test = df.filter(
            (ordinal >= F.lit(lo)) & (ordinal < hi)
            if hi is not None
            else ordinal >= F.lit(lo)
        )
        folds.append((train, test))
    return folds
