"""M6 — trained sequential scorer over trailing per-user windows.

The reference declares an LSTM sequential model but ships a dummy
fallback that returns a constant (model_manager.py:244-277 — the model
class doesn't exist in its services); the only sequential artifact it
really has is the 10-step input assembly (utils/config.py:145-157).
This module EXCEEDS that: the same trailing-window assembly
(ml/models.sequence_features is the raw form) is reduced to a fixed
feature vector per event and a logistic scorer is actually TRAINED on
it, so sequence-shaped fraud (velocity bursts, bust-out ramps) scores
high from the order/timing structure alone.

Spark-first shapes:

* feature assembly is ONE window pass per user (a single sort: all
  frames share the (user, ts, id) ordering); trailing mean/std derive
  from exact DECIMAL sums over the frame, so features are
  bit-deterministic on any partitioning;
* training is distributed full-batch gradient descent where each
  round's gradient is one map-side-combined aggregation of d+1 DECIMAL
  sums (sigmoid residual × feature) — order-independent exact
  accumulation, so the fitted weights are a pure function of the input
  multiset (same law as ml/text_classifier's decimal heads). The
  feature frame is localCheckpoint'd once; each round is one job over
  the materialized blocks. Adagrad per-coordinate scaling copes with
  the bias/feature gradient-scale mismatch (full-batch GD's first step
  is a pure sign step — see CLAUDE.md);
* scoring is a pure Column dot-product + sigmoid — zero Python
  crossings, fully codegen'd, broadcast-free (the model is a dict of
  floats folded into literals).

The model dict round-trips through JSON (to_json/from_json) so it plugs
into the M9 artifact/hot-reload path like any other scorer.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEQ_FEATURES = [
    "seq_log_value",
    "seq_n",
    "seq_ratio_to_mean",
    "seq_std_ratio",
    "seq_lag1_delta",
    "seq_gap_s",
    "seq_span_s",
    "seq_rate",
]


def lagged_sequence_features(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
    id_col: str = "event_id",
    n: int = 10,
) -> DataFrame:
    """Fixed-width sequential features from the trailing `n`-row window
    per user (the reference's 10-step LSTM input, reduced): trailing
    count, amount-to-trailing-mean ratio, trailing coefficient of
    variation, last-step delta, last gap, window time span, and
    event rate over the span. One window sort — every frame shares the
    (user, ts, id) ordering, and the trailing mean/std come from exact
    decimal sum / sum-of-squares."""
    ts_s = F.col(ts_col).cast("double")
    base = df.withColumn("_ts_s", ts_s)
    w = (
        Window.partitionBy(user_col)
        .orderBy("_ts_s", id_col)
        .rowsBetween(-(n - 1), 0)
    )
    wlag = Window.partitionBy(user_col).orderBy("_ts_s", id_col)
    v = F.col(amount_col).cast("double")
    s1 = F.sum(v.cast("decimal(28,8)")).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(38,8)")).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w).cast("double")
    mean = s1 / cnt
    var = F.greatest(s2 / cnt - mean * mean, F.lit(0.0))
    lag_v = F.lag(v).over(wlag)
    lag_t = F.lag(F.col("_ts_s")).over(wlag)
    span = F.col("_ts_s") - F.min("_ts_s").over(w)
    return base.select(
        *df.columns,
        F.round(F.log1p(F.greatest(v, F.lit(0.0))), 6).alias("seq_log_value"),
        cnt.alias("seq_n"),
        F.round(v / F.nullif(mean, F.lit(0.0)), 6).alias("seq_ratio_to_mean"),
        F.round(F.sqrt(var) / F.nullif(mean, F.lit(0.0)), 6).alias("seq_std_ratio"),
        F.round(F.coalesce(v - lag_v, F.lit(0.0)), 6).alias("seq_lag1_delta"),
        F.round(
            F.least(F.coalesce(F.col("_ts_s") - lag_t, F.lit(86400.0)), F.lit(86400.0)),
            6,
        ).alias("seq_gap_s"),
        F.round(span, 6).alias("seq_span_s"),
        F.round(cnt / F.greatest(span, F.lit(1.0)), 6).alias("seq_rate"),
    )


def _standardization(
    feats: DataFrame, cols: list[str], label_col: str | None = None
) -> tuple[list, list, int, list | None, float | None]:
    """Per-feature mean/scale (and the row count, so the trainer doesn't
    pay a separate count job) from one exact-decimal aggregation. With
    `label_col` the SAME aggregation also collects Σy and the Σxᵢ·y cross
    moments — everything a closed-form warm start needs, at zero extra
    jobs (returned as (means, scales, n, cross, ybar); cross[i] = exact
    Σ xᵢ·y / n)."""
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs.append(F.sum(v.cast("decimal(38,8)")).alias(f"_s1_{c}"))
        aggs.append(F.sum((v * v).cast("decimal(38,8)")).alias(f"_s2_{c}"))
    aggs.append(F.count(F.lit(1)).alias("_n"))
    if label_col is not None:
        y = F.col(label_col).cast("double")
        aggs.append(F.sum(y.cast("decimal(38,8)")).alias("_sy"))
        for c in cols:
            v = F.col(c).cast("double")
            aggs.append(F.sum((v * y).cast("decimal(38,8)")).alias(f"_sxy_{c}"))
    row = feats.agg(*aggs).collect()[0]
    n = float(row["_n"])
    means, scales = [], []
    for c in cols:
        m = float(row[f"_s1_{c}"]) / n
        var = max(float(row[f"_s2_{c}"]) / n - m * m, 0.0)
        means.append(m)
        scales.append(math.sqrt(var) if var > 1e-24 else 1.0)
    if label_col is None:
        return means, scales, int(row["_n"]), None, None
    cross = [float(row[f"_sxy_{c}"]) / n for c in cols]
    return means, scales, int(row["_n"]), cross, float(row["_sy"]) / n


def train_sequential_scorer(
    feats: DataFrame,
    label_col: str,
    feature_cols: list[str] | None = None,
    iters: int = 30,
    lr: float = 0.5,
    warm_start: bool = False,
) -> dict:
    """Distributed full-batch logistic regression: per round, ONE
    aggregation of d+1 exact decimal sums (residual and residual×feature)
    over the localCheckpoint'd standardized frame; Adagrad per-coordinate
    steps on the driver. Deterministic: decimal sums are
    order-independent, the driver arithmetic is pure — two fits on any
    partitioning produce bit-identical weights.

    `warm_start=True` initializes from a CLOSED-FORM Newton step at w=0
    instead of zeros — b₀ = logit(ȳ) and wᵢ = mean(zᵢ·(y−ȳ)) / (ȳ(1−ȳ))
    (for standardized features the Hessian at the base rate is
    ≈ ȳ(1−ȳ)·I, so this is the diagonal-Newton probe). The cross
    moments ride in the SAME standardization aggregation (zero extra
    jobs), so the warm fit reaches the cold fit's holdout quality in
    roughly half the gradient rounds — each round is one scheduled job,
    which is the whole cost of this query at bench scale (SCALE.md's
    sequence_scores A/B table). Still bit-deterministic: the init is a
    pure function of exact decimal sums."""
    cols = feature_cols or SEQ_FEATURES
    means, scales, n, cross, ybar = _standardization(
        feats, cols, label_col=label_col if warm_start else None
    )
    # NULL features (e.g. seq_ratio_to_mean when a user's trailing mean
    # is 0) coalesce to 0.0 — the standardized mean — instead of nulling
    # the whole margin, which would silently drop the row from every
    # gradient sum while n still counts it (a quiet gradient bias on
    # degenerate inputs).
    z = [
        F.coalesce(
            (F.col(c).cast("double") - means[i]) / scales[i], F.lit(0.0)
        ).alias(f"_z{i}")
        for i, c in enumerate(cols)
    ]
    # eager checkpoint materializes in its own job; n came with the
    # standardization aggregate, so no separate count job
    xdf = feats.select(
        F.col(label_col).cast("double").alias("_y"), *z
    ).localCheckpoint(eager=True)
    d = len(cols)
    w = [0.0] * d
    b = 0.0
    if warm_start:
        p = min(max(ybar, 1e-6), 1.0 - 1e-6)
        b = math.log(p / (1.0 - p))
        h = p * (1.0 - p)
        for i in range(d):
            # mean(zᵢ·(y−ȳ)) = (Σxᵢy/n − mᵢ·ȳ)/sᵢ from the exact moments;
            # damped 0.5× because the diagonal Hessian ignores feature
            # correlations (full Newton would overshoot correlated dims)
            w[i] = 0.5 * ((cross[i] - means[i] * ybar) / scales[i]) / h
    gw2 = [1e-12] * d
    gb2 = 1e-12
    for _ in range(iters):
        margin = F.lit(b)
        for i in range(d):
            margin = margin + F.lit(w[i]) * F.col(f"_z{i}")
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - F.col("_y")
        aggs = [F.sum(resid.cast("decimal(38,12)")).alias("_gb")]
        for i in range(d):
            aggs.append(
                F.sum((resid * F.col(f"_z{i}")).cast("decimal(38,12)")).alias(f"_g{i}")
            )
        row = xdf.agg(*aggs).collect()[0]
        gb = float(row["_gb"]) / n
        gb2 += gb * gb
        b -= lr * gb / math.sqrt(gb2)
        for i in range(d):
            g = float(row[f"_g{i}"]) / n
            gw2[i] += g * g
            w[i] -= lr * g / math.sqrt(gw2[i])
    xdf.unpersist()
    return {
        "feature_cols": list(cols),
        "means": means,
        "scales": scales,
        "weights": w,
        "bias": b,
        "iters": iters,
        "lr": lr,
        "warm_start": warm_start,
    }


def score_sequential(df: DataFrame, model: dict, out_col: str = "seq_score") -> DataFrame:
    """Pure-expression scoring: sigmoid(w·(x-mean)/scale + b) folded into
    Column literals — zero Python crossings, codegen-friendly. NULL
    features coalesce to 0.0 standardized (≡ the feature mean), the SAME
    convention training uses — without it a degenerate row (e.g.
    seq_ratio_to_mean NULL at trailing mean 0) would train fine but
    serve a NULL score."""
    margin = F.lit(model["bias"])
    for i, c in enumerate(model["feature_cols"]):
        zc = F.coalesce(
            (F.col(c).cast("double") - model["means"][i]) / model["scales"][i],
            F.lit(0.0),
        )
        margin = margin + F.lit(model["weights"][i]) * zc
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))


def to_json(model: dict) -> str:
    return json.dumps(model, sort_keys=True)


def from_json(s: str) -> dict:
    return json.loads(s)


def to_linear_artifact(model: dict) -> tuple[dict[str, float], float]:
    """Fold the standardization into plain linear (weights, bias) so the
    fitted sequential model ships through the M9 versioned-artifact /
    hot-reload path (ml/models.save_linear_scorer →
    streaming/sinks.reloading_scorer_writer) unchanged:
    Σ wᵢ(xᵢ−mᵢ)/sᵢ + b  ≡  Σ (wᵢ/sᵢ)xᵢ + (b − Σ wᵢmᵢ/sᵢ).
    The served score is the MARGIN (monotone in the probability) — apply
    sigmoid downstream if a calibrated probability is needed.

    NULL-feature caveat: the folded linear form cannot express the
    NULL→mean coalesce that train/score_sequential apply (a generic
    linear scorer has no per-feature impute slot), so a raw NULL feature
    NULLs the served margin. Impute upstream before the artifact path —
    `coalesce(x_i, model["means"][i])` reproduces training semantics
    exactly; the streaming feature kernel's ratio features are the one
    family that can be NULL (trailing mean 0)."""
    weights = {
        c: model["weights"][i] / model["scales"][i]
        for i, c in enumerate(model["feature_cols"])
    }
    bias = model["bias"] - sum(
        model["weights"][i] * model["means"][i] / model["scales"][i]
        for i in range(len(model["feature_cols"]))
    )
    return weights, bias
