"""Distributed binary-classification evaluation metrics.

The reference monitors model health with rolling accuracy/drift counters
(monitoring/metrics.py; model_manager.py's performance tracking) but never
computes the ranking metrics a threshold policy is actually tuned against.
This module supplies them as set-oriented Spark plans:

  * ROC-AUC in the Mann-Whitney rank form — NOT the O(P·N) pair join and
    NOT a per-row global sort: scores are grouped (one map-side-combined
    shuffle, output sized |distinct scores| per group), then a single
    cumulative window over the grouped table accumulates the
    positive-above-negative pair count. Ties contribute half a pair each,
    folded in as integers (2·pairs) so the numerator is EXACT — the only
    float op is the final division. Cross-engine bit-exact.
  * Kolmogorov-Smirnov statistic — max over score groups of
    |cum_pos·N − cum_neg·P|, again an exact integer numerator.
  * Average precision (PR-AUC, step interpolation with ties grouped) —
    per-group terms are rationals; the cross-group sum is a double, so it
    is folded over a sort_array'd term list (fixed order → bit-identical
    across runs/partitionings; array is sized |distinct scores| per group,
    which a 6-dp score rounding bounds at ~2e6 entries worst case).

At 100 TB the grouped table is the ONLY thing the window ever sorts —
|distinct scores| per group, not |rows| — and the heavy pass is a plain
hash aggregation. Round scores to a fixed precision upstream if they are
raw doubles; the metrics are then exact for the rounded scores.

Confusion sweeps reuse the same grouped table: thresholds join against
|distinct scores| rows, never against the event stream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _grouped_scores(
    df: DataFrame, score_col: str, label_col: str, by: Sequence[str]
) -> DataFrame:
    """One hash aggregation: (by…, score) → (#pos, #neg).

    Null/NaN scores and null labels are dropped (they rank nowhere — and
    NaN would otherwise form its own score group that Spark's window
    sorts LAST while engines/fold orders disagree on it); labels are
    positive when > 0.5 so int 0/1, double 0.0/1.0, and booleans all work.
    """
    pos = F.when(F.col(label_col).cast("double") > 0.5, 1).otherwise(0)
    s = F.col(score_col).cast("double")
    return (
        df.filter(s.isNotNull() & ~F.isnan(s) & F.col(label_col).isNotNull())
        .groupBy(*by, F.col(score_col).cast("double").alias("_s"))
        .agg(
            F.sum(pos).cast("long").alias("_p"),
            F.sum(1 - pos).cast("long").alias("_n"),
        )
    )


def binary_eval(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    by: Sequence[str] | None = None,
) -> DataFrame:
    """ROC-AUC + KS + average precision in ONE grouped pass.

    Returns one row per `by` group: ``n, pos, auc, ks, ap`` (auc/ks exact
    up to the final division; ap bit-deterministic via an ordered fold).
    Groups with no positives or no negatives get null auc/ks/ap.
    """
    by = list(by or [])
    g = _grouped_scores(df, score_col, label_col, by)
    return metrics_from_score_groups(g, by)


def metrics_from_score_groups(
    g: DataFrame,
    by: Sequence[str] | None = None,
    score_col: str = "_s",
    pos_col: str = "_p",
    neg_col: str = "_n",
) -> DataFrame:
    """The metric math of :func:`binary_eval`, starting from an ALREADY
    grouped (by…, score) → (#pos, #neg) table.

    This is the mergeable-partial entry point: per-score pos/neg counts
    add losslessly across micro-batches / shards / days, so a streaming
    sink can land per-batch grouped counts and this function computes the
    SAME auc/ks/ap a batch pass over the union would — bit-exactly,
    because everything up to the final division is integer arithmetic on
    the merged counts (streaming/sinks.eval_partial_writer +
    eval_rollup_view; stream==batch pinned in tests/test_eval_stream.py).

    `g` must hold ONE row per (by…, score) — sum partials into that shape
    before calling (a duplicate score row would double-count its own ties
    in the cumulative window).
    """
    by = list(by or [])
    if (score_col, pos_col, neg_col) != ("_s", "_p", "_n"):
        g = g.select(
            *by,
            F.col(score_col).alias("_s"),
            F.col(pos_col).cast("long").alias("_p"),
            F.col(neg_col).cast("long").alias("_n"),
        )

    w_all = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_le = (
        Window.partitionBy(*by)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    P, N = F.sum("_p").over(w_all), F.sum("_n").over(w_all)
    cum_p, cum_n = F.sum("_p").over(w_le), F.sum("_n").over(w_le)

    # AUC numerator: for each score group, positives here beat every
    # negative strictly below (2 units each) and tie the negatives here
    # (1 unit each): _p * (2*(cum_n - _n) + _n). Summed in decimal —
    # exact at any scale.
    auc_num = (F.col("_p") * (2 * (cum_n - F.col("_n")) + F.col("_n"))).cast(
        _DEC
    )
    # KS numerator at this score cut: |cum_p*N - cum_n*P| (longs; exact).
    ks_num = F.abs(cum_p.cast(_DEC) * N - cum_n.cast(_DEC) * P)
    # AP term at this score group (descending-score step): with scores
    # DESCENDING, recall steps by _p/P and precision at the step is
    # tp_ge/all_ge where *_ge counts rows with score >= _s — which under
    # the ASCENDING cumulative is (P - cum_p + _p) / (total - cum - _all + _all).
    tp_ge = P - cum_p + F.col("_p")
    all_ge = (P + N) - (cum_p + cum_n) + (F.col("_p") + F.col("_n"))
    ap_term = F.col("_p") * tp_ge / all_ge

    per_score = g.select(
        *by,
        F.col("_s"),
        F.col("_p"),
        F.col("_n"),
        P.alias("_ptot"),
        N.alias("_ntot"),
        auc_num.alias("_auc_num"),
        ks_num.alias("_ks_num"),
        ap_term.alias("_ap_term"),
    )
    # The double-summed AP folds over a sort_array'd (score, term) list so
    # the accumulation order is fixed regardless of partitioning.
    ap_fold = F.aggregate(
        F.sort_array(F.collect_list(F.struct("_s", "_ap_term"))),
        F.lit(0.0),
        lambda acc, x: acc + x["_ap_term"],
    )
    agg = [
        F.sum(F.col("_p") + F.col("_n")).alias("n"),
        F.sum("_p").alias("pos"),
        F.first("_ptot").alias("_ptot"),
        F.first("_ntot").alias("_ntot"),
        F.sum("_auc_num").alias("_auc_num"),
        F.max("_ks_num").alias("_ks_max"),
        ap_fold.alias("_ap_sum"),
    ]
    res = per_score.groupBy(*by).agg(*agg) if by else per_score.agg(*agg)
    pn = F.col("_ptot") * F.col("_ntot")
    ok = (F.col("_ptot") > 0) & (F.col("_ntot") > 0)
    return res.select(
        *by,
        "n",
        "pos",
        # cast BOTH operands to double BEFORE dividing: decimal/long is a
        # decimal division (rounds at decimal scale); the IEEE division of
        # two exact integers is what DuckDB's ::DOUBLE / ::DOUBLE computes
        F.when(
            ok,
            F.col("_auc_num").cast("double")
            / (2 * pn).cast("double"),
        ).alias("auc"),
        F.when(
            ok, F.col("_ks_max").cast("double") / pn.cast("double")
        ).alias("ks"),
        F.when(ok, F.col("_ap_sum") / F.col("_ptot")).alias("ap"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Just the AUC column of :func:`binary_eval`."""
    by = list(by or [])
    return binary_eval(df, score_col, label_col, by).select(
        *by, "n", "pos", "auc"
    )


def confusion_at_thresholds(
    df: DataFrame,
    thresholds: Sequence[float],
    score_col: str = "score",
    label_col: str = "label",
    by: Sequence[str] | None = None,
) -> DataFrame:
    """tp/fp/fn/tn + precision/recall/f1/fpr per threshold (score >= t
    predicts positive).

    The event-scale pass is the same grouped aggregation as
    :func:`binary_eval`; thresholds then join against the
    |distinct scores|-sized table, so sweeping 100 thresholds costs one
    extra tiny join, not 100 scans. Ratio columns are exact rationals
    evaluated in one division each (round at the query edge if hashing).
    """
    by = list(by or [])
    g = _grouped_scores(df, score_col, label_col, by)
    # dedupe: a repeated threshold would explode into two copies of every
    # score row and the groupBy would sum both (doubled counts)
    thresholds = sorted({float(x) for x in thresholds})
    t = F.explode(
        F.array(*[F.lit(x) for x in thresholds])
    ).alias("threshold")
    per = g.select(*by, "_s", "_p", "_n", t)
    pred_pos = F.col("_s") >= F.col("threshold")
    agg = (
        per.groupBy(*by, "threshold")
        .agg(
            F.sum(F.when(pred_pos, F.col("_p")).otherwise(0)).alias("tp"),
            F.sum(F.when(pred_pos, F.col("_n")).otherwise(0)).alias("fp"),
            F.sum(F.when(~pred_pos, F.col("_p")).otherwise(0)).alias("fn"),
            F.sum(F.when(~pred_pos, F.col("_n")).otherwise(0)).alias("tn"),
        )
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    precision = F.when(tp + fp > 0, tp / (tp + fp))
    recall = F.when(tp + fn > 0, tp / (tp + fn))
    return agg.select(
        *by,
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            2 * tp + fp + fn > 0, 2 * tp / (2 * tp + fp + fn)
        ).alias("f1"),
        F.when(fp + tn > 0, fp / (fp + tn)).alias("fpr"),
    )


def _z_from_alpha(alpha: float) -> float:
    """Two-sided normal critical value via Acklam's rational inverse-CDF
    approximation (|rel err| < 1.15e-9 — far below any CI's statistical
    noise; driver-side scalar, deterministic)."""
    import math

    p = 1.0 - alpha / 2.0
    if not 0.0 < p < 1.0:
        raise ValueError(f"alpha must be in (0, 2), got {alpha}")
    a = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
    b = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00)
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p <= p_high:
        q = p - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    q = math.sqrt(-2 * math.log(1 - p))
    return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )


def auc_with_ci(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    by: Sequence[str] | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """ROC-AUC with its DeLong (1988) standard error and normal CI —
    closed-form, NO resampling: the structural-component variance needs
    only each positive's placement among negatives (and vice versa), and
    a placement is just the cumulative count the AUC window already
    produces. Per score group the placement numerator is the INTEGER
    2·cum_other_below + ties, so the component means and second moments
    are decimal-exact sums; the only float ops are the final divisions.
    A bootstrap would rescan the data B times for a worse estimate.

    Var(AUC) = S10/P + S01/N (sample variances of the positive/negative
    placements). Groups with P < 2 or N < 2 get null se/lo/hi. Output:
    by…, n, pos, auc, se, lo, hi (CI clamped to [0, 1]).
    """
    by = list(by or [])
    g = _grouped_scores(df, score_col, label_col, by)
    w_all = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_le = (
        Window.partitionBy(*by)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    P, N = F.sum("_p").over(w_all), F.sum("_n").over(w_all)
    cum_p, cum_n = F.sum("_p").over(w_le), F.sum("_n").over(w_le)
    # placement numerators (denominator 2N for positives, 2P for negatives):
    # a positive's placement counts negatives BELOW it (+½ ties); a
    # negative's counts positives ABOVE it (+½ ties) — DeLong's ψ both ways
    v10 = (2 * (cum_n - F.col("_n")) + F.col("_n")).cast(_DEC)
    v01 = (2 * (P - cum_p) + F.col("_p")).cast(_DEC)
    per = g.select(
        *by,
        "_p",
        "_n",
        P.alias("_ptot"),
        N.alias("_ntot"),
        (F.col("_p") * v10).alias("_s10"),
        (F.col("_p") * v10 * v10).alias("_s10sq"),
        (F.col("_n") * v01).alias("_v01"),
        (F.col("_n") * v01 * v01).alias("_v01sq"),
    )
    agg = [
        F.sum(F.col("_p") + F.col("_n")).alias("n"),
        F.sum("_p").alias("pos"),
        F.first("_ptot").alias("_ptot"),
        F.first("_ntot").alias("_ntot"),
        F.sum("_s10").alias("_s10"),
        F.sum("_s10sq").alias("_s10sq"),
        F.sum("_v01").alias("_v01"),
        F.sum("_v01sq").alias("_v01sq"),
    ]
    res = per.groupBy(*by).agg(*agg) if by else per.agg(*agg)
    p_, n_ = F.col("_ptot").cast("double"), F.col("_ntot").cast("double")
    # placements in [0,1]: divide the exact integer sums late
    m10 = F.col("_s10").cast("double") / (p_ * 2 * n_)
    m10sq = F.col("_s10sq").cast("double") / (p_ * 4 * n_ * n_)
    m01 = F.col("_v01").cast("double") / (n_ * 2 * p_)
    m01sq = F.col("_v01sq").cast("double") / (n_ * 4 * p_ * p_)
    # sample variances (n/(n-1) correction)
    s10 = (m10sq - m10 * m10) * p_ / (p_ - 1)
    s01 = (m01sq - m01 * m01) * n_ / (n_ - 1)
    var = s10 / p_ + s01 / n_
    z = float(_z_from_alpha(alpha))
    ok = (F.col("_ptot") > 1) & (F.col("_ntot") > 1)
    auc = F.when(
        (F.col("_ptot") > 0) & (F.col("_ntot") > 0), m10
    )
    se = F.when(ok, F.sqrt(F.greatest(var, F.lit(0.0))))
    return res.select(
        *by,
        "n",
        "pos",
        auc.alias("auc"),
        se.alias("se"),
        F.when(ok, F.greatest(auc - z * se, F.lit(0.0))).alias("lo"),
        F.when(ok, F.least(auc + z * se, F.lit(1.0))).alias("hi"),
    )


def delong_paired_test(
    df: DataFrame,
    score_a: str,
    score_b: str,
    label_col: str = "label",
    alpha: float = 0.05,
) -> DataFrame:
    """Champion-vs-challenger AUC comparison on the SAME rows — the
    paired DeLong test, which accounts for the correlation a naive
    two-sample z-test on independent AUCs ignores (both models score the
    same transactions; their errors co-vary). One row out: auc_a, auc_b,
    delta, se, z, significant.

    Shape: ONE hash aggregation over (score_a, score_b) pairs — a row's
    placement under model A depends only on score_a, so every row of a
    (sa, sb) group shares both placements and the covariance components
    are group-weighted integer sums (decimal-exact; the grouped table is
    bounded by |distinct sa|·|distinct sb| in the worst case, in practice
    by the 6-dp rounding contract). Two cumulative windows over that
    table (one per score order) — never a pass over the data per model.

    Var(ΔAUC) = (S10a + S10b − 2·S10ab)/P + (S01a + S01b − 2·S01ab)/N.
    """
    import math

    pos = F.when(F.col(label_col).cast("double") > 0.5, 1).otherwise(0)
    sa, sb = F.col(score_a).cast("double"), F.col(score_b).cast("double")
    g = (
        df.filter(
            sa.isNotNull()
            & ~F.isnan(sa)
            & sb.isNotNull()
            & ~F.isnan(sb)
            & F.col(label_col).isNotNull()
        )
        .groupBy(sa.alias("_sa"), sb.alias("_sb"))
        .agg(
            F.sum(pos).cast("long").alias("_p"),
            F.sum(1 - pos).cast("long").alias("_n"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # ties in one score order are broken by the other score: cum counts
    # must include the WHOLE tie group of the ordering score, so order by
    # the score alone is wrong for rowsBetween — aggregate per unique
    # (sa, sb) row with a RANGE over the ordering value instead. Simpler
    # and exact: compute cum_at-or-below per distinct ordering value via
    # a window ordered by that value with rangeBetween.
    w_a = (
        Window.orderBy("_sa").rangeBetween(Window.unboundedPreceding, 0)
    )
    w_b = (
        Window.orderBy("_sb").rangeBetween(Window.unboundedPreceding, 0)
    )
    P, N = F.sum("_p").over(w_all), F.sum("_n").over(w_all)
    # per-row tie masses within the ordering score (sum over the other
    # score's values at the same ordering value)
    tie_a_n = F.sum("_n").over(Window.partitionBy("_sa"))
    tie_a_p = F.sum("_p").over(Window.partitionBy("_sa"))
    tie_b_n = F.sum("_n").over(Window.partitionBy("_sb"))
    tie_b_p = F.sum("_p").over(Window.partitionBy("_sb"))
    cum_n_a, cum_p_a = F.sum("_n").over(w_a), F.sum("_p").over(w_a)
    cum_n_b, cum_p_b = F.sum("_n").over(w_b), F.sum("_p").over(w_b)
    # placement numerators (×2N for v10, ×2P for v01)
    v10a = (2 * (cum_n_a - tie_a_n) + tie_a_n).cast(_DEC)
    v10b = (2 * (cum_n_b - tie_b_n) + tie_b_n).cast(_DEC)
    v01a = (2 * (P - cum_p_a) + tie_a_p).cast(_DEC)
    v01b = (2 * (P - cum_p_b) + tie_b_p).cast(_DEC)
    per = g.select(
        "_p",
        "_n",
        P.alias("_ptot"),
        N.alias("_ntot"),
        (F.col("_p") * v10a).alias("_sa10"),
        (F.col("_p") * v10b).alias("_sb10"),
        (F.col("_p") * v10a * v10a).alias("_sa10sq"),
        (F.col("_p") * v10b * v10b).alias("_sb10sq"),
        (F.col("_p") * v10a * v10b).alias("_sab10"),
        (F.col("_n") * v01a).alias("_sa01"),
        (F.col("_n") * v01b).alias("_sb01"),
        (F.col("_n") * v01a * v01a).alias("_sa01sq"),
        (F.col("_n") * v01b * v01b).alias("_sb01sq"),
        (F.col("_n") * v01a * v01b).alias("_sab01"),
    )
    r = per.agg(
        F.first("_ptot").alias("P"),
        F.first("_ntot").alias("N"),
        *[
            F.sum(c).alias(c)
            for c in (
                "_sa10", "_sb10", "_sa10sq", "_sb10sq", "_sab10",
                "_sa01", "_sb01", "_sa01sq", "_sb01sq", "_sab01",
            )
        ],
    ).first()
    P_, N_ = r["P"], r["N"]
    if P_ is None or P_ < 2 or N_ < 2:
        raise ValueError(
            "delong_paired_test needs >= 2 positives and >= 2 negatives"
        )
    P_, N_ = float(P_), float(N_)

    def moments(s1, s2, cross, scale, count):
        m1 = float(r[s1]) / (count * scale)
        m2 = float(r[s2]) / (count * scale)
        e11 = float(r[cross[0]]) / (count * scale * scale)
        e22 = float(r[cross[1]]) / (count * scale * scale)
        e12 = float(r[cross[2]]) / (count * scale * scale)
        corr = count / (count - 1)
        return (
            m1,
            m2,
            (e11 - m1 * m1) * corr,
            (e22 - m2 * m2) * corr,
            (e12 - m1 * m2) * corr,
        )

    auc_a, auc_b, s10a, s10b, s10ab = moments(
        "_sa10", "_sb10", ("_sa10sq", "_sb10sq", "_sab10"), 2 * N_, P_
    )
    _, _, s01a, s01b, s01ab = moments(
        "_sa01", "_sb01", ("_sa01sq", "_sb01sq", "_sab01"), 2 * P_, N_
    )
    var = (s10a + s10b - 2 * s10ab) / P_ + (s01a + s01b - 2 * s01ab) / N_
    se = math.sqrt(max(var, 0.0))
    delta = auc_a - auc_b
    z = delta / se if se > 0 else float("inf") if delta else 0.0
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                int(P_ + N_),
                auc_a,
                auc_b,
                delta,
                se,
                z,
                bool(abs(z) > _z_from_alpha(alpha)),
            )
        ],
        "n long, auc_a double, auc_b double, delta double, se double, "
        "z double, significant boolean",
    )


def best_threshold(
    df: DataFrame,
    thresholds: Sequence[float],
    score_col: str = "score",
    label_col: str = "label",
    objective: str = "f1",
    fp_cost: float = 1.0,
    fn_cost: float = 1.0,
) -> DataFrame:
    """Pick the operating point from the threshold sweep: the reference
    hardcodes 0.95/0.8/0.6 decision bands (ensemble_predictor.py:344-369);
    this derives the band from measured outcomes instead. Returns ONE row
    — the swept confusion row of the winning threshold.

    objective='f1' maximizes F1; objective='cost' minimizes
    fp_cost·FP + fn_cost·FN (the fraud trade: a false positive is a
    declined good customer, a false negative is the fraud loss). Ties
    break toward the LOWER threshold (deterministic; favors recall).
    The sort runs over |thresholds| rows, not data.
    """
    sweep = confusion_at_thresholds(df, thresholds, score_col, label_col)
    if objective == "f1":
        order = [F.col("f1").desc_nulls_last(), F.col("threshold")]
    elif objective == "cost":
        sweep = sweep.withColumn(
            "cost",
            F.lit(float(fp_cost)) * F.col("fp")
            + F.lit(float(fn_cost)) * F.col("fn"),
        )
        order = [F.col("cost"), F.col("threshold")]
    else:
        raise ValueError(f"objective must be 'f1' or 'cost', got {objective!r}")
    return sweep.orderBy(*order).limit(1)


def expected_calibration_error(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bins: int = 10,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """ECE: Σ_b (n_b/N)·|frac_pos_b − mean_score_b| over equal-width
    score bins — the scalar the reliability_table (ml/calibration.py)
    eyeballs. Scores are assumed probabilities in [0, 1]; values outside
    clamp into the edge bins. One hash aggregation; the cross-bin sum is
    exact up to one division per bin (counts and decimal score sums), so
    results are partition-invariant. Returns by…, n, ece."""
    by = list(by or [])
    s = F.col(score_col).cast("double")
    b = F.least(
        F.greatest(F.floor(s * bins).cast("int"), F.lit(0)),
        F.lit(bins - 1),
    )
    pos = F.when(F.col(label_col).cast("double") > 0.5, 1).otherwise(0)
    per_bin = (
        df.filter(s.isNotNull() & ~F.isnan(s) & F.col(label_col).isNotNull())
        .groupBy(*by, b.alias("_b"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(pos).alias("_pos"),
            F.sum(s.cast("decimal(28,10)")).alias("_ssum"),
        )
    )
    gap = F.abs(
        F.col("_pos").cast("double") / F.col("_n")
        - F.col("_ssum").cast("double") / F.col("_n")
    )
    agg = [
        F.sum("_n").alias("n"),
        # Σ n_b·gap_b then one division by N: fewer roundings, and the
        # per-bin terms fold sorted for bit-determinism
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("_b"), (F.col("_n") * gap).alias("_t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["_t"],
        ).alias("_gapsum"),
    ]
    res = per_bin.groupBy(*by).agg(*agg) if by else per_bin.agg(*agg)
    return res.select(
        *by, "n", (F.col("_gapsum") / F.col("n")).alias("ece")
    )


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """Per-query retrieval quality at cutoff k: recall@k, precision@k,
    reciprocal rank (MRR term), and binary-gain NDCG@k.

    `results` holds ranked candidates per query, ONE row per (query, doc)
    — either with an explicit 1-based `rank_col`, or with `score_col`
    from which ranks are derived (score desc, doc id asc tie-break:
    deterministic). `truth` holds the relevant (query, doc) pairs, binary
    relevance (duplicates tolerated — it is distinct'd).

    The ANN family's recall tests hand-roll this per test file; this is
    the one set-oriented implementation: candidates are cut to k FIRST
    (the join is |queries|·k rows against the truth table, never the full
    ranked list), hits aggregate per query, and the two transcendental
    sums (DCG over hit ranks, ideal DCG over 1..min(n_rel,k)) fold over
    sorted arrays — bounded by k elements, bit-deterministic order.
    Queries with no relevant docs are dropped (metrics undefined); round
    ndcg at the output edge if hashing (log2 is transcendental).

    recall_at_k uses the ANN-benchmark convention — hits divided by
    min(n_rel, k), the achievable maximum at this cutoff — matching the
    hand-rolled recalls in tests/test_pq_ann.py; divide n_hit by n_rel
    yourself for the IR-textbook form.
    """
    if (rank_col is None) == (score_col is None):
        raise ValueError("exactly one of rank_col / score_col required")
    q, d = F.col(query_col), F.col(doc_col)
    if rank_col is None:
        w = Window.partitionBy(query_col).orderBy(
            F.col(score_col).desc(), d
        )
        ranked = results.select(
            q.alias("_q"), d.alias("_d"), F.row_number().over(w).alias("_r")
        )
    else:
        ranked = results.select(
            q.alias("_q"), d.alias("_d"), F.col(rank_col).alias("_r")
        )
    # shuffle_hash on the candidate side (round 13, guide §3.1/§8): the cut
    # candidate set is |queries|·k rows against the data-sized truth table —
    # the planner saw an opaque window subtree and picked sort-merge, which
    # SORTS the truth side every run. Hash-building the per-partition
    # candidate slice drops that sort while keeping the truth side on the
    # partitioning its distinct() already established (no broadcast-build
    # barrier, no 8 GB broadcast cap for huge query panels — the setsim
    # verify-join reasoning). Same rows either way.
    topk = ranked.filter(F.col("_r") <= k).hint("shuffle_hash")
    rel = truth.select(q.alias("_q"), d.alias("_d")).distinct()
    n_rel = rel.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = topk.join(rel, ["_q", "_d"]).groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.min("_r").alias("_first"),
        F.sort_array(F.collect_list("_r")).alias("_ranks"),
    )
    log2 = lambda c: F.log(2.0, c)  # noqa: E731
    dcg = F.aggregate(
        F.col("_ranks"), F.lit(0.0), lambda acc, r: acc + 1.0 / log2(r + 1)
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / log2(i + 1),
    )
    return (
        # per-query aggregates are |queries| rows — same hash-build-the-
        # bounded-side choice for the final left join (build = hits)
        n_rel.join(hits.hint("shuffle_hash"), "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            "n_rel",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0))
                / F.least(F.col("n_rel"), F.lit(k))
            ).alias("recall_at_k"),
            (F.coalesce("n_hit", F.lit(0)) / F.lit(float(k))).alias(
                "precision_at_k"
            ),
            F.coalesce(1.0 / F.col("_first"), F.lit(0.0)).alias(
                "reciprocal_rank"
            ),
            F.coalesce(dcg / idcg, F.lit(0.0)).alias("ndcg_at_k"),
        )
    )


def class_report(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "prediction",
) -> DataFrame:
    """Per-class precision/recall/F1 + support from one confusion pass.

    One hash aggregation over the data ((label, pred) pairs — at most
    K² rows leave the map side); per-class tp/fp/fn then derive from the
    tiny confusion table. Exact integer counts, one division per ratio.
    """
    conf = (
        df.filter(F.col(label_col).isNotNull() & F.col(pred_col).isNotNull())
        .groupBy(
            F.col(label_col).alias("_y"), F.col(pred_col).alias("_yhat")
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    as_label = conf.groupBy(F.col("_y").alias("cls")).agg(
        F.sum("_c").alias("support"),
        F.sum(F.when(F.col("_y") == F.col("_yhat"), F.col("_c")).otherwise(0)).alias(
            "tp"
        ),
    )
    as_pred = conf.groupBy(F.col("_yhat").alias("cls")).agg(
        F.sum("_c").alias("n_pred")
    )
    j = as_label.join(as_pred, "cls", "full").select(
        "cls",
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
    )
    tp, sup, npred = F.col("tp"), F.col("support"), F.col("n_pred")
    precision = F.when(npred > 0, tp / npred)
    recall = F.when(sup > 0, tp / sup)
    return j.select(
        "cls",
        "support",
        tp.alias("tp"),
        (npred - tp).alias("fp"),
        (sup - tp).alias("fn"),
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            npred + sup > 0, 2 * tp / (npred + sup)
        ).alias("f1"),
    )


def multiclass_summary(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "prediction",
) -> DataFrame:
    """One-row accuracy + macro-averaged precision/recall/F1 (null-class
    metrics count as 0, sklearn's zero_division=0 convention). The macro
    averages fold over the class-sorted report so the double sums are
    bit-deterministic."""
    rep = class_report(df, label_col, pred_col)
    fold = lambda c: F.aggregate(  # noqa: E731
        F.sort_array(F.collect_list(F.struct(F.col("cls"), c.alias("_v")))),
        F.lit(0.0),
        lambda acc, x: acc + x["_v"],
    )
    z = lambda c: F.coalesce(c, F.lit(0.0))  # noqa: E731
    return rep.agg(
        F.sum("support").alias("n"),
        (
            F.sum("tp").cast("double") / F.sum("support").cast("double")
        ).alias("accuracy"),
        (fold(z(F.col("precision"))) / F.count(F.lit(1))).alias(
            "macro_precision"
        ),
        (fold(z(F.col("recall"))) / F.count(F.lit(1))).alias("macro_recall"),
        (fold(z(F.col("f1"))) / F.count(F.lit(1))).alias("macro_f1"),
    )


def cumulative_gains(
    df: DataFrame,
    id_col: str,
    score_col: str = "score",
    label_col: str = "label",
    buckets: int = 10,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Gains/lift table: rows ranked by (score desc, id) — the unique id
    makes tie order deterministic — cut into `buckets` equal-count bands;
    per band the positive count, cumulative capture rate, and lift.

    This one DOES globally sort each group (row_number) — it is meant for
    model-sized evaluation samples or per-segment `by` groups, not the
    raw event stream; `binary_eval` covers the sortless whole-corpus case.
    """
    by = list(by or [])
    pos = F.when(F.col(label_col).cast("double") > 0.5, 1).otherwise(0)
    w = Window.partitionBy(*by).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    w_all = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s = F.col(score_col).cast("double")
    ranked = df.filter(
        s.isNotNull() & ~F.isnan(s) & F.col(label_col).isNotNull()
    ).select(
        *by,
        pos.alias("_y"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_total"),
    )
    bucket = F.floor((F.col("_rn") - 1) * buckets / F.col("_total")).cast(
        "int"
    )
    g = ranked.groupBy(*by, bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("pos")
    )
    w_cum = (
        Window.partitionBy(*by)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_pos, cum_n = F.sum("pos").over(w_cum), F.sum("n").over(w_cum)
    P, total = F.sum("pos").over(w_tot), F.sum("n").over(w_tot)
    return g.select(
        *by,
        "bucket",
        "n",
        "pos",
        F.when(P > 0, cum_pos / P).alias("capture_rate"),
        F.when(
            (P > 0) & (cum_n > 0), (cum_pos * total) / (cum_n * P)
        ).alias("lift"),
    )
