"""Distribution-drift monitoring — the population stability index (PSI),
the standard credit-risk/fraud model monitor (Siddiqi, "Credit Risk
Scorecards", 2006): compare a feature's distribution in a CURRENT
window against the BASELINE it was trained on; PSI = Σ (p_cur − p_base)
· ln(p_cur / p_base) over buckets. Rule-of-thumb thresholds: < 0.1
stable, 0.1–0.25 investigate, > 0.25 retrain.

Scale shape: bucket cuts come from ONE percentile aggregate over the
baseline (a skinny driver-side list — the model, not the data), then
both sides reduce to per-bucket counts with map-side combine; the PSI
arithmetic runs on bucket-count-sized frames. Nothing driver-side grows
with the data. Numeric buckets are baseline quantiles (equal-population,
the standard choice — equal-width buckets under-resolve the tails);
categorical PSI buckets by value with rare values folded into one
'__other__' bucket on BOTH sides so the index is defined when a new
category appears.

ln() is transcendental — tolerance tests, outside the bit-exact oracle
surface (suite rule). Smoothing: empty buckets get a floor proportion
(`eps`) so PSI stays finite when a bucket empties entirely — the
standard Laplace-style guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def numeric_cuts(
    baseline: DataFrame, col: str, n_buckets: int = 10, exact: bool = True
) -> list[float]:
    """Interior bucket boundaries: baseline quantiles at i/n for
    i=1..n-1. `exact=False` switches to percentile_approx (mergeable
    sketch, constant memory) — the same exact→approx flip as
    perplexity_buckets; cuts move by at most the sketch error."""
    fn = "percentile" if exact else "percentile_approx"
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = baseline.agg(
        F.expr(f"{fn}({col}, array({', '.join(str(q) for q in qs)}))").alias("c")
    ).first()
    return [float(x) for x in row["c"]]


def _bucket_expr(col: str, cuts: list[float]):
    b = F.lit(0)
    for c in cuts:
        b = b + (F.col(col) > F.lit(float(c))).cast("int")
    return b


def _proportions(df: DataFrame, bucket, n_buckets: int, side: str) -> DataFrame:
    counts = df.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n")
    )
    # total via an unpartitioned window over the ALREADY-aggregated
    # counts (<= n_buckets rows) — deriving it with counts.agg() + join
    # re-executed the whole upstream scan a second time (plan audit r12:
    # the drift_report query read events 16x; at 100 TB the raw scan is
    # the entire cost). Single-partition window over a bucket-sized frame
    # is free; n/t is the same exact long/long division either way.
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.select(
        "bucket", (F.col("n") / F.sum("n").over(w)).alias(f"p_{side}")
    )


def psi_numeric(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    n_buckets: int = 10,
    eps: float = 1e-4,
    exact_cuts: bool = True,
) -> DataFrame:
    """One row: (psi, n_buckets). Per-bucket detail via
    :func:`psi_numeric_detail`."""
    return _psi_total(psi_numeric_detail(baseline, current, col, n_buckets, eps, exact_cuts))


def psi_numeric_detail(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    n_buckets: int = 10,
    eps: float = 1e-4,
    exact_cuts: bool = True,
) -> DataFrame:
    """(bucket, p_base, p_cur, contribution) — equal-population buckets
    from baseline quantiles, folded into both sides as literals."""
    cuts = numeric_cuts(baseline, col, n_buckets, exact=exact_cuts)
    base = _proportions(baseline.filter(F.col(col).isNotNull()), _bucket_expr(col, cuts), n_buckets, "base")
    cur = _proportions(current.filter(F.col(col).isNotNull()), _bucket_expr(col, cuts), n_buckets, "cur")
    return _contributions(base, cur, eps)


def psi_categorical(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    top_n: int = 20,
    eps: float = 1e-4,
) -> DataFrame:
    """Categorical PSI: the baseline's top_n values are the buckets,
    everything else (including categories NEW in current) folds into
    '__other__' on both sides."""
    return _psi_total(
        psi_categorical_detail(baseline, current, col, top_n, eps)
    )


def psi_categorical_detail(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    top_n: int = 20,
    eps: float = 1e-4,
) -> DataFrame:
    """(bucket, p_base, p_cur, contribution) — the per-category detail
    behind :func:`psi_categorical` (same bucket rule: baseline top_n by
    count with a value tie-break, everything else '__other__')."""
    top = [
        r[0]
        for r in baseline.groupBy(col)
        .count()
        .orderBy(F.desc("count"), F.asc(col))
        .limit(top_n)
        .collect()
    ]
    bucket = (
        F.when(F.col(col).isin(*top), F.col(col).cast("string"))
        .otherwise("__other__")
        if top
        else F.lit("__other__")
    )
    base = _proportions(baseline, bucket, top_n, "base")
    cur = _proportions(current, bucket, top_n, "cur")
    return _contributions(base, cur, eps)


def _contributions(base: DataFrame, cur: DataFrame, eps: float) -> DataFrame:
    p = F.greatest(F.coalesce("p_cur", F.lit(0.0)), F.lit(eps))
    q = F.greatest(F.coalesce("p_base", F.lit(0.0)), F.lit(eps))
    return (
        base.join(cur, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("p_base", F.lit(0.0)).alias("p_base"),
            F.coalesce("p_cur", F.lit(0.0)).alias("p_cur"),
            ((p - q) * F.log(p / q)).alias("contribution"),
        )
    )


def _psi_total(detail: DataFrame) -> DataFrame:
    return detail.agg(
        F.sum("contribution").alias("psi"), F.count("*").alias("n_buckets")
    )


def fit_drift_baseline(
    baseline: DataFrame, col: str, n_buckets: int = 10, exact: bool = True
) -> dict:
    """Train the monitoring baseline ONCE, offline: quantile cuts plus
    the baseline's own bucket proportions. The returned dict is the
    model a streaming monitor scores against — persist it with
    :func:`save_drift_baseline` next to the model it guards."""
    cuts = numeric_cuts(baseline, col, n_buckets, exact=exact)
    props = {
        int(r["bucket"]): float(r["p_base"])
        for r in _proportions(
            baseline.filter(F.col(col).isNotNull()),
            _bucket_expr(col, cuts),
            n_buckets,
            "base",
        ).collect()
    }
    return {
        "col": col,
        "cuts": cuts,
        "p_base": [props.get(i, 0.0) for i in range(len(cuts) + 1)],
    }


def save_drift_baseline(baseline_model: dict, path: str) -> None:
    from ..functions.artifacts import FORMAT, atomic_write

    atomic_write(
        path,
        {"format": FORMAT, "version": 1, "kind": "drift-baseline", **baseline_model},
    )


def load_drift_baseline(path: str) -> dict:
    from ..functions.artifacts import FORMAT, read_artifact

    art = read_artifact(path, "drift-baseline", (FORMAT,))
    return {
        "col": art["col"],
        "cuts": [float(x) for x in art["cuts"]],
        "p_base": [float(x) for x in art["p_base"]],
    }


def psi_from_counts(counts: DataFrame, p_base: list[float], eps: float = 1e-4) -> DataFrame:
    """(psi, n_buckets, n_rows) from a (bucket, n) count frame scored
    against stored baseline proportions — the arithmetic tail shared by
    the batch and streaming monitors (counts are mergeable partials, so
    any window of batches re-aggregates exactly)."""
    spark = counts.sparkSession
    base = spark.createDataFrame(
        [(i, p) for i, p in enumerate(p_base)], "bucket int, p_base double"
    )
    total = counts.agg(F.sum("n").alias("t"))
    cur = base.join(counts, "bucket", "left").crossJoin(F.broadcast(total)).select(
        "bucket",
        "p_base",
        (F.coalesce("n", F.lit(0)) / F.col("t")).alias("p_cur"),
        F.col("t"),
    )
    p = F.greatest(F.col("p_cur"), F.lit(eps))
    q = F.greatest(F.col("p_base"), F.lit(eps))
    return cur.select(
        ((p - q) * F.log(p / q)).alias("contribution"), "t"
    ).agg(
        F.sum("contribution").alias("psi"),
        F.count("*").alias("n_buckets"),
        F.first("t").alias("n_rows"),
    )
