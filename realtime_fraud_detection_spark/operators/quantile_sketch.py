"""Mergeable quantile sketches (DDSketch — Masson, Rim & Lee, VLDB'19)
— the quantile dual of operators/sketches.py's HLL distinct rollups.

The reference stores per-window aggregate rollups (RedisService.java
hourly/daily counters); exact percentiles don't pre-aggregate: a p99
over a month needs the raw events unless partials merge. DDSketch
closes that the same way HLL does for distinct counts: bucket values on
a geometric grid x → ceil(log_γ(x)) with γ = (1+α)/(1−α), store ONE
count per touched bucket, and any coarser grain is a SUM of counts —
never a rescan. Each stored partial is O(log_γ(max/min)) integers
(typically a few hundred per group at α=1%) regardless of row count,
and the estimate returned for any rank is within relative error α of a
true order statistic, by construction (the bucket midpoint 2γ^i/(γ+1)
is within α of every value the bucket can hold).

Layout is deliberately LONG (key…, grain, sign, bucket, cnt) rather
than a map/blob column: plain-parquet friendly, mergeable with a
built-in `sum` (map-side combined), prunable by grain, and every engine
can read it — the same reasoning as feature_store.py's long format.

Shapes at 100 TB: building partials is one shuffle keyed by
(key…, hour, sign, bucket) with full map-side combine (the shuffle
carries bucket-granular counts, not events); every rollup and every
quantile extraction after that touches only the partials table, whose
size is bounded by groups × buckets, not by rows.

Determinism: bucket index and counts are exact integer facts of the
input multiset; extraction is a deterministic cumulative walk
(one window sort per group over a few hundred rows). Cross-engine
bucket parity is NOT claimed — ceil(ln(x)/ln γ) sits on a
transcendental boundary (the bm25/ngram_lm class), so the suite entry
is rows-only and accuracy/merge laws are pinned in
tests/test_quantile_sketch.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ALPHA = 0.01
# |x| at or below this collapses into the zero bucket (sign 0): the
# geometric grid cannot represent 0, and values this small are below
# any α-relative resolution anyone asks a money/latency sketch for.
DEFAULT_MIN_VALUE = 1e-9


def gamma_for(alpha: float) -> float:
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def _sign(value: Column, min_value: float) -> Column:
    return (
        F.when(F.abs(value) <= F.lit(min_value), F.lit(0))
        .when(value < 0, F.lit(-1))
        .otherwise(F.lit(1))
        .cast("tinyint")
    )


def _bucket(value: Column, alpha: float, min_value: float) -> Column:
    """ceil(log_γ(|x|)) for non-zero-bucket rows, 0 for the zero bucket
    (guarded by `when`, so log never sees a non-positive input under
    ANSI mode)."""
    ln_gamma = math.log(gamma_for(alpha))
    return (
        F.when(F.abs(value) <= F.lit(min_value), F.lit(0))
        .otherwise(F.ceil(F.log(F.abs(value)) / F.lit(ln_gamma)))
        .cast("int")
    )


def quantile_sketch_partials(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    alpha: float = DEFAULT_ALPHA,
    grain: str = "hour",
) -> DataFrame:
    """(key…, hour, sign, bucket, cnt) — the stored rollup base. One
    shuffle, map-side combined; nulls are dropped (a null measurement is
    not a sample). `hour` keeps its name whatever `grain` says so the
    merge/extract helpers compose without renames."""
    keys = key_cols or []
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .select(
            *keys,
            F.date_trunc(grain, F.col(ts_col)).alias("hour"),
            _sign(v, DEFAULT_MIN_VALUE).alias("sign"),
            _bucket(v, alpha, DEFAULT_MIN_VALUE).alias("bucket"),
        )
        .groupBy(*keys, "hour", "sign", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_quantile_sketch(
    partials: DataFrame,
    grain: str,
    hour_col: str = "hour",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Coarser-grain partials from stored partials: counts on the same
    geometric grid just ADD (the mergeability law; pinned bit-exact in
    tests). Scan cost is the partials table, never the events."""
    keys = key_cols or []
    bucket = F.date_trunc(grain, F.col(hour_col)).alias(grain)
    return (
        partials.groupBy(*keys, bucket, "sign", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _q_name(q: float) -> str:
    return "p" + f"{q * 100:g}".replace(".", "_")


def sketch_quantiles(
    partials: DataFrame,
    qs: list[float],
    group_cols: list[str],
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(group…, n, p50, p95, …) — rank-q estimates per group from the
    bucket counts. For each q the crossing bucket is the first (in value
    order) whose cumulative count exceeds q·(n−1) — the DDSketch paper's
    walk — and its estimate is sign·2γ^b/(γ+1) (0 for the zero bucket),
    within relative error α of the order statistic at index
    ⌊q·(n−1)⌋. One window sort per group over bucket-granular rows plus
    one groupBy; all q columns come from the same cumulative pass."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0,1]")
    g = gamma_for(alpha)
    # value order: negatives first, most negative (largest bucket) first
    # → (sign asc, sign*bucket asc) is a total order over bucket values
    order = [F.col("sign").asc(), (F.col("sign") * F.col("bucket")).asc()]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    wg = Window.partitionBy(*group_cols)
    est = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * (F.lit(2.0) * F.pow(F.lit(g), F.col("bucket")) / F.lit(g + 1.0))
    )
    cum = (
        partials.withColumn("_cum", F.sum("cnt").over(w))
        .withColumn("_n", F.sum("cnt").over(wg))
        .withColumn("_est", est)
    )
    aggs = [F.max("_n").alias("n")]
    for q in qs:
        rank = F.lit(float(q)) * (F.col("_n") - F.lit(1)).cast("double")
        crossing = (F.col("_cum") > rank) & (
            (F.col("_cum") - F.col("cnt")) <= rank
        )
        aggs.append(F.max(F.when(crossing, F.col("_est"))).alias(_q_name(q)))
    return cum.groupBy(*group_cols).agg(*aggs)
