"""Event-time windowed aggregations — SURVEY §2.5 A1-A11.

The reference implements these as Flink keyed windows with hand-written
accumulator/merge classes (WindowProcessor.java). Here each is a
`groupBy(F.window(...))` aggregation: Spark plans partial (map-side) + final
aggregation automatically, which is exactly what Flink's
`AggregateFunction.merge` does by hand — and unlike the reference's
unbounded `List<Double> amounts` accumulator (WindowProcessor.java:511, an
OOM at scale), variance here is a constant-space aggregate built from exact
decimal sums.

These run identically on a batch DataFrame or a watermarked streaming one —
in streaming, attach `withWatermark` first (streaming/watermarks.py).

Distinct counts: `countDistinct` for exact parity with the reference's
HashSet counting (WindowProcessor.java:496-510); swap `exact=False` to get
`approx_count_distinct` (HLL, constant space) for 100 TB-scale use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import dec_sum


def _ndv(col: str, exact: bool) -> Column:
    return F.countDistinct(col) if exact else F.approx_count_distinct(col)


def exact_stddev_pop(amount: str) -> tuple[Column, Column, Column]:
    """(sum, sumsq, helper) building blocks for order-insensitive population
    stddev — the reference uses population variance (WindowProcessor.java:447-457)."""
    a = F.col(amount)
    s1 = F.sum(a.cast("decimal(18,2)")).cast("double")
    s2 = F.sum((a * a).cast("decimal(28,4)")).cast("double")
    return s1, s2, F.count("*").cast("double")


def velocity_windows(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    amount: str = "amount",
    ndv_col: str = "merchant_id",
    size: str = "5 minutes",
    slide: str = "1 minute",
    exact: bool = True,
) -> DataFrame:
    """A1 — sliding per-entity velocity (WindowProcessor.java:36-49,248-352)."""
    return (
        df.groupBy(F.window(ts, size, slide).alias("w"), entity)
        .agg(
            F.count("*").alias("tx_count"),
            dec_sum(amount).alias("total_amount"),
            _ndv(ndv_col, exact).alias("distinct_counterparties"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            entity,
            "tx_count",
            "total_amount",
            "distinct_counterparties",
        )
    )


def tumbling_stats(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    amount: str = "amount",
    size: str = "1 hour",
    ndv_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """A2/A9/A10 — tumbling per-key stats incl. exact population stddev
    (WindowProcessor.java:55-68,357-484; RedisTransactionSink.java:164-262)."""
    s1, s2, n = exact_stddev_pop(amount)
    aggs = [
        F.count("*").alias("tx_count"),
        s1.alias("_s1"),
        s2.alias("_s2"),
    ]
    if ndv_col:
        aggs.append(_ndv(ndv_col, exact).alias("distinct_counterparties"))
    out = df.groupBy(F.window(ts, size).alias("w"), key).agg(*aggs)
    cnt = F.col("tx_count").cast("double")
    mean = F.col("_s1") / cnt
    var_pop = F.col("_s2") / cnt - mean * mean
    return out.select(
        F.col("w.start").alias("window_start"),
        key,
        "tx_count",
        F.col("_s1").alias("total_amount"),
        mean.alias("avg_amount"),
        F.sqrt(F.greatest(F.round(var_pop, 8), F.lit(0.0))).alias("stddev_pop_amount"),
        *(["distinct_counterparties"] if ndv_col else []),
    )


def session_aggregate(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    amount: str = "amount",
    gap: str = "30 minutes",
) -> DataFrame:
    """A3 — session windows, 30-min gap (WindowProcessor.java:74-87,
    JobConfig.java:52). `session_window` end = last event + gap."""
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), entity)
        .agg(F.count("*").alias("event_count"), dec_sum(amount).alias("total_amount"))
        .select(
            entity,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
            "total_amount",
        )
    )


def keyed_tumbling_counts(
    df: DataFrame,
    key_col: Column,
    key_name: str,
    ts: str = "ts",
    amount: str = "amount",
    size: str = "15 minutes",
) -> DataFrame:
    """A4/A5/A7 — tumbling counts over a derived clustering key (geo grid
    cell, pattern key, amount bucket; WindowProcessor.java:93-241)."""
    return (
        df.withColumn(key_name, key_col)
        .groupBy(F.window(ts, size).alias("w"), key_name)
        .agg(F.count("*").alias("tx_count"), dec_sum(amount).alias("total_amount"))
        .select(F.col("w.start").alias("window_start"), key_name, "tx_count", "total_amount")
    )


def high_frequency(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    size: str = "5 minutes",
    min_count: int = 10,
) -> DataFrame:
    """A6+F5 — tumbling count per entity, HAVING count >= threshold
    (WindowProcessor.java:132-147 + :144). The CountTrigger early-firing
    variant lives in streaming/stateful.py."""
    return (
        df.groupBy(F.window(ts, size).alias("w"), entity)
        .agg(F.count("*").alias("tx_count"))
        .filter(F.col("tx_count") >= min_count)
        .select(F.col("w.start").alias("window_start"), entity, "tx_count")
    )


def feature_statistics(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """A11 — per-feature running stats (FeatureStore.java:204-321, Welford at
    :262-281). One pass, constant space; exact decimal sums replace Welford
    while keeping identical results."""
    rows = []
    for c in numeric_cols:
        a = F.col(c)
        rows.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.count(a).alias("n"),
                F.sum(a.cast("decimal(28,6)")).cast("double").alias("sum"),
                F.min(a).cast("double").alias("min"),
                F.max(a).cast("double").alias("max"),
                (F.count("*") - F.count(a)).alias("null_count"),
            )
        )
    return df.agg(F.array(*rows).alias("stats")).select(
        F.explode("stats").alias("s")
    ).select("s.*").withColumn("mean", F.col("sum") / F.col("n").cast("double"))
