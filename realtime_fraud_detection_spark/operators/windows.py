"""Per-row analytic windows — SURVEY §2.4 W1-W5.

The reference keeps per-entity rolling context in Redis (capped lists
RedisService.java:296-321, rolling counters RedisTransactionSink.java:87-135,
lag-style features feature_processor.py:74-85). In batch these are classic
SQL window specs; Spark executes them with a single hash-partition shuffle on
the entity key, then sorted runs per partition — at 100 TB this is one
shuffle, not 100 TB of Redis RPCs.

All money aggregations go through DECIMAL so partial-aggregation order can't
perturb the result (exact arithmetic; cast to double only at the end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive (exact) sum of a 2-dp money column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def entity_time_window(entity: str, ts: str = "ts") -> WindowSpec:
    return Window.partitionBy(entity).orderBy(F.unix_micros(F.col(ts)))


def last_n_per_entity(df: DataFrame, entity: str, ts: str, n: int,
                      tiebreak: str) -> DataFrame:
    """W1 — last-N rows per entity (Redis lpush+ltrim to 100/500,
    RedisService.java:296-321)."""
    w = Window.partitionBy(entity).orderBy(F.desc(ts), F.desc(tiebreak))
    return (
        df.withColumn("recency_rank", F.row_number().over(w))
        .filter(F.col("recency_rank") <= n)
    )


def rolling_range(df: DataFrame, entity: str, ts: str, amount: str,
                  seconds: int, prefix: str) -> DataFrame:
    """W2 — trailing time-range count/sum per entity
    (RedisTransactionSink.java:87-135's 5min/1h/24h counters).

    RANGE frame over epoch-microseconds: [t - seconds, t], tie rows (peers)
    included — identical to SQL RANGE semantics.
    """
    return rolling_ranges(df, entity, ts, amount, {prefix: seconds})


def rolling_ranges(df: DataFrame, entity: str, ts: str, amount: str,
                   windows: dict[str, int]) -> DataFrame:
    """Several trailing windows in one pass: one shuffle, ONE sort, one
    Window node per frame — the multi-counter form of W2/A8. Computing each
    frame in separate withColumn chains plants a fresh `unix_micros(ts)`
    sort key per frame, which defeats Spark's sort-elimination and re-sorts
    per Window (observed: 4 Sorts for 2 frames); a shared materialized sort
    column restores `Exchange → Sort → Window×k`.
    """
    out = df.withColumn("_um", F.unix_micros(F.col(ts)))
    cols = []
    for prefix, seconds in windows.items():
        w = (
            Window.partitionBy(entity)
            .orderBy("_um")
            .rangeBetween(-seconds * 1_000_000, 0)
        )
        cols.append(F.count("*").over(w).alias(f"{prefix}_count"))
        cols.append(
            F.sum(F.col(amount).cast("decimal(18,2)")).over(w).cast("double").alias(f"{prefix}_amount")
        )
    return out.select("*", *cols).drop("_um")


def time_since_last(df: DataFrame, entity: str, ts: str,
                    out: str = "micros_since_last") -> DataFrame:
    """W3 — time_since_last_transaction (feature_processor.py:85)."""
    w = entity_time_window(entity, ts)
    um = F.unix_micros(F.col(ts))
    return df.withColumn(out, um - F.lag(um).over(w))


def first_seen_flag(df: DataFrame, entity: str, attr: str, ts: str,
                    tiebreak: str, out: str = "is_first_seen") -> DataFrame:
    """W4 — new-merchant-for-user flag (graph_neural_network.py:386-387):
    first occurrence of `attr` within `entity`'s history."""
    w = Window.partitionBy(entity, attr).orderBy(ts, tiebreak)
    return df.withColumn(out, F.row_number().over(w) == 1)


def amount_profile(df: DataFrame, entity: str, amount: str,
                   ts: str) -> DataFrame:
    """W5 — amount percentile + z-score vs the entity's own history
    (feature_processor.py:74-75).

    The z-score's mean/stddev are built from exact decimal sums (sum and
    sum-of-squares), so the result is bit-for-bit deterministic regardless of
    aggregation order — stddev_samp over doubles would not be.
    """
    w = Window.partitionBy(entity)
    worder = Window.partitionBy(entity).orderBy(amount)
    a = F.col(amount)
    n = F.count("*").over(w).cast("double")
    s1 = F.sum(a.cast("decimal(18,2)")).over(w).cast("double")
    s2 = F.sum((a * a).cast("decimal(28,4)")).over(w).cast("double")
    mean = s1 / n
    var_samp = (s2 - s1 * s1 / n) / F.nullif(n - 1, F.lit(0.0))
    std = F.sqrt(F.greatest(var_samp, F.lit(0.0)))
    return (
        df.withColumn("amount_pct_rank", F.percent_rank().over(worder))
        .withColumn("entity_avg_amount", mean)
        .withColumn(
            "amount_zscore",
            F.round((a - mean) / F.nullif(std, F.lit(0.0)), 6),
        )
    )
