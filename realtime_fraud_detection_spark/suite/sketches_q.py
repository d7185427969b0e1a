"""Sketch-rollup queries (rows-only tail: DataSketches HLL estimates
have no DuckDB twin — DuckDB's approx_count_distinct is a different HLL
implementation; accuracy and the mergeability law are pinned by
tests/test_sketches.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table


# Per-hour HLL partials rolled to daily distinct-user estimates — the
# stored-partials pattern (rollup scans sketch blobs, never events).
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import (
        hourly_distinct_sketches,
        rollup_distinct_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_distinct_sketches(ev, "ts", "user_id")
    return (
        rollup_distinct_estimate(hourly, "day")
        .select("day", "users_est")
        .orderBy("day")
    )


# Per-hour DDSketch bucket counts rolled to daily p50/p95/p99 value
# estimates — the quantile dual of q_sketch_rollup (stored partials,
# rollups sum counts instead of rescanning events). Rows-only: the
# bucket boundary ceil(ln(x)/ln γ) is transcendental (the bm25 class);
# the α-relative-error guarantee and the bit-exact mergeability law are
# pinned by tests/test_quantile_sketch.py.
def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantile_sketch import (
        merge_quantile_sketch,
        quantile_sketch_partials,
        sketch_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = quantile_sketch_partials(ev, "ts", "value", alpha=0.01)
    daily = merge_quantile_sketch(hourly, "day")
    return (
        sketch_quantiles(daily, [0.5, 0.95, 0.99], ["day"], alpha=0.01)
        .orderBy("day")
    )


# Per-hour Misra–Gries summaries rolled to daily heavy-hitter lists —
# the third stored-partials sketch (truncated top-k lists don't merge;
# MG summaries do, with a proof: every item above n/(capacity+1) share
# survives any rollup). Integer-only, so unlike the HLL/DDSketch rows
# it has a BIT-EXACT DuckDB twin — oracled (promoted into the driver
# window round 10; the same SQL formulation was pinned in
# tests/test_heavy_hitters.py since r9).
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy_hitters import (
        frequent_items_partials,
        merge_frequent_items,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = frequent_items_partials(ev, "ts", "user_id", capacity=16)
    daily = merge_frequent_items(hourly, "day", capacity=16)
    return daily.orderBy("day", F.col("cnt").desc(), "item")


# Per-hour Count-Min grids rolled to daily point-frequency UPPER bounds
# for a deterministic probe set — the fourth stored-partials sketch and
# the dual of q_heavy_hitters (MG stores lower bounds for the items it
# kept; CM upper-bounds ANY item, so together they bracket every count).
# Integer+md5 only → bit-exact DuckDB twin (promoted into the driver
# window round 10; the same simulation was pinned in
# tests/test_count_min.py since r9).
def q_cm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.count_min import cm_estimate, cm_partials, merge_cm

    ev = load_table(spark, sf_dir, "events")
    hourly = cm_partials(ev, "user_id", ts_col="ts", grain="hour")
    # the stored-table stand-in: production probes a PERSISTED partials
    # table; composing build+probe in one plan would otherwise recompute
    # the build for cm_estimate's window-list derivation (plan-pinned:
    # events scans == 2 in tests/test_suite_plans.py)
    daily = (
        merge_cm(hourly, "day")
        .withColumnRenamed("day", "hour")
        .localCheckpoint(eager=False)
    )
    probe = ev.select("user_id").distinct().filter(F.col("user_id") % 20 == 0)
    return (
        cm_estimate(daily, probe, "user_id", ["hour"])
        .withColumnRenamed("hour", "day")
        .orderBy("day", "user_id")
    )


# ---------------------------------------------------------------------------
# Round-11 panel merges (oracle-window density, same discipline as the
# doc_signatures/near_dup_pairs merges):
#   * count_brackets = heavy_hitters ∪ cm_rollup, method-tagged — the
#     MG daily heavy-hitter LOWER bounds and the CM point-frequency UPPER
#     bounds that together bracket every count (the certification
#     tests/test_count_min.py::test_count_brackets pins). Both halves
#     are integer+md5 only, so the merged query stays bit-exact ORACLED
#     (the union of the two r10 oracles) in ONE window slot, freeing a
#     slot for the promoted scd2_enrich.
#   * sketch_panel = sketch_rollup ∪ quantile_rollup, method-tagged —
#     the two estimate-valued sketch rollups (HLL distinct users,
#     DDSketch value quantiles) over the same day grain; rows-only for
#     the same reasons as the halves (different HLL impl than DuckDB;
#     transcendental bucket boundary).
# ---------------------------------------------------------------------------
def q_count_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MG lower ∪ CM upper, built from ONE shared exact-count table (r14,
    guide §2.4 — the before-plan re-scanned events 6× and re-shuffled per
    sketch, 19 Exchanges): both sketches are pure functions of the exact
    per-(hour, user) counts — MG compresses them, CM cells are their sums
    over hash buckets (the mergeability law the oracle already replays:
    merge(build(hour)) == build(day)), and the probe list is exactly the
    count table's key set (`x % 20 == 0` is NULL-rejecting, so deriving
    the distinct ids from the null-filtered counts changes nothing). The
    count table and the two small sketch stores are lazily checkpointed —
    materialized inside the first consuming job, shared by every branch,
    rebuilt from parquet on every fresh call (nothing cross-run)."""
    from ..operators.count_min import cm_estimate, cm_partials
    from ..operators.heavy_hitters import (
        frequent_items_partials,
        merge_frequent_items,
    )

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("user_id").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # MG half — identical pipeline to q_heavy_hitters, partials store
    # checkpointed so the merge's three references (summed counters,
    # totals, sentinels) read blocks instead of re-running the compress
    mg_partials = frequent_items_partials(
        ev, "ts", "user_id", capacity=16, counts=counts
    ).localCheckpoint(eager=False)
    mg = merge_frequent_items(mg_partials, "day", capacity=16)
    # CM half — day grid built directly from the shared counts (bit-equal
    # to merge(hour build) by the pinned mergeability law); checkpointed
    # as the stored-table stand-in exactly like q_cm_rollup
    daily = cm_partials(
        ev, "user_id", ts_col="ts", grain="day", counts=counts
    ).localCheckpoint(eager=False)
    probe = (
        counts.select(F.col("item").alias("user_id"))
        .distinct()
        .filter(F.col("user_id") % 20 == 0)
    )
    cm = (
        cm_estimate(daily, probe, "user_id", ["hour"])
        .withColumnRenamed("hour", "day")
    )
    return (
        mg.select(F.lit("mg_lower").alias("method"), "day", "item", "cnt", "n")
        .unionByName(
            cm.select(
                F.lit("cm_upper").alias("method"),
                "day",
                F.col("user_id").alias("item"),
                F.col("est").alias("cnt"),
                F.lit(None).cast("long").alias("n"),
            )
        )
        .orderBy("method", "day", F.col("cnt").desc(), "item")
    )


def q_sketch_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    hll = q_sketch_rollup(spark, sf_dir).select(
        F.lit("hll").alias("method"),
        "day",
        F.lit("distinct_users").alias("metric"),
        F.col("users_est").cast("double").alias("value"),
    )
    # stack() unpivots all three quantile columns in ONE pass — a
    # union-of-selects here would recompute the whole DDSketch rollup
    # once per branch (three sketch builds for one panel)
    quant = q_quantile_rollup(spark, sf_dir).select(
        F.lit("ddsketch").alias("method"),
        "day",
        F.expr(
            "stack(3, 'p50', CAST(p50 AS DOUBLE), 'p95', CAST(p95 AS DOUBLE),"
            " 'p99', CAST(p99 AS DOUBLE)) AS (metric, value)"
        ),
    )
    return hll.unionByName(quant).orderBy("method", "day", "metric")


QUERIES = {
    "sketch_panel": q_sketch_panel,
    "count_brackets": q_count_brackets,
}


# Misra–Gries is integer-only (counts, ranks, subtraction), so the whole
# hourly-build + daily-merge pipeline has a bit-exact SQL twin: exact
# per-group counts → rank → subtract the (capacity+1)-th count → keep
# positives, plus one NULL-item sentinel per group carrying the group's
# total mass n (the total-mass invariant — merge_frequent_items rebuilds
# sentinels from per-window totals so all-tie compression wipes can't
# lose mass). Daily n = sum of hourly window totals, NOT the stored
# counter mass.
_MG_CAP = 16
_MG_COMPRESS = """
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY cnt DESC, item ASC) AS rn
        FROM counts
    ), cutoff AS (
        SELECT *,
               MAX(CASE WHEN rn = {k1} THEN cnt ELSE 0 END)
                   OVER (PARTITION BY g) AS c
        FROM ranked
    )
    SELECT g, item, CAST(cnt - c AS BIGINT) AS cnt
    FROM cutoff WHERE rn <= {k} AND cnt > c
"""

SQL_HEAVY_HITTERS = f"""
WITH counts AS (
    SELECT date_trunc('hour', ts) AS g, user_id AS item,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
), hourly AS (
    WITH {_MG_COMPRESS.format(k=_MG_CAP, k1=_MG_CAP + 1)}
), hour_totals AS (
    SELECT date_trunc('hour', ts) AS g, CAST(COUNT(*) AS BIGINT) AS wn
    FROM events GROUP BY 1
), day_totals AS (
    SELECT CAST(date_trunc('day', g) AS TIMESTAMP) AS day,
           CAST(SUM(wn) AS BIGINT) AS n
    FROM hour_totals GROUP BY 1
), daily AS (
    WITH counts AS (
        SELECT CAST(date_trunc('day', g) AS TIMESTAMP) AS g, item,
               CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM hourly GROUP BY 1, 2
    ), {_MG_COMPRESS.format(k=_MG_CAP, k1=_MG_CAP + 1)}
)
SELECT t.day, d.item, d.cnt, t.n
FROM daily d JOIN day_totals t ON d.g = t.day
UNION ALL
SELECT day, NULL AS item, CAST(0 AS BIGINT) AS cnt, n FROM day_totals
ORDER BY day, cnt DESC, item
"""


def _sql_cm_rollup() -> str:
    """DuckDB simulation of the full CM build (hour grain) → merge (day)
    → probe pipeline: md5-salted counter coordinates are engine-identical
    (functions/hashing.md5_bigint_sql), counters are exact integers, and
    merge-then-probe equals probe-of-day-built-grid (the mergeability law
    pinned bit-exact in tests/test_count_min.py), so the oracle builds the
    day grid directly."""
    from ..operators.count_min import DEFAULT_DEPTH, cm_col_sql

    rows = " UNION ALL ".join(
        f"SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, {i} AS depth,"
        f" {cm_col_sql('user_id', i)} AS col FROM events"
        for i in range(DEFAULT_DEPTH)
    )
    probes = " UNION ALL ".join(
        f"SELECT user_id, {i} AS depth, {cm_col_sql('user_id', i)} AS col"
        " FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 20 = 0)"
        for i in range(DEFAULT_DEPTH)
    )
    return f"""
WITH cells AS (
  SELECT d, depth, col, COUNT(*) AS cnt FROM ({rows}) GROUP BY 1, 2, 3
),
probes AS ({probes}),
wins AS (SELECT DISTINCT d FROM cells)
SELECT wins.d AS day, probes.user_id,
       CAST(MIN(COALESCE(cells.cnt, 0)) AS BIGINT) AS est
FROM wins CROSS JOIN probes
LEFT JOIN cells ON cells.d = wins.d
               AND cells.depth = probes.depth
               AND cells.col = probes.col
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _sql_count_brackets() -> str:
    """Union of the two r10 oracles, method-tagged — each half keeps its
    bit-exact SQL unchanged (MG compress simulation / CM grid build);
    subquery ORDER BYs are dropped (the driver hash sorts rows)."""
    mg = SQL_HEAVY_HITTERS.rsplit("ORDER BY", 1)[0]
    cm = _sql_cm_rollup().rsplit("ORDER BY", 1)[0]
    return f"""
SELECT 'mg_lower' AS method, day, item, cnt, n FROM ({mg})
UNION ALL
SELECT 'cm_upper' AS method, day, user_id AS item, est AS cnt,
       CAST(NULL AS BIGINT) AS n
FROM ({cm})
ORDER BY method, day, cnt DESC, item
"""


ORACLES: dict[str, str] = {
    "count_brackets": _sql_count_brackets(),
}
