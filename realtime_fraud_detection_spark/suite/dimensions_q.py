"""Dimension-maintenance queries: changelog compaction, SCD2 history and
event-time-correct (versioned) enrichment over the events fixture —
operators/dimensions.py, the history-preserving form of the reference's
compacted profile topics (create-topics.sh:103,114) and Redis profile
overwrites (RedisService.java:127-145).

ORACLED since r11 (the count_brackets merge freed the window slot): the
whole pipeline is integer/timestamp/double-comparison arithmetic — no
transcendentals — so the DuckDB twin is bit-exact. Oracle notes:
  * the as-of carry is replayed with the SAME union-window trick the
    Spark operator uses (last_value IGNORE NULLS over ts, is_left), not
    DuckDB's native ASOF JOIN — at duplicate (user_id, ts) changelog
    rows the operator's tie-break is MIN (risk_score, change_type)
    lexicographic (asof_join docstring), which the window's
    risk DESC, change DESC sort reproduces exactly;
  * current_score replays compact_changelog's MAX (ts, risk, change)
    struct-max (latest-wins, max tie-break — deliberately the opposite
    convention from the as-of min-wins tie);
  * n_versions = COUNT(DISTINCT ts) per user (scd2_history collapses
    exact (key, ts) duplicates before versioning).
Latest-wins / tombstone / interval semantics plus brute-force as-of
parity are additionally pinned in tests/test_dimensions.py, and the
as-of kernel underneath is also the oracled `asof_join` suite query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dimensions import (
    compact_changelog,
    enrich_versioned,
    scd2_history,
)
from ..sources.testdata import load_table


# ---------------------------------------------------------------------------
# Versioned profile enrichment: signup/error events act as the profile
# changelog (each carries a new risk score for the user), purchases are
# the facts. Every purchase gets (a) the profile version valid AT ITS OWN
# EVENT TIME via the as-of join, (b) the CURRENT snapshot score, and
# (c) the user's version count from the SCD2 history — so the output
# makes the leak visible: rows where asof_score != current_score are
# exactly the facts a snapshot join would have backdated.
# ---------------------------------------------------------------------------
def q_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    changelog = ev.filter(
        F.col("event_type").isin("signup", "error")
    ).select(
        "user_id",
        "ts",
        F.col("value").alias("risk_score"),
        F.col("event_type").alias("change_type"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    enriched = enrich_versioned(
        facts,
        changelog,
        "user_id",
        fact_ts="ts",
        version_ts="ts",
        tie_break=["risk_score", "change_type"],
    )
    current = compact_changelog(changelog, "user_id", "ts").select(
        "user_id", F.col("risk_score").alias("current_score")
    )
    versions = (
        scd2_history(changelog, "user_id", "ts")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_versions"))
    )
    return (
        enriched.join(F.broadcast(current), "user_id", "left")
        .join(F.broadcast(versions), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("ts_dim").alias("profile_ts"),
            F.col("risk_score_dim").alias("asof_score"),
            "current_score",
            F.coalesce("n_versions", F.lit(0)).alias("n_versions"),
            (
                F.col("risk_score_dim").isNotNull()
                & (F.col("risk_score_dim") != F.col("current_score"))
            ).cast("int").alias("would_leak"),
        )
        .orderBy("event_id")
    )


SQL_SCD2_ENRICH = """
WITH changelog AS (
  SELECT user_id, ts, value AS risk_score, event_type AS change_type
  FROM events WHERE event_type IN ('signup', 'error')
), facts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), u AS (
  SELECT user_id, ts AS t, 0 AS is_left, CAST(NULL AS BIGINT) AS event_id,
         risk_score, change_type, ts AS dim_ts
  FROM changelog
  UNION ALL
  SELECT user_id, ts, 1, event_id,
         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP)
  FROM facts
), filled AS (
  SELECT user_id, t, is_left, event_id,
         last_value(risk_score IGNORE NULLS) OVER w AS asof_score,
         last_value(dim_ts IGNORE NULLS) OVER w AS profile_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY t, is_left, risk_score DESC, change_type DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), current AS (
  SELECT user_id, risk_score AS current_score
  FROM (SELECT user_id, risk_score,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, risk_score DESC,
                                           change_type DESC) AS rn
        FROM changelog)
  WHERE rn = 1
), versions AS (
  SELECT user_id, COUNT(DISTINCT ts) AS n_versions
  FROM changelog GROUP BY 1
)
SELECT f.event_id, f.user_id, f.t AS ts, f.profile_ts, f.asof_score,
       c.current_score,
       COALESCE(v.n_versions, CAST(0 AS BIGINT)) AS n_versions,
       CAST(f.asof_score IS NOT NULL
            AND f.asof_score != c.current_score AS INTEGER) AS would_leak
FROM filled f
LEFT JOIN current c USING (user_id)
LEFT JOIN versions v USING (user_id)
WHERE f.is_left = 1
ORDER BY f.event_id
"""

QUERIES = {"scd2_enrich": q_scd2_enrich}
ORACLES: dict[str, str] = {"scd2_enrich": SQL_SCD2_ENRICH}
