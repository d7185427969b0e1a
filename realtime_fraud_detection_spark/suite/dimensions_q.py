"""Dimension-maintenance queries: changelog compaction, SCD2 history and
event-time-correct (versioned) enrichment over the events fixture —
operators/dimensions.py, the history-preserving form of the reference's
compacted profile topics (create-topics.sh:103,114) and Redis profile
overwrites (RedisService.java:127-145).

Rows-only (the driver's 50-entry oracle window is full); latest-wins /
tombstone / interval semantics plus brute-force as-of parity are pinned
bit-exact in tests/test_dimensions.py, and the as-of kernel underneath is
the oracled `asof_join` suite query.
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


QUERIES = {"scd2_enrich": q_scd2_enrich}
ORACLES: dict[str, str] = {}
