"""Dimension-table maintenance: changelog → compacted snapshot, SCD2
history, and event-time-correct (versioned) enrichment.

The reference maintains its dimensions as UPSERT streams: Kafka compacted
topics keep the latest record per key (create-topics.sh:103,114 — the
user-profiles and merchant-profiles topics set `cleanup.policy=compact`),
and the Redis profile store overwrites whole profiles in place
(RedisService.java:127-145). Both give you only the LATEST version — a
transaction enriched from them sees today's profile even when scoring
yesterday's transaction (the classic training-set leak). This module is
the set-oriented, history-preserving form of those upserts:

* :func:`compact_changelog` — Kafka log compaction as a single map-side-
  combinable aggregate: latest row per key, tombstone-aware.
* :func:`scd2_history` — the warehouse's slowly-changing-dimension
  type-2 shape: every version with [effective_from, effective_to)
  validity, derived with one window pass.
* :func:`enrich_versioned` — facts joined to the profile version valid
  AT THE FACT'S EVENT TIME via the engine's merge-strategy as-of join
  (operators/joins.py:asof_join) — the leakage-free enrichment the
  feature store's training_set applies to features, extended to whole
  dimension rows.

The streaming twin (micro-batched changelog ingest into a batch_id-
partitioned store + compaction-on-read snapshot view) lives in
streaming/sinks.py (changelog_writer / changelog_snapshot_view), reusing
the exactly-once replay discipline every store sink follows.

Scale: compaction is one groupBy whose aggregate is a struct max —
map-side combined, so the shuffle carries ~one row per key per map
partition, not the changelog; SCD2 is one (key)-partitioned window sort;
enrichment is the as-of join's single |facts|+|versions| shuffle. None
of them ever collect or iterate driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .joins import asof_join


def _keys(key_cols: str | list[str]) -> list[str]:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def compact_changelog(
    changelog: DataFrame,
    key_cols: str | list[str],
    seq_col: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Latest-per-key snapshot of an upsert changelog — Kafka log
    compaction as a relational aggregate. `seq_col` orders versions
    (a sequence number or event timestamp); ties at equal seq resolve
    deterministically by the remaining payload columns (the struct max
    is a total order), so replayed/duplicated changelog rows cannot
    flip the snapshot between runs.

    `tombstone_col` (boolean) marks deletions: a key whose LATEST row is
    a tombstone is absent from the snapshot — exactly compacted-topic
    semantics, where a null-payload record deletes the key once
    compaction runs.

    Output columns = input columns, original order. One shuffle, keyed by
    the dimension key, with map-side combine (the aggregate is a plain
    max) — the reduce side sees ~#keys rows per map partition regardless
    of changelog length.
    """
    keys = _keys(key_cols)
    rest = [c for c in changelog.columns if c not in keys and c != seq_col]
    latest = changelog.groupBy(*keys).agg(
        F.max(F.struct(F.col(seq_col), *[F.col(c) for c in rest])).alias("_m")
    )
    out = latest.select(
        *[
            F.col(c) if c in keys else F.col("_m").getField(c).alias(c)
            for c in changelog.columns
        ]
    )
    if tombstone_col is not None:
        out = out.filter(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        )
    return out


def scd2_history(
    changelog: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
) -> DataFrame:
    """SCD type-2 history from an upsert changelog: one row per VERSION,
    valid over [effective_from, effective_to) — effective_to is the next
    version's timestamp, NULL for the current version (also flagged
    `is_current`). Exact (key, ts) duplicates collapse to one row first
    (latest-writer-wins via the same deterministic struct max as
    :func:`compact_changelog`), so intervals never have zero width.

    One aggregate (the dedup) + one (key)-partitioned window pass — the
    lead() frame is the incremental unbounded-preceding kind (over the
    DESCENDING order internally Spark evaluates lead as an offset, not a
    frame, so there is no O(n²) trap here).
    """
    keys = _keys(key_cols)
    rest = [c for c in changelog.columns if c not in keys and c != ts_col]
    one_per_ts = (
        changelog.groupBy(*keys, ts_col)
        .agg(F.max(F.struct(*[F.col(c) for c in rest])).alias("_m"))
        .select(
            *keys,
            ts_col,
            *[F.col("_m").getField(c).alias(c) for c in rest],
        )
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(ts_col))
    return one_per_ts.select(
        *keys,
        *rest,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def enrich_versioned(
    facts: DataFrame,
    changelog: DataFrame,
    key: str,
    fact_ts: str,
    version_ts: str,
    suffix: str = "_dim",
    tolerance: str | None = None,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Event-time-correct dimension enrichment: each fact row gets the
    dimension VERSION that was valid at the fact's own timestamp (latest
    changelog row with version_ts <= fact_ts), not the current snapshot —
    the leakage-free form of the reference's Redis profile lookup
    (RedisService.java:127-145 always answers with the latest overwrite).

    A LEFT as-of join: facts with no version yet (before the key's first
    changelog row, or outside `tolerance`) keep NULL dimension columns —
    the "default profile" branch the reference codes by hand. Ties at
    equal (key, version_ts) need `tie_break` for a deterministic winner,
    same contract as asof_join. One shuffle of |facts| + |versions| rows.
    """
    return asof_join(
        facts,
        changelog,
        key,
        left_ts=fact_ts,
        right_ts=version_ts,
        tolerance=tolerance,
        suffix=suffix,
        tie_break=tie_break,
        direction="backward",
    )
