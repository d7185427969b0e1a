"""Feature store — SURVEY §2.1 S7/§2.5 A11's Redis+Postgres feature plumbing
(FeatureStore.java:29-321, init.sql:59-94) restated for Spark:

  * OFFLINE store: partitioned parquet tables of (entity, feature, value,
    event_ts, write_ts) — append-only, time-travel by write_ts filter; the
    Postgres feature_groups/features/feature_values DDL collapses into one
    long-format table plus this module's statistics view.
  * ONLINE store: the latest value per (entity, feature) as a broadcast-able
    small DataFrame — the reference's per-record Redis hgetAll becomes a
    broadcast join (the same move as J5 profile enrichment).
  * Statistics: operators/aggregations.feature_statistics (exact, one-pass)
    replaces the reference's incremental Welford loop.

TTL semantics (features 2 h, RedisService.java:46-49) map to a write_ts
filter on read rather than background expiry — storage-level TTL is an
operational concern (table retention policy), not query logic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class FeatureStore:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def _path(self, group: str) -> str:
        return os.path.join(self.base_dir, group)

    def write_features(
        self,
        df: DataFrame,
        group: str,
        entity_col: str,
        feature_cols: list[str],
        ts_col: str = "ts",
    ) -> None:
        """Wide row → long (entity, feature, value) append, partitioned by
        feature name so single-feature reads prune files."""
        stacked = df.select(
            F.col(entity_col).alias("entity_id"),
            F.col(ts_col).alias("event_ts"),
            F.current_timestamp().alias("write_ts"),
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(c) for c in feature_cols]),
                    F.array(*[F.col(c).cast("double") for c in feature_cols]),
                )
            ).alias("feature", "value"),
        )
        stacked.write.partitionBy("feature").mode("append").parquet(self._path(group))

    def read_offline(self, spark: SparkSession, group: str, features: list[str] | None = None) -> DataFrame:
        df = spark.read.parquet(self._path(group))
        if features:
            df = df.filter(F.col("feature").isin(features))  # partition pruning
        return df

    def online_view(self, spark: SparkSession, group: str, ttl_hours: float | None = None) -> DataFrame:
        """Latest value per (entity, feature) — broadcast this against a
        stream for online serving. `ttl_hours` mirrors the Redis feature TTL
        (2 h) as a write-recency filter."""
        df = self.read_offline(spark, group)
        if ttl_hours is not None:
            df = df.filter(
                F.col("write_ts") >= F.current_timestamp() - F.expr(f"interval {ttl_hours} hours")
            )
        w = Window.partitionBy("entity_id", "feature").orderBy(
            F.desc("event_ts"), F.desc("write_ts")
        )
        return (
            df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )

    def serve(self, tx: DataFrame, online: DataFrame, features: list[str], entity_col: str) -> DataFrame:
        """Enrich a (possibly streaming) DataFrame with the latest feature
        values — pivot the long store back to columns and broadcast join."""
        pivoted = (
            online.filter(F.col("feature").isin(features))
            .groupBy("entity_id")
            .pivot("feature", features)
            .agg(F.first("value"))
        )
        return tx.join(
            F.broadcast(pivoted), tx[entity_col] == pivoted.entity_id, "left"
        ).drop("entity_id")

    def training_set(
        self,
        spark: SparkSession,
        labels: DataFrame,
        group: str,
        features: list[str],
        entity_col: str,
        ts_col: str = "ts",
    ) -> DataFrame:
        """Point-in-time-correct training assembly — the anti-leakage
        join: every label row gets, per requested feature, the LATEST
        value whose event_ts <= the label's timestamp (ties at equal ts
        include the feature; equal-event_ts duplicates resolve by latest
        write_ts). A plain latest-value join would leak future features
        into past labels — the classic offline/online skew bug.

        ONE pass for all features (not one as-of join per feature): the
        label probes replicate per feature name (a broadcast of the tiny
        feature list), union with the long store, and a single
        (entity, feature)-keyed window forward-fills the last value onto
        each probe — one shuffle total, the asof_join union trick at
        composite-key granularity. Output: the label rows with one
        column per feature (null where no value existed yet).
        """
        # the value rides inside a struct PRESENCE marker: a store row's
        # struct is never null even when its value is (an explicit
        # unset/correction write), so the ignorenulls forward-fill skips
        # only PROBE rows — an explicit null write shadows older values
        # instead of letting a stale one leak onto later labels
        store = self.read_offline(spark, group, features).select(
            "entity_id",
            "feature",
            F.col("event_ts").alias("_pit_ts"),
            "write_ts",
            F.struct(F.col("value")).alias("_sv"),
            F.lit(0).alias("_is_probe"),
            F.lit(None).cast("long").alias("_rid"),
        )
        # stable per-row id for the pivot-back (materialized so the id
        # assignment cannot be recomputed differently downstream)
        lab = labels.withColumn(
            "_rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
        fnames = spark.createDataFrame([(f,) for f in features], "feature string")
        probes = (
            lab.select(
                F.col(entity_col).alias("entity_id"),
                F.col(ts_col).alias("_pit_ts"),
                "_rid",
            )
            .crossJoin(F.broadcast(fnames))
            .select(
                "entity_id",
                "feature",
                "_pit_ts",
                F.lit(None).cast("timestamp").alias("write_ts"),
                F.lit(None).cast("struct<value:double>").alias("_sv"),
                F.lit(1).alias("_is_probe"),
                "_rid",
            )
        )
        # store rows sort BEFORE probes at equal ts (<= semantics);
        # among store rows at one ts, later write_ts sorts later so
        # last_value picks it
        w = (
            Window.partitionBy("entity_id", "feature")
            .orderBy(F.col("_pit_ts").asc(), F.col("_is_probe").asc(), F.col("write_ts").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = (
            store.unionByName(probes)
            .withColumn(
                "_v", F.last("_sv", ignorenulls=True).over(w).getField("value")
            )
            .filter(F.col("_is_probe") == 1)
        )
        wide = filled.groupBy("_rid").pivot("feature", features).agg(F.first("_v"))
        return lab.join(wide, "_rid", "left").drop("_rid")

    def categorical_statistics(
        self, df: DataFrame, categorical_cols: list[str], top_n: int = 20
    ) -> DataFrame:
        """A11's categorical branch (FeatureStore.java:41-43,204-321):
        per-feature value frequencies, top-N by count with deterministic
        tie-break."""
        stacked = df.select(
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(c) for c in categorical_cols]),
                    F.array(*[F.col(c).cast("string") for c in categorical_cols]),
                )
            ).alias("feature", "value")
        )
        counts = stacked.groupBy("feature", "value").count()
        w = Window.partitionBy("feature").orderBy(F.desc("count"), F.asc("value"))
        return counts.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= top_n
        )

    def statistics(self, spark: SparkSession, group: str) -> DataFrame:
        """A11 — per-feature stats over the offline store (FeatureStore.java:
        204-321), exact and single-pass."""
        df = self.read_offline(spark, group)
        return df.groupBy("feature").agg(
            F.count("value").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            (F.count("*") - F.count("value")).alias("null_count"),
        ).withColumn("mean", F.col("sum") / F.col("n").cast("double"))
