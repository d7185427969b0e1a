"""Changelog→snapshot compaction, SCD2 history and versioned enrichment
(operators/dimensions.py + the streaming changelog store in
streaming/sinks.py): latest-wins + tombstone semantics, deterministic tie
resolution, interval correctness, brute-force as-of parity for the
event-time enrichment, stream==batch snapshot parity on a two-batch
changelog, and replay idempotency."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.dimensions import (
    compact_changelog,
    enrich_versioned,
    scd2_history,
)
from realtime_fraud_detection_spark.streaming import sinks as SK


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


CHANGELOG = [
    (1, "2024-01-01T00:00:00", "bronze", 10.0, False),
    (1, "2024-01-02T00:00:00", "silver", 20.0, False),
    (1, "2024-01-03T00:00:00", "gold", 30.0, False),
    (2, "2024-01-01T12:00:00", "bronze", 5.0, False),
    (2, "2024-01-04T00:00:00", None, None, True),  # tombstone deletes key 2
    (3, "2024-01-02T06:00:00", "silver", 15.0, False),
]
SCHEMA = "user_id long, ts timestamp, tier string, score double, deleted boolean"


def _changelog(spark, rows=None):
    rows = rows if rows is not None else CHANGELOG
    return spark.createDataFrame(
        [(u, _ts(t), tier, sc, d) for u, t, tier, sc, d in rows], SCHEMA
    )


def test_compact_latest_wins_and_tombstones(spark):
    snap = {
        r["user_id"]: (r["tier"], r["score"])
        for r in compact_changelog(
            _changelog(spark), "user_id", "ts", tombstone_col="deleted"
        ).collect()
    }
    assert snap == {1: ("gold", 30.0), 3: ("silver", 15.0)}  # key 2 deleted
    # without tombstone handling the deletion row is just the latest version
    raw = {
        r["user_id"]: r["deleted"]
        for r in compact_changelog(_changelog(spark), "user_id", "ts").collect()
    }
    assert raw[2] is True and raw[1] is False


def test_compact_equal_seq_ties_resolve_deterministically(spark):
    # two rows at the SAME (key, seq): the max payload struct wins — the
    # same result on any partitioning / arrival order
    rows = [
        (9, "2024-01-01T00:00:00", "aaa", 1.0, False),
        (9, "2024-01-01T00:00:00", "zzz", 2.0, False),
    ]
    for perm in (rows, rows[::-1]):
        got = compact_changelog(
            _changelog(spark, perm).repartition(7), "user_id", "ts"
        ).collect()
        assert len(got) == 1 and got[0]["tier"] == "zzz"


def test_scd2_intervals(spark):
    hist = {
        (r["user_id"], r["effective_from"]): (
            r["tier"],
            r["effective_to"],
            r["is_current"],
        )
        for r in scd2_history(_changelog(spark), "user_id", "ts").collect()
    }
    assert hist[(1, _ts("2024-01-01T00:00:00"))] == (
        "bronze",
        _ts("2024-01-02T00:00:00"),
        False,
    )
    assert hist[(1, _ts("2024-01-02T00:00:00"))] == (
        "silver",
        _ts("2024-01-03T00:00:00"),
        False,
    )
    assert hist[(1, _ts("2024-01-03T00:00:00"))] == ("gold", None, True)
    assert hist[(3, _ts("2024-01-02T06:00:00"))] == ("silver", None, True)
    # the tombstone row is a version too: it CLOSES key 2's bronze interval
    assert hist[(2, _ts("2024-01-01T12:00:00"))][1] == _ts("2024-01-04T00:00:00")


def test_enrich_versioned_matches_brute_force(spark):
    facts = [
        (100, 1, "2023-12-31T00:00:00"),  # before any version -> NULL
        (101, 1, "2024-01-01T00:00:00"),  # exactly at v1 -> bronze (<=)
        (102, 1, "2024-01-02T12:00:00"),  # between v2 and v3 -> silver
        (103, 1, "2024-05-01T00:00:00"),  # after last -> gold
        (104, 2, "2024-01-02T00:00:00"),  # key 2 mid-life -> bronze
        (105, 4, "2024-01-02T00:00:00"),  # unknown key -> NULL
    ]
    fdf = spark.createDataFrame(
        [(i, u, _ts(t)) for i, u, t in facts], "fact_id long, user_id long, ts timestamp"
    )
    got = {
        r["fact_id"]: r["tier_dim"]
        for r in enrich_versioned(
            fdf, _changelog(spark), "user_id", "ts", "ts"
        ).collect()
    }
    # brute force over the changelog rows
    for fid, u, t in facts:
        vers = [
            c for c in CHANGELOG if c[0] == u and _ts(c[1]) <= _ts(t)
        ]
        expect = max(vers, key=lambda c: _ts(c[1]))[2] if vers else None
        assert got[fid] == expect, (fid, got[fid], expect)


def test_changelog_stream_snapshot_equals_batch(spark, tmp_path):
    src = str(tmp_path / "changelog_in")
    store = str(tmp_path / "store")
    b1 = _changelog(spark, CHANGELOG[:3])
    b2 = _changelog(spark, CHANGELOG[3:])
    b1.write.parquet(src)
    b2.write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"  # force multiple micro-batches
    ).parquet(src)
    q = SK.run_changelog_stream(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    snap_stream = {
        tuple(r)
        for r in SK.changelog_snapshot_view(
            spark, store, "user_id", "ts", tombstone_col="deleted"
        ).collect()
    }
    snap_batch = {
        tuple(r)
        for r in compact_changelog(
            _changelog(spark), "user_id", "ts", tombstone_col="deleted"
        ).collect()
    }
    assert snap_stream == snap_batch


def test_changelog_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    w = SK.changelog_writer(store)
    w(_changelog(spark, CHANGELOG[:3]), 0)
    w(_changelog(spark, CHANGELOG[:3]), 0)  # crash + redelivery of batch 0
    w(_changelog(spark, CHANGELOG[3:]), 1)
    snap = SK.changelog_snapshot_view(
        spark, store, "user_id", "ts", tombstone_col="deleted"
    )
    assert {r["user_id"]: r["tier"] for r in snap.collect()} == {
        1: "gold",
        3: "silver",
    }
    # the raw store holds each batch exactly once despite the replay
    n = spark.read.parquet(store).count()
    assert n == len(CHANGELOG)


def test_versioned_enrichment_vs_current_snapshot_leak(spark):
    """The point of the operator: enriching with the CURRENT snapshot
    backdates new profile values onto old facts; the versioned join does
    not. A fact at Jan 2 sees silver (correct), while the snapshot says
    gold (leaked from Jan 3)."""
    fdf = spark.createDataFrame(
        [(1, 1, _ts("2024-01-02T12:00:00"))],
        "fact_id long, user_id long, ts timestamp",
    )
    versioned = enrich_versioned(fdf, _changelog(spark), "user_id", "ts", "ts")
    assert versioned.first()["tier_dim"] == "silver"
    snap = compact_changelog(
        _changelog(spark), "user_id", "ts", tombstone_col="deleted"
    )
    leaked = fdf.join(snap.select("user_id", "tier"), "user_id")
    assert leaked.first()["tier"] == "gold"


def test_streaming_enrichment_matches_batch(spark, tmp_path):
    """Fact stream enriched per micro-batch against the changelog store
    (streaming/sinks.versioned_enrichment_writer): with the changelog
    ingested first, streamed enrichment == batch enrich_versioned."""
    store = str(tmp_path / "profiles")
    out = str(tmp_path / "enriched")
    # bootstrap the profile history (two committed batches)
    w = SK.changelog_writer(store)
    w(_changelog(spark, CHANGELOG[:3]), 0)
    w(_changelog(spark, CHANGELOG[3:]), 1)

    facts = [
        (100, 1, "2024-01-01T06:00:00"),
        (101, 1, "2024-01-02T12:00:00"),
        (102, 2, "2024-01-02T00:00:00"),
        (103, 3, "2024-01-05T00:00:00"),
        (104, 7, "2024-01-02T00:00:00"),  # unknown key -> nulls
    ]
    fdf = spark.createDataFrame(
        [(i, u, _ts(t)) for i, u, t in facts],
        "fact_id long, user_id long, ts timestamp",
    )
    src = str(tmp_path / "facts_in")
    fdf.write.parquet(src)
    stream = spark.readStream.schema(
        "fact_id long, user_id long, ts timestamp"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = SK.run_versioned_enrichment_stream(
        stream, store, out, str(tmp_path / "ckpt"),
        key="user_id", fact_ts="ts",
    )
    q.awaitTermination(120)

    got = {
        r["fact_id"]: (r["tier_dim"], r["score_dim"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["fact_id"]: (r["tier_dim"], r["score_dim"])
        for r in enrich_versioned(
            fdf, _changelog(spark), "user_id", "ts", "ts"
        ).collect()
    }
    assert got == want and len(got) == len(facts)


def test_streaming_enrichment_requires_bootstrap(spark, tmp_path):
    """A missing changelog store must raise, not emit schema-shifted
    unenriched rows."""
    import pytest

    w = SK.versioned_enrichment_writer(
        str(tmp_path / "nope"), str(tmp_path / "out"), key="user_id", fact_ts="ts"
    )
    fdf = spark.createDataFrame(
        [(1, 1, _ts("2024-01-02T00:00:00"))],
        "fact_id long, user_id long, ts timestamp",
    )
    with pytest.raises(Exception):
        w(fdf, 0)
