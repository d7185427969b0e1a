"""Keyed purge over batch-partitioned stores (streaming/sinks.purge_keys):
matched rows disappear, every other row survives bit-identically,
untouched partitions are never rewritten, the replay guard skips (and
reports) partitions the stream could still overwrite, and the operation
is idempotent."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming.sinks import (
    _write_batch_partition,
    purge_keys,
)
from tests.conftest import SF_SMOKE


def _store(spark, tmp_path, n_batches=3):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "store")
    for b in range(n_batches):
        _write_batch_partition(ev.filter(F.col("event_id") % n_batches == b), b, path)
    return path, ev


def test_purge_removes_only_matching_rows(spark, tmp_path):
    path, ev = _store(spark, tmp_path)
    victims = [r["user_id"] for r in ev.select("user_id").distinct().limit(2).collect()]
    before = {tuple(r) for r in spark.read.parquet(path).drop("batch_id").collect()}
    n_victim_rows = ev.filter(F.col("user_id").isin(victims)).count()
    assert n_victim_rows > 0

    res = purge_keys(spark, path, "user_id", keys=victims)
    assert res["purged_rows"] == n_victim_rows
    after = {tuple(r) for r in spark.read.parquet(path).drop("batch_id").collect()}
    assert after == {t for t in before if t[1] not in victims}
    assert res["skipped_replayable"] == []


def test_purge_rewrites_only_affected_partitions(spark, tmp_path):
    # synthetic store: user 42 lives ONLY in batch 0
    path = str(tmp_path / "store")
    b0 = spark.createDataFrame(
        [(1, 42, 1.0), (2, 7, 2.0)], "event_id long, user_id long, value double"
    )
    b1 = spark.createDataFrame(
        [(3, 7, 3.0), (4, 9, 4.0)], "event_id long, user_id long, value double"
    )
    _write_batch_partition(b0, 0, path)
    _write_batch_partition(b1, 1, path)
    files_b1 = sorted(os.listdir(os.path.join(path, "batch_id=1")))
    mtimes = {
        f: os.path.getmtime(os.path.join(path, "batch_id=1", f))
        for f in files_b1
    }
    res = purge_keys(spark, path, "user_id", keys=[42])
    assert res["rewritten_partitions"] == 1 and res["purged_rows"] == 1
    assert sorted(os.listdir(os.path.join(path, "batch_id=1"))) == files_b1
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(path, "batch_id=1", f)) == m


def test_purge_replay_guard_skips_uncommitted(spark, tmp_path):
    path, ev = _store(spark, tmp_path)
    victim = ev.select("user_id").first()["user_id"]
    res = purge_keys(
        spark, path, "user_id", keys=[victim], max_batch_id=1
    )
    assert res["skipped_replayable"] == [2]
    # rows in the replayable partition survive
    left = (
        spark.read.parquet(os.path.join(path, "batch_id=2"))
        .filter(F.col("user_id") == victim)
        .count()
    )
    ev2 = ev.filter(
        (F.col("event_id") % 3 == 2) & (F.col("user_id") == victim)
    ).count()
    assert left == ev2


def test_purge_idempotent_and_keys_df_equivalent(spark, tmp_path):
    path, ev = _store(spark, tmp_path)
    victims = [r["user_id"] for r in ev.select("user_id").distinct().limit(3).collect()]
    kdf = spark.createDataFrame([(v,) for v in victims], "user_id long")
    r1 = purge_keys(spark, path, "user_id", keys_df=kdf)
    assert r1["purged_rows"] > 0
    r2 = purge_keys(spark, path, "user_id", keys=victims)
    assert r2["purged_rows"] == 0 and r2["rewritten_partitions"] == 0


def test_purge_arg_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        purge_keys(spark, str(tmp_path / "x"), "user_id")


def test_purge_keys_list_preserves_null_keyed_rows(spark, tmp_path):
    """`~isin(keys)` is NULL (dropped) for NULL keys — the keys-list path
    must keep NULL-keyed rows exactly like the keys_df left_anti path
    does, or a GDPR purge silently destroys unrelated rows. Survivors
    (incl. the NULL-keyed ones) must be bit-identical to the input."""
    path = str(tmp_path / "store")
    rows = [(1, 42, 1.5), (2, None, 2.5), (3, 7, 3.5), (4, None, 4.5)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double"
    )
    _write_batch_partition(df, 0, path)

    res = purge_keys(spark, path, "user_id", keys=[42])
    assert res["purged_rows"] == 1
    survivors = {
        tuple(r)
        for r in spark.read.parquet(path).drop("batch_id").collect()
    }
    assert survivors == {(2, None, 2.5), (3, 7, 3.5), (4, None, 4.5)}

    # and the keys_df path agrees on an identical store
    path2 = str(tmp_path / "store2")
    _write_batch_partition(df, 0, path2)
    kdf = spark.createDataFrame([(42,)], "user_id long")
    res2 = purge_keys(spark, path2, "user_id", keys_df=kdf)
    assert res2["purged_rows"] == 1
    survivors2 = {
        tuple(r)
        for r in spark.read.parquet(path2).drop("batch_id").collect()
    }
    assert survivors2 == survivors
