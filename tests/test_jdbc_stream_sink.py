"""Replay-idempotent streaming JDBC sink (streaming/sinks.
jdbc_exactly_once_writer) against EMBEDDED DERBY — a real relational
store in this container: append semantics, crash-replay convergence
(including half-written batches), and the assembled availableNow stream."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.sources.jdbc import read_jdbc, write_jdbc
from realtime_fraud_detection_spark.streaming import sinks as SK


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path / 'store'};create=true"


def _batch(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("tx_id"), (F.col("id") * 2.5).alias("amount")
    )


def _rows(spark, url, table):
    return {
        (r.tx_id, r.batch_id)
        for r in read_jdbc(spark, url, table).collect()
    }


def test_two_batches_append(spark, derby_url):
    writer = SK.jdbc_exactly_once_writer(derby_url, "txs")
    writer(_batch(spark, 0, 5), 0)
    writer(_batch(spark, 100, 3), 1)
    got = _rows(spark, derby_url, "txs")
    assert got == {(i, 0) for i in range(5)} | {(100 + i, 1) for i in range(3)}


def test_replay_converges(spark, derby_url):
    writer = SK.jdbc_exactly_once_writer(derby_url, "txs")
    writer(_batch(spark, 0, 5), 0)
    writer(_batch(spark, 0, 5), 0)  # crash-replay: same batch id
    assert _rows(spark, derby_url, "txs") == {(i, 0) for i in range(5)}


def test_half_written_batch_converges(spark, derby_url):
    """Simulate a crash mid-append: garbage rows tagged with the batch id
    are already in the table when the batch replays — the DELETE clears
    them and the end state is exactly the batch's rows."""
    writer = SK.jdbc_exactly_once_writer(derby_url, "txs")
    writer(_batch(spark, 0, 5), 0)
    write_jdbc(  # the half-written partial of a crashed batch-1 attempt
        _batch(spark, 500, 2).withColumn("batch_id", F.lit(1).cast("long")),
        derby_url,
        "txs",
        mode="append",
    )
    writer(_batch(spark, 100, 3), 1)  # the replay
    got = _rows(spark, derby_url, "txs")
    assert got == {(i, 0) for i in range(5)} | {(100 + i, 1) for i in range(3)}


def test_assembled_stream(spark, tmp_path, derby_url):
    src = str(tmp_path / "src")
    _batch(spark, 0, 5).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _batch(spark, 100, 3).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("tx_id long, amount double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = SK.run_jdbc_stream(stream, derby_url, "txs", str(tmp_path / "ck"))
    q.awaitTermination(180)
    assert len(_rows(spark, derby_url, "txs")) == 8


def test_schema_qualified_table_replay_converges(spark, derby_url):
    """A schema-qualified table name must still be found by the existence
    probe (the qualifier goes into getTables' schema argument) — a probe
    miss would silently skip the DELETE and duplicate rows on replay."""
    writer = SK.jdbc_exactly_once_writer(derby_url, "APP.qual_txs")
    writer(_batch(spark, 0, 4), 0)
    writer(_batch(spark, 0, 4), 0)  # replay
    assert _rows(spark, derby_url, "APP.qual_txs") == {(i, 0) for i in range(4)}


def test_mixed_case_table_replay_converges(spark, derby_url):
    """Derby upper-folds unquoted names; the probe must find the table
    whatever fold the caller wrote (lower-folding stores are the mirror
    case the multi-fold probe exists for)."""
    writer = SK.jdbc_exactly_once_writer(derby_url, "MiXeD_case")
    writer(_batch(spark, 0, 3), 0)
    writer(_batch(spark, 0, 3), 0)
    assert _rows(spark, derby_url, "MiXeD_case") == {(i, 0) for i in range(3)}


def test_table_name_validated_at_construction():
    """The table name is interpolated into SQL — anything beyond a plain
    (optionally schema-qualified) identifier is refused up front."""
    for bad in ("txs; DROP TABLE x", 'a"b', "sch.tab.extra", "1tab", "a-b", ""):
        with pytest.raises(ValueError):
            SK.jdbc_exactly_once_writer("jdbc:derby:memory:x", bad)
