"""Streaming Count-Min maintenance (streaming/sinks.cm_partial_writer /
cm_rollup_view): the streamed store must equal a batch-built sketch
BIT-EXACTLY at every grain (CM merging is lossless, unlike MG
compression), and replaying a batch must change nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.count_min import (
    cm_estimate,
    cm_partials,
    merge_cm,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming.sinks import (
    cm_partial_writer,
    cm_rollup_view,
)
from tests.conftest import SF_SMOKE


def _estimates(df):
    return {(r[0], r[1]): r[2] for r in df.collect()}


def test_streamed_store_matches_batch_sketch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    out = str(tmp_path / "out")

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(cm_partial_writer(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    items = ev.select("user_id").distinct().filter(F.col("user_id") % 10 == 0)
    streamed = _estimates(
        cm_rollup_view(spark, out, "day", items).select(
            "day", "user_id", "est"
        )
    )
    daily = merge_cm(
        cm_partials(ev, "user_id", ts_col="ts"), "day"
    ).withColumnRenamed("day", "hour")
    batch = _estimates(
        cm_estimate(daily, items, "user_id", ["hour"]).select(
            "hour", "user_id", "est"
        )
    )
    assert streamed == batch and len(streamed) > 0

    # replay batch 0 with a different slice of the data — the partition
    # is overwritten, so the view reflects the REPLAYED content exactly
    # (idempotent under identical redelivery)
    writer = cm_partial_writer(out)
    replay = spark.read.parquet(src).limit(300)
    writer(replay, 0)
    first = _estimates(
        cm_rollup_view(spark, out, "day", items).select("day", "user_id", "est")
    )
    writer(replay, 0)
    second = _estimates(
        cm_rollup_view(spark, out, "day", items).select("day", "user_id", "est")
    )
    assert first == second
