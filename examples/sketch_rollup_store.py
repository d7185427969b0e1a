#!/usr/bin/env python3
"""Sketch-rollup store demo — the three mergeable-partials sketches fed
by ONE streamed events source, then served at coarser grains from the
stored partials alone (the ClickHouse/Druid rollup-table pattern):

  events stream ─ foreachBatch ─┬─ HLL partials      → distinct users/day
                                ├─ DDSketch partials → value p50/p95/p99/day
                                └─ MG partials       → top users/day

Each store is bounded by groups × resolution (sketch words / α-buckets /
capacity counters), never by row count; replays overwrite their batch
partition, so redelivery is invisible. The demo prints every rollup next
to the exact batch answer so the error guarantees are visible:
HLL ≈1.6% on distinct counts, DDSketch ≤α relative on order statistics,
MG lower bounds within n/(capacity+1) with guaranteed presence of every
item above that share.

Usage: python examples/sketch_rollup_store.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from realtime_fraud_detection_spark.session import get_spark  # noqa: E402
from realtime_fraud_detection_spark.sources.testdata import load_table  # noqa: E402
from realtime_fraud_detection_spark.streaming.sinks import (  # noqa: E402
    frequent_items_writer,
    heavy_hitters_view,
    quantile_partial_writer,
    quantile_rollup_view,
    sketch_partial_writer,
    sketch_rollup_view,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sketch-rollup-store")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        ev.repartition(4).write.parquet(src)  # 4 files → 4 micro-batches
        out = os.path.join(tmp, "stores")
        writers = [
            sketch_partial_writer(out),
            quantile_partial_writer(out, value_col="value"),
            frequent_items_writer(out, item_col="user_id", capacity=16),
        ]

        def all_sinks(batch, batch_id):
            batch.persist()
            try:
                for w in writers:
                    w(batch, batch_id)
            finally:
                batch.unpersist()

        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(all_sinks)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination(120)

        day = F.date_trunc("day", "ts").alias("day")
        print("\n== distinct users per day: HLL rollup vs exact ==")
        hll = {
            r["hour"]: r["users_est"]
            for r in sketch_rollup_view(spark, out, "day").collect()
        }
        for r in (
            ev.groupBy(day).agg(F.count_distinct("user_id").alias("n"))
            .orderBy("day").limit(5).collect()
        ):
            print(f"  {r['day']}  est={hll[r['day']]:>6}  exact={r['n']:>6}")

        print("\n== value percentiles per day: DDSketch rollup vs exact ==")
        dd = {
            r["day"]: r
            for r in quantile_rollup_view(
                spark, out, "day", [0.5, 0.95]
            ).collect()
        }
        for r in (
            ev.groupBy(day)
            .agg(F.percentile_approx("value", [0.5, 0.95], 10_000).alias("p"))
            .orderBy("day").limit(5).collect()
        ):
            e = dd[r["day"]]
            print(
                f"  {r['day']}  p50={e['p50']:>8.3f} (~{r['p'][0]:.3f})"
                f"  p95={e['p95']:>8.3f} (~{r['p'][1]:.3f})"
            )

        print("\n== top users per day: MG summary (lower-bound counts) ==")
        hh = heavy_hitters_view(spark, out, "day", capacity=16)
        hh.orderBy("day", F.col("cnt").desc(), "item").limit(8).show(
            truncate=False
        )

    spark.stop()


if __name__ == "__main__":
    main()
