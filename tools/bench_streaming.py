#!/usr/bin/env python3
"""Streaming throughput bench — the measured comparable to the reference's
headline claim (BASELINE.md: 15,000 TPS sustained / 10,000 TPS target on a
full docker-compose stack of 3 Kafka brokers + 3 Flink TaskManagers + 6
Redis nodes; reference README.md:201, docs/PROJECT_ROADMAP.md:238).

What it measures is the reference's END-TO-END topology, not a toy scan
(FraudDetectionJob.java:33-107 re-expressed in streaming/pipeline.py):

    JSON wire frames (the S3 serializer's (key, value) shape)
      → S2 deserialization w/ ERROR fallback (sources/kafka.py)
      → watermark → broadcast profile enrichment (J5)
      → §2.7 feature families → rule score (M1) → decision bands (F6)
      → exactly-once foreachBatch 4-sink fan-out (alerts / enriched /
        features / hourly rollup parquet tables — streaming/sinks.py)

The population matches the reference's simulator defaults (10k users, 5k
merchants — simulator.py:481-483) and the events come from the same
10-scenario fraud generator re-expression (sources/generator.py). The file
source stands in for the Kafka topic (each file = one micro-batch via
maxFilesPerTrigger, the offline equivalence every streaming test in this
repo uses); parse→score→sink cost is identical either way, broker I/O is
not measured on either side of the comparison (the reference number also
excludes client→broker latency: it counts consumed records).

Reported: steady-state TPS = sum(numInputRows)/sum(triggerExecution) over
all micro-batches after the first (the first batch carries JVM/codegen
warmup), plus whole-run TPS including warmup and sink I/O. Prints ONE JSON
line and (when run from the repo root) refreshes BENCH_STREAMING.json.

Run it SOLO (same rule as bench.py — a concurrent Spark session on the
same cores invalidates the numbers):

    python3 tools/bench_streaming.py [n_events] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# defaults: 1M events over 10 micro-batches. Files per micro-batch is the
# stand-in for Kafka topic partitioning: a real transactions topic is
# partitioned (the reference's create-topics.sh uses 12-partition topics)
# and every consumer task reads in parallel; one file per trigger would
# serialize the scan onto 1-2 cores instead.
DEFAULTS = (1_000_000, 10, 16)


def run(
    spark,
    n_events: int,
    n_batches: int,
    files_per_batch: int,
    workdir: str | None = None,
) -> dict:
    """Generate wire frames, drive the topology, return the metrics dict
    (importable — tests/test_streaming_throughput.py pins a floor)."""
    from realtime_fraud_detection_spark.sources import generator as G
    from realtime_fraud_detection_spark.sources.kafka import (
        parse_transactions,
        serialize_for_kafka,
    )
    from realtime_fraud_detection_spark.streaming.pipeline import (
        run_scoring_pipeline,
    )

    users, merchants = G.generate_profiles(n_users=10_000, n_merchants=5_000)
    tx = G.generate_transactions(users, merchants, n=n_events, days=4)
    u, m, t = G.to_spark(spark, users, merchants, tx)

    work = workdir or tempfile.mkdtemp(prefix="spark_graft_stream_bench_")
    src = os.path.join(work, "wire")
    try:
        # the S3 wire shape; files_per_batch files per intended micro-batch
        serialize_for_kafka(t).repartition(
            n_batches * files_per_batch
        ).write.parquet(src)

        stream = (
            spark.readStream.schema("key string, value string")
            .option("maxFilesPerTrigger", files_per_batch)
            .parquet(src)
        )
        parsed = parse_transactions(stream)

        t0 = time.time()
        q = run_scoring_pipeline(
            parsed,
            u,
            m,
            out_dir=os.path.join(work, "sinks"),
            checkpoint=os.path.join(work, "ckpt"),
            trigger={"availableNow": True},
        )
        q.awaitTermination()
        wall = time.time() - t0

        progress = [
            p
            for p in (json.loads(str(j.json)) for j in q.recentProgress)
            if p.get("numInputRows", 0) > 0
        ]
        rows = sum(p["numInputRows"] for p in progress)
        steady = progress[1:] or progress
        steady_rows = sum(p["numInputRows"] for p in steady)
        steady_ms = sum(p["durationMs"]["triggerExecution"] for p in steady)
        # per-micro-batch commit latency (trigger start -> all 4 sinks
        # committed). NOT the same quantity as the reference's claimed
        # 85 ms PER-EVENT latency: a micro-batch engine amortizes tens of
        # thousands of events per commit, so its per-event freshness is
        # bounded by the batch latency while its throughput is rows/batch
        # ÷ these numbers. Reported so the latency half of BASELINE.md
        # has a measured counterpart with the semantics stated.
        batch_ms = sorted(p["durationMs"]["triggerExecution"] for p in steady)
        return {
            "metric": "streaming_tps",
            "value": round(steady_rows / (steady_ms / 1000.0), 1),
            "unit": "events/sec",
            "events": rows,
            "batches": len(progress),
            "wall_s": round(wall, 2),
            "total_tps": round(rows / wall, 1),
            "batch_commit_ms_p50": batch_ms[len(batch_ms) // 2],
            "batch_commit_ms_max": batch_ms[-1],
            "events_per_batch": round(steady_rows / max(1, len(steady))),
            "reference_claim_tps": 15_000,
            "pipeline": "json-parse -> enrich -> features -> score -> 4-sink fan-out",
        }
    finally:
        if workdir is None:
            shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    from realtime_fraud_detection_spark.session import get_spark

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    args = [int(a) for a in sys.argv[1:4]]
    n_events, n_batches, files_per_batch = tuple(args) + DEFAULTS[len(args):]

    # per-job scheduling floor + job-sequence probes (same calibration as
    # bench.py): TPS re-priced at the ~70 ms reference floor separates
    # VM scheduling class from pipeline cost across rounds
    sc = spark.sparkContext
    floor_rdd = sc.parallelize([1], 1)
    for _ in range(5):
        floor_rdd.count()
    floor_runs = []
    for _ in range(15):
        t0 = time.time()
        floor_rdd.count()
        floor_runs.append(time.time() - t0)
    job_floor_ms = round(sorted(floor_runs)[len(floor_runs) // 2] * 1000, 1)
    excess_s = max(0.0, job_floor_ms - 70.0) / 1000.0

    def _job_seq() -> int:
        sc.setJobGroup("floor-seq-probe", "job-sequence probe")
        try:
            floor_rdd.count()
        finally:
            sc.setJobGroup(None, None)
        return max(sc.statusTracker().getJobIdsForGroup("floor-seq-probe"))

    seq0 = _job_seq()
    result = run(spark, n_events, n_batches, files_per_batch)
    n_jobs = _job_seq() - seq0 - 1
    result["job_floor_ms"] = job_floor_ms
    result["floor_ref_ms"] = 70.0
    result["jobs"] = n_jobs
    if result.get("events") and result.get("wall_s"):
        adj = max(0.1, result["wall_s"] - n_jobs * excess_s)
        result["total_tps_floor_normalized"] = round(result["events"] / adj, 1)
    # latency counterpart (BASELINE.md claims 85 ms average end-to-end):
    # the same topology driven at SMALL batches (1 file/trigger, ~200
    # events) measures the micro-batch commit floor — the freshness bound
    # a micro-batch engine offers. Semantics differ from a
    # record-at-a-time engine's per-event latency and are stated in the
    # artifact rather than papered over.
    lat = run(spark, n_events=6_000, n_batches=30, files_per_batch=1)
    result["latency"] = {
        "batch_commit_ms_p50": lat["batch_commit_ms_p50"],
        "batch_commit_ms_max": lat["batch_commit_ms_max"],
        "events_per_batch": lat["events_per_batch"],
        "semantics": (
            "micro-batch commit floor at ~200-event batches (trigger "
            "start -> all 4 sinks committed); reference's 85 ms claim "
            "is per-event on a record-at-a-time engine"
        ),
    }
    line = json.dumps(result)
    print(line)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STREAMING.json",
    )
    try:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # read-only checkout: the printed line is the artifact


if __name__ == "__main__":
    main()
