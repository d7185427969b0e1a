"""Quality-gated streaming ingest (streaming/sinks.quality_gated_ingest_*):
stream==batch funnel equivalence on a two-batch corpus, cross-batch exact
dedup through the fingerprint index, and idempotent replay."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.curation import clean_corpus
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming import sinks as SK
from tests.conftest import SF_SMOKE

GATES = dict(min_quality=0.3, gopher=True, c4=False)


def _two_batches(spark):
    """Batch 1: doc_id < 250; batch 2: the rest PLUS an exact copy of a
    batch-1 doc under a fresh (larger) id — a cross-batch duplicate only
    the fingerprint index can catch. Ids arrive in batch order, matching
    the min-id survivor rule."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    b1 = docs.filter("doc_id < 250")
    dup = b1.filter("doc_id = 7").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    b2 = docs.filter("doc_id >= 250").unionByName(dup)
    return b1, b2


def _run_stream(spark, tmp_path, b1, b2):
    src = str(tmp_path / "src")
    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtime -> second micro-batch
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "ingest")
    q = SK.run_quality_gated_ingest(
        stream, out_dir, str(tmp_path / "ck"), **GATES
    )
    q.awaitTermination(180)  # stateless foreachBatch: availableNow terminates
    return out_dir


def test_stream_equals_batch_funnel_and_survivors(spark, tmp_path):
    b1, b2 = _two_batches(spark)
    out_dir = _run_stream(spark, tmp_path, b1, b2)

    streamed = {
        r["stage"]: r["n"]
        for r in SK.ingest_funnel_view(spark, out_dir).collect()
    }
    union = b1.unionByName(b2)
    batch_out, batch_funnel = clean_corpus(
        union, near_dup=False, strip_boilerplate=False, report=True, **GATES
    )
    # per-document gates: per-batch counts sum to the batch-mode counts
    for stage in ("input", "quality_gate", "gopher_gate"):
        assert streamed[stage] == batch_funnel[stage], stage
    # content dedup: in-batch dedup + cross-batch fingerprint probe
    # together equal batch-mode exact dedup over the union
    assert streamed["corpus_dedup"] == batch_funnel["exact_dedup"]
    got = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out_dir}/clean").select("doc_id").collect()
    }
    want = {r["doc_id"] for r in batch_out.select("doc_id").collect()}
    assert got == want
    assert 100007 not in got  # the cross-batch duplicate was dropped


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running batch 1's writer with the same batch_id must replace its
    partitions, not duplicate them, and must not match against its own
    previously-written fingerprints."""
    b1, _ = _two_batches(spark)
    out_dir = str(tmp_path / "ingest")
    writer = SK.quality_gated_ingest_writer(out_dir, **GATES)
    writer(b1, 0)
    first = spark.read.parquet(f"{out_dir}/clean").count()
    writer(b1, 0)  # crash-replay
    assert spark.read.parquet(f"{out_dir}/clean").count() == first
    streamed = {
        r["stage"]: r["n"]
        for r in SK.ingest_funnel_view(spark, out_dir).collect()
    }
    # self-match through the index would zero corpus_dedup on replay
    _, funnel = clean_corpus(
        b1, near_dup=False, strip_boilerplate=False, report=True, **GATES
    )
    assert streamed["corpus_dedup"] == funnel["exact_dedup"]
