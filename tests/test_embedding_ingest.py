"""Streaming embedding ingest (streaming/sinks.embedding_ingest_writer):
cross-batch semantic near-dup detection through the persisted IVF store,
centroid reuse across batches, and idempotent replay."""

from __future__ import annotations

import time

from realtime_fraud_detection_spark.streaming import sinks as SK


def _vec(base, eps=0.0, dim=8):
    """Well-separated cluster bases, optionally nudged by eps."""
    v = [0.0] * dim
    v[base] = 1.0
    v[(base + 1) % dim] = eps
    return v


def _frames(spark):
    # batch 1: three cluster anchors; batch 2: a near-dup of anchor 0
    # (cosine ~0.995), a near-dup of anchor 1, and one unrelated vector
    b1 = spark.createDataFrame(
        [(1, _vec(0)), (2, _vec(2)), (3, _vec(4))],
        "vec_id long, embedding array<double>",
    )
    b2 = spark.createDataFrame(
        [(101, _vec(0, eps=0.1)), (102, _vec(2, eps=0.1)), (103, _vec(6))],
        "vec_id long, embedding array<double>",
    )
    return b1, b2


def test_cross_batch_near_dups_via_store(spark, tmp_path):
    b1, b2 = _frames(spark)
    src = str(tmp_path / "src")
    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "ingest")
    q = SK.run_embedding_ingest_stream(
        stream, out, str(tmp_path / "ck"), n_cells=4, threshold=0.9
    )
    q.awaitTermination(180)
    got = {
        (r["new_vec"], r["corpus_vec"])
        for r in spark.read.parquet(f"{out}/near_dups").collect()
    }
    assert (101, 1) in got and (102, 2) in got
    assert all(nv in (101, 102, 103) for nv, _ in got)  # probes prior batches only
    assert not any(cv == 103 for _, cv in got)
    # store holds all six vectors with cells + norms
    store = spark.read.parquet(f"{out}/vectors")
    assert store.count() == 6
    assert {"nid", "nv", "norm", "cell", "batch_id"} <= set(store.columns)
    # centroids were trained once (first batch of 3 vectors -> k capped
    # at 3) and persisted for every later batch
    assert spark.read.parquet(f"{out}/centroids").count() == 3


def test_replay_is_idempotent_and_no_self_match(spark, tmp_path):
    b1, _ = _frames(spark)
    out = str(tmp_path / "ingest")
    writer = SK.embedding_ingest_writer(out, n_cells=4, threshold=0.9)
    writer(b1, 0)
    n = spark.read.parquet(f"{out}/vectors").count()
    writer(b1, 0)  # crash-replay: must replace its partition, not append,
    # and must not match against its own previously-written vectors
    assert spark.read.parquet(f"{out}/vectors").count() == n
    # an all-empty candidate table has no data files to infer from
    n_cands = spark.read.schema(
        "new_vec long, corpus_vec long, cosine double"
    ).parquet(f"{out}/near_dups").count()
    assert n_cands == 0


def test_corrupt_centroid_store_raises_not_retrains(spark, tmp_path):
    """A genuine read failure on the centroid store must PROPAGATE —
    treating it as 'first batch' would retrain KMeans on whatever batch
    happened to arrive and silently fork the cell space away from every
    stored assignment. Only a MISSING store means first batch."""
    import os

    import pytest

    out = str(tmp_path / "ingest")
    w = SK.embedding_ingest_writer(out, n_cells=2, threshold=0.9)
    b1, b2 = _frames(spark)
    w(b1, 0)
    # corrupt the persisted centroids: truncate the parquet footer
    cent_dir = os.path.join(out, "centroids")
    files = [f for f in os.listdir(cent_dir) if f.endswith(".parquet")]
    assert files
    with open(os.path.join(cent_dir, files[0]), "wb") as fh:
        fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        w(b2, 1)
    # the corrupt store was NOT overwritten by a retrain
    with open(os.path.join(cent_dir, files[0]), "rb") as fh:
        assert fh.read() == b"not a parquet file"
