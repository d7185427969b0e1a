"""Incremental (new-batch vs existing-corpus) LSH near-dup candidates:
equivalence with the cross-pairs of the self-join form, broadcast plan
shape, bucket caps, and prebuilt-band-index reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import dedup as D
from realtime_fraud_detection_spark.plans.explain import formatted_plan

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different content about spark shuffles and partitions"),
    (3, "a third document discussing watermark semantics in streaming jobs"),
]
NEW = [
    # near-dup of corpus doc 1 (one word changed)
    (101, "the quick brown fox leaps over the lazy dog near the river bank"),
    # unrelated
    (102, "unrelated text with its own private vocabulary entirely"),
]


@pytest.fixture(scope="module")
def frames(spark):
    c = spark.createDataFrame(CORPUS, "doc_id int, text string")
    n = spark.createDataFrame(NEW, "doc_id int, text string")
    return c, n


def _cands(c, n, **kw):
    # 8 bands x 2 rows: the one-word-changed pair (Jaccard ~0.57) collides
    # with near-certainty under 2-row bands; 4-row bands are a precision
    # config for >=0.8 Jaccard and deterministically miss it (md5 is fixed)
    return {
        (r["new_doc"], r["corpus_doc"])
        for r in D.minhash_lsh_candidates_incremental(
            n, c, "text", "doc_id", num_perm=16, band_size=2, **kw
        ).collect()
    }


def test_finds_cross_near_dup_not_unrelated(spark, frames):
    c, n = frames
    got = _cands(c, n)
    assert (101, 1) in got
    assert all(nd != 102 for nd, _ in got)


def test_matches_cross_pairs_of_self_join_on_union(spark, frames):
    """The incremental form must produce exactly the cross (new x corpus)
    subset of the self-join candidates on the unioned corpus."""
    c, n = frames
    got = _cands(c, n)
    union = c.unionAll(n)
    full = D.minhash_lsh_candidates(
        union, "text", "doc_id", num_perm=16, band_size=2
    ).collect()
    cross = set()
    new_ids = {r[0] for r in NEW}
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if (a in new_ids) != (b in new_ids):
            nd, cd = (a, b) if a in new_ids else (b, a)
            cross.add((nd, cd))
    assert got == cross


def test_new_side_broadcasts(spark, frames):
    c, n = frames
    plan = formatted_plan(
        D.minhash_lsh_candidates_incremental(n, c, "text", "doc_id")
    )
    assert "BroadcastHashJoin" in plan


def test_prebuilt_corpus_band_index_reused(spark, frames):
    c, n = frames
    bands = D.band_table(c, "text", "doc_id", num_perm=16, band_size=2)
    got = _cands(c, n, corpus_bands=bands)
    assert got == _cands(c, n)


def test_corpus_bucket_cap_drops_boilerplate(spark):
    # 10 identical corpus docs form one hot bucket; cap 5 drops it, so the
    # matching new doc produces NO candidates against them — exact dedup's
    # job instead (same rule as the self-join form)
    boiler = [(i, "identical boilerplate license header text repeated") for i in range(10)]
    c = spark.createDataFrame(boiler, "doc_id int, text string")
    n = spark.createDataFrame(
        [(900, "identical boilerplate license header text repeated")],
        "doc_id int, text string",
    )
    capped = _cands(c, n, max_bucket_size=5)
    uncapped = _cands(c, n)
    assert len(uncapped) == 10
    assert capped == set()


# ---------------------------------------------------------------------------
# Streaming ingest: per-batch probe + band-index append (streaming/sinks)
# ---------------------------------------------------------------------------

def test_streaming_ingest_probes_and_appends_index(spark, tmp_path):
    import time

    from realtime_fraud_detection_spark.streaming import sinks as SK

    src = str(tmp_path / "src")
    spark.createDataFrame(CORPUS, "doc_id int, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)  # distinct mtime -> second micro-batch
    spark.createDataFrame(NEW, "doc_id int, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx, out = str(tmp_path / "bands"), str(tmp_path / "cands")
    q = SK.run_incremental_dedup_stream(
        stream, idx, out, str(tmp_path / "ck"), num_perm=16, band_size=2
    )
    q.awaitTermination(120)  # stateless foreachBatch: availableNow terminates
    got = {
        (r["new_doc"], r["corpus_doc"])
        for r in spark.read.parquet(out).collect()
    }
    assert (101, 1) in got
    assert all(nd in (101, 102) for nd, _ in got)  # probes only prior batches
    # index holds every doc x 8 bands from both batches
    assert spark.read.parquet(idx).count() == 5 * 8


def test_replayed_batch_does_not_self_match(spark, tmp_path):
    from realtime_fraud_detection_spark.streaming import sinks as SK

    idx, out = str(tmp_path / "bands"), str(tmp_path / "cands")
    w = SK.incremental_dedup_writer(idx, out, num_perm=16, band_size=2)
    w(spark.createDataFrame(CORPUS, "doc_id int, text string"), 0)
    b2 = spark.createDataFrame(NEW, "doc_id int, text string")
    w(b2, 1)
    first = sorted(
        (r["new_doc"], r["corpus_doc"]) for r in spark.read.parquet(out).collect()
    )
    w(b2, 1)  # replay after its bands already landed in the index
    again = sorted(
        (r["new_doc"], r["corpus_doc"]) for r in spark.read.parquet(out).collect()
    )
    assert again == first  # no duplicates, no (new, new) self-matches
    assert all(cd <= 3 for _, cd in again)
    assert spark.read.parquet(idx).count() == 5 * 8  # index not duplicated


def test_compacted_band_index_probes_identically(spark, tmp_path, frames):
    """compact_store folds the band-index batch partitions into one
    negative-id partition; a later batch's probe sees exactly the same
    candidates as against the uncompacted index."""
    import os

    from realtime_fraud_detection_spark.streaming import sinks as SK
    from realtime_fraud_detection_spark.streaming.sinks import compact_store

    corpus, new = frames
    half1 = corpus.filter("doc_id <= 2")
    half2 = corpus.filter("doc_id > 2")
    idx, out = str(tmp_path / "bands"), str(tmp_path / "cands")
    w = SK.incremental_dedup_writer(idx, out, num_perm=16, band_size=2)
    w(half1, 0)
    w(half2, 1)
    before = spark.read.parquet(idx).drop("batch_id")
    n_before = before.count()
    n = compact_store(spark, idx, max_batch_id=1)
    assert n == n_before
    parts = [d for d in os.listdir(idx) if d.startswith("batch_id=")]
    assert parts == ["batch_id=-1"]  # both consumed, one compacted gen
    # probe with the next batch: same candidates as an uncompacted run
    w(new, 2)
    got = {
        (r["new_doc"], r["corpus_doc"])
        for r in spark.read.parquet(out).filter("batch_id = 2").collect()
    }
    idx2, out2 = str(tmp_path / "bands2"), str(tmp_path / "cands2")
    w2 = SK.incremental_dedup_writer(idx2, out2, num_perm=16, band_size=2)
    w2(half1, 0)
    w2(half2, 1)
    w2(new, 2)
    want = {
        (r["new_doc"], r["corpus_doc"])
        for r in spark.read.parquet(out2).filter("batch_id = 2").collect()
    }
    assert got == want and got
