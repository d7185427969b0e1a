"""Leakage-free splits (operators/curation.leakage_free_splits):
near-duplicate clusters never straddle a split boundary, singletons split
exactly as the plain id split, and the partition is disjoint+exhaustive."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import dedup as D
from realtime_fraud_detection_spark.operators.curation import (
    leakage_free_splits,
)
from realtime_fraud_detection_spark.operators.sampling import split_by_hash
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _splits_as_tags(splits):
    tags = {}
    for name, part in splits.items():
        for r in part.select("doc_id").collect():
            assert r.doc_id not in tags, f"doc {r.doc_id} in two splits"
            tags[r.doc_id] = name
    return tags


def test_near_dup_pairs_never_straddle(spark):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    splits = leakage_free_splits(docs, WEIGHTS)
    tags = _splits_as_tags(splits)
    assert set(tags) == {r.doc_id for r in docs.select("doc_id").collect()}
    pairs = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=4, max_bucket_size=2000
    ).collect()
    assert pairs  # the fixture HAS near-dups, or this test is vacuous
    for p in pairs:
        assert tags[p.doc_a] == tags[p.doc_b], (p.doc_a, p.doc_b)


def test_singletons_match_plain_id_split(spark):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    splits = leakage_free_splits(docs, WEIGHTS)
    tags = _splits_as_tags(splits)
    pairs = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=4, max_bucket_size=2000
    ).collect()
    clustered = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    plain = {}
    for name, part in split_by_hash(docs, "doc_id", WEIGHTS).items():
        for r in part.select("doc_id").collect():
            plain[r.doc_id] = name
    singles = set(plain) - clustered
    assert singles
    for d in singles:
        assert tags[d] == plain[d], d


def test_provided_clusters_respected(spark):
    docs = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(40)], "doc_id long, text string"
    )
    # force docs 0..9 into one cluster regardless of content
    clusters = spark.createDataFrame(
        [(i, 0 if i < 10 else i) for i in range(40)], "doc long, cluster long"
    )
    splits = leakage_free_splits(docs, WEIGHTS, clusters=clusters)
    tags = _splits_as_tags(splits)
    assert len({tags[i] for i in range(10)}) == 1
