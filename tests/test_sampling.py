"""Deterministic sampling + sequence packing (operators/sampling)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import sampling as S


def _py_bucket(x, seed="sample:"):
    return int(hashlib.md5(f"{seed}{x}".encode()).hexdigest()[:15], 16) % 1_000_000


def test_hash_sample_matches_python_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id int")
    got = sorted(r["doc_id"] for r in S.hash_sample(df, "doc_id", 0.25).collect())
    want = sorted(i for i in range(2000) if _py_bucket(i) < 250_000)
    assert got == want
    # quantitatively near the target fraction on 2000 ids
    assert 0.2 < len(got) / 2000 < 0.3


def test_hash_sample_stable_and_nested(spark):
    """The same seed+fraction always selects the same rows, and a smaller
    fraction selects a subset of a larger one (bucket thresholding)."""
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id int")
    a = {r["doc_id"] for r in S.hash_sample(df, "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in S.hash_sample(df, "doc_id", 0.5).collect()}
    c = {r["doc_id"] for r in S.hash_sample(df, "doc_id", 0.1).collect()}
    assert a == b
    assert c <= a


def test_hash_sample_bounds(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id int")
    assert S.hash_sample(df, "doc_id", 0.0).count() == 0
    assert S.hash_sample(df, "doc_id", 1.0).count() == 50
    with pytest.raises(ValueError):
        S.hash_sample(df, "doc_id", 1.5)


def test_pack_sequences_concat_and_chunk(spark):
    # tokens: 40, 40, 40, 100, 10 with budget 100 →
    # offsets 0, 40, 80, 120, 220 → seqs 0, 0, 0, 1, 2
    rows = [(1, 40), (2, 40), (3, 40), (4, 100), (5, 10)]
    df = spark.createDataFrame(rows, "doc_id int, tokens int")
    got = {
        r["doc_id"]: (r["offset"], r["seq_id"])
        for r in S.pack_sequences(df, "doc_id", "tokens", budget=100).collect()
    }
    assert got == {1: (0, 0), 2: (40, 0), 3: (80, 0), 4: (120, 1), 5: (220, 2)}


def test_pack_sequences_per_stratum(spark):
    rows = [("en", 1, 60), ("en", 2, 60), ("de", 3, 60), ("de", 4, 60)]
    df = spark.createDataFrame(rows, "lang string, doc_id int, tokens int")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in S.pack_sequences(
            df, "doc_id", "tokens", budget=100, stratum_col="lang"
        ).collect()
    }
    # each language packs its own offset space: second doc starts at 60 → seq 0
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}
    got2 = {
        r["doc_id"]: r["seq_id"]
        for r in S.pack_sequences(
            df, "doc_id", "tokens", budget=50, stratum_col="lang"
        ).collect()
    }
    assert got2 == {1: 0, 2: 1, 3: 0, 4: 1}


def test_stratified_sample_per_stratum_thresholds(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    got = {
        (r["doc_id"], r["lang"])
        for r in S.stratified_sample(
            df, "doc_id", "lang", {"en": 0.1, "de": 0.5}
        ).collect()
    }
    want = {
        (i, lang)
        for i, lang in rows
        if _py_bucket(i) < (100_000 if lang == "en" else 500_000)
    }
    assert got == want
    # nested within stratum: en@5% subset of en@10%
    small = {
        r["doc_id"]
        for r in S.stratified_sample(df, "doc_id", "lang", {"en": 0.05}).collect()
    }
    big = {r[0] for r in got if r[1] == "en"}
    assert small <= big


def test_stratified_sample_default_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "zz"), (3, "zz")], "doc_id int, lang string"
    )
    # default=1.0 keeps all unlisted strata; en listed at 0 drops en
    out = {
        r["doc_id"]
        for r in S.stratified_sample(
            df, "doc_id", "lang", {"en": 0.0}, default=1.0
        ).collect()
    }
    assert out == {2, 3}
    with pytest.raises(ValueError):
        S.stratified_sample(df, "doc_id", "lang", {"en": 2.0})
