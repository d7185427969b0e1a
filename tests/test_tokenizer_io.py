"""Tokenizer artifact persistence (functions/tokenizer_io.py): roundtrip
identity, cross-session apply parity, wrong-algorithm guard, and
byte-determinism of the saved artifact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.bpe import (
    apply_bpe,
    train_bpe,
    word_freq_table,
)
from realtime_fraud_detection_spark.functions.tokenizer_io import (
    load_bpe,
    load_unigram,
    save_bpe,
    save_unigram,
)
from realtime_fraud_detection_spark.functions.unigram_lm import (
    apply_unigram,
    train_unigram,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def test_bpe_roundtrip_and_apply_parity(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True).limit(100)
    wf = word_freq_table(docs, "text")
    merges = train_bpe(wf, n_merges=50)
    p = str(tmp_path / "bpe.json")
    save_bpe(merges, p)
    assert load_bpe(p) == merges
    # a fresh apply from the loaded artifact matches the in-session model
    a = {r["doc"]: r["tokens"] for r in apply_bpe(docs, "text", "doc_id", merges).collect()}
    b = {r["doc"]: r["tokens"] for r in apply_bpe(docs, "text", "doc_id", load_bpe(p)).collect()}
    assert a == b


def test_unigram_roundtrip_and_apply_parity(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True).limit(100)
    model = train_unigram(word_freq_table(docs, "text"), vocab_size=80)
    p = str(tmp_path / "uni.json")
    save_unigram(model, p)
    loaded = load_unigram(p)
    assert loaded == model
    a = {r["doc"]: r["tokens"] for r in apply_unigram(docs, "text", "doc_id", model).collect()}
    b = {r["doc"]: r["tokens"] for r in apply_unigram(docs, "text", "doc_id", loaded).collect()}
    assert a == b


def test_artifact_bytes_deterministic(tmp_path):
    m = {"ab": -1.5, "a": -2.0, "b": -2.5}
    p1, p2 = str(tmp_path / "1.json"), str(tmp_path / "2.json")
    save_unigram(m, p1)
    save_unigram(dict(reversed(list(m.items()))), p2)  # insertion order differs
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_wrong_algorithm_guard(tmp_path):
    p = str(tmp_path / "t.json")
    save_bpe([("a", "b")], p)
    with pytest.raises(ValueError, match="expected 'unigram'"):
        load_unigram(p)
    with open(p, "w") as f:
        f.write('{"hello": 1}')
    with pytest.raises(ValueError, match="not a recognized artifact"):
        load_bpe(p)
