"""BPE tokenizer (functions/bpe.py): merge training against the ACL'16
worked example, greedy-encode parity between the distributed pandas_udf
path and the driver-side reference, exact detokenization roundtrip, and
training determinism."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.bpe import (
    END,
    apply_bpe,
    encode_word,
    train_bpe,
    word_freq_table,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

# Sennrich et al. 2016 §3.2 corpus
ACL16 = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_train_bpe_acl16_merge_sequence():
    merges = train_bpe(ACL16, n_merges=5)
    # counts: (e,s)=(s,t)=(t,</w>)=9 — lexicographic tie-break picks (e,s);
    # then the chain builds 'est</w>'; next tie at 7 picks (l,o) over (o,w)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_encode_word_greedy():
    ranks = {p: i for i, p in enumerate(train_bpe(ACL16, n_merges=5))}
    assert encode_word("lowest", ranks) == ["low", "est" + END]
    assert encode_word("low", ranks) == ["low", END]
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]


def test_train_bpe_stops_without_frequent_pairs():
    assert train_bpe([("ab", 1)], n_merges=10) == []  # hapax pairs only
    assert train_bpe([("ab", 2)], n_merges=10, min_pair_count=2) == [
        ("a", "b"),
        ("ab", END),
    ]


@pytest.fixture(scope="module")
def fixture_bpe(spark):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    wf = word_freq_table(docs, "text")
    merges = train_bpe(wf, n_merges=200)
    return docs, wf, merges


def test_training_deterministic(spark, fixture_bpe):
    docs, wf, merges = fixture_bpe
    assert word_freq_table(docs, "text") == wf
    assert train_bpe(wf, n_merges=200) == merges


def test_distributed_apply_matches_reference_and_roundtrips(spark, fixture_bpe):
    docs, _, merges = fixture_bpe
    ranks = {p: i for i, p in enumerate(merges)}
    out = {
        r["doc"]: r["tokens"]
        for r in apply_bpe(docs, "text", "doc_id", merges).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(out) == set(texts)
    for doc_id, text in texts.items():
        words = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
        ref = [t for w in words for t in encode_word(w, ranks)]
        assert out[doc_id] == ref, doc_id
        # exact detokenization: concatenation restores the normalized words
        assert "".join(ref).replace(END, " ").split() == words


def test_bpe_compresses_fixture(spark, fixture_bpe):
    """200 merges over the ~30-type fixture vocabulary memorize every
    frequent word: token count approaches word count (1 token/word +
    tail), far below character count."""
    docs, _, merges = fixture_bpe
    stats = (
        apply_bpe(docs, "text", "doc_id", merges)
        .agg(F.sum("n_tokens").alias("tok"))
        .first()
    )
    words = docs.select(
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " ")
                ),
                r"\s+",
            )
        ).alias("w")
    ).filter(F.length("w") > 0)
    n_words = words.count()
    n_chars = words.agg(F.sum(F.length("w"))).first()[0]
    assert n_words <= stats["tok"] < n_chars
    assert stats["tok"] < 1.2 * n_words
