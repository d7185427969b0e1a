"""Unigram-LM tokenizer (functions/unigram_lm.py): Viterbi correctness on
a hand lattice, training determinism and vocab-size convergence, exact
roundtrip for any word (hypothesis), and distributed-apply parity."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_fraud_detection_spark.functions.bpe import word_freq_table
from realtime_fraud_detection_spark.functions.unigram_lm import (
    OOV_LOGP,
    apply_unigram,
    train_unigram,
    viterbi_segment,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def test_viterbi_picks_best_lattice_path():
    logp = {"ab": math.log(0.4), "a": math.log(0.3), "b": math.log(0.3)}
    pieces, score = viterbi_segment("abab", logp)
    # 'ab ab' = 2*log(.4) beats 'a b a b' = 4*log(.3) and mixes
    assert pieces == ["ab", "ab"]
    assert score == (2 * math.log(0.4))
    # unseen single chars fall back to the OOV floor
    pieces, score = viterbi_segment("axb", logp)
    assert pieces == ["a", "x", "b"]
    import pytest

    assert score == pytest.approx(math.log(0.3) * 2 + OOV_LOGP)


def test_training_deterministic_and_converges():
    wf = [("streaming", 10), ("stream", 8), ("steam", 6), ("dream", 4)]
    m1 = train_unigram(wf, vocab_size=20)
    m2 = train_unigram(wf, vocab_size=20)
    assert m1 == m2
    assert len(m1) <= 20
    chars = {c for w, _ in wf for c in w}
    assert chars <= set(m1)  # single chars never pruned away
    # frequent shared substrings survive as pieces
    assert any(len(p) > 2 for p in m1)


word = st.text(alphabet="abcz", min_size=1, max_size=10)


@given(st.lists(st.tuples(word, st.integers(1, 9)), min_size=1, max_size=8),
       st.lists(word, min_size=1, max_size=6))
@settings(max_examples=150, deadline=None)
def test_roundtrip_any_word(wf, probe_words):
    model = train_unigram(wf, vocab_size=15, em_iters=1)
    for w in probe_words:
        pieces, _ = viterbi_segment(w, model)
        assert "".join(pieces) == w  # exact detokenization, OOV included


def test_distributed_apply_matches_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    model = train_unigram(word_freq_table(docs, "text"), vocab_size=120)
    out = {
        r["doc"]: r["tokens"]
        for r in apply_unigram(docs, "text", "doc_id", model).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    total_tokens = 0
    total_words = 0
    for doc_id, text in texts.items():
        words = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
        ref = [p for w in words for p in viterbi_segment(w, model)[0]]
        assert out[doc_id] == ref, doc_id
        total_tokens += len(ref)
        total_words += len(words)
    # the ~30-type vocabulary memorizes whole words: near 1 token/word
    assert total_words <= total_tokens < 1.3 * total_words
