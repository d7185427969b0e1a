"""Property tests for the BPE tokenizer: for ANY corpus, training is
deterministic, encoding round-trips exactly, merges never cross word
boundaries, and greedy encoding is consistent with the trained merge
ranks. Driver-side (no Spark) — the distributed apply path is pinned
against this same encoder in tests/test_bpe.py."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_fraud_detection_spark.functions.bpe import (
    END,
    encode_word,
    train_bpe,
)

# normalized-vocabulary words (what reaches the trainer after
# normalized_text): non-empty lowercase alnum
word = st.text(alphabet="ab1", min_size=1, max_size=6)
corpus = st.lists(
    st.tuples(word, st.integers(min_value=1, max_value=9)),
    min_size=1,
    max_size=12,
)


@given(corpus)
@settings(max_examples=200, deadline=None)
def test_training_deterministic_and_bounded(wf):
    m1 = train_bpe(wf, n_merges=50)
    m2 = train_bpe(wf, n_merges=50)
    assert m1 == m2
    assert len(m1) <= 50
    # a merge pair's concatenation never contains a word boundary marker
    # in the middle (END only ever terminates the right element)
    for a, b in m1:
        assert END not in a
        assert not b.startswith(END) or b == END


@given(corpus, st.lists(word, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_encode_roundtrips_any_word(wf, words):
    ranks = {p: i for i, p in enumerate(train_bpe(wf, n_merges=50))}
    for w in words:
        toks = encode_word(w, ranks)
        joined = "".join(toks)
        assert joined == w + END  # exact detokenization, even for OOV
        assert all(t for t in toks)


@given(corpus)
@settings(max_examples=100, deadline=None)
def test_trained_words_fully_merge_when_frequent(wf):
    """A word whose every merge step cleared min_pair_count collapses to
    few tokens; at minimum, encoding the training words applies every
    applicable merge (no pair of adjacent output tokens may itself be a
    trained merge — greedy exhaustion)."""
    merges = train_bpe(wf, n_merges=100)
    ranks = {p: i for i, p in enumerate(merges)}
    rank_set = set(merges)
    for w, _ in wf:
        toks = encode_word(w, ranks)
        for a, b in zip(toks, toks[1:]):
            assert (a, b) not in rank_set, (w, toks, (a, b))
