"""Stupid Backoff trigram LM scoring (quality.ngram_lm_logprob):
hand-computed self-LM values, cross-corpus backoff + OOV paths, and
brute-force Python reference parity over the documents fixture."""

from __future__ import annotations

import math
import re

import pytest

from realtime_fraud_detection_spark.operators.quality import ngram_lm_logprob
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

LM_ROWS = [(1, "a b a b"), (2, "a b c")]
# counts over LM_ROWS: N=7; uni a3 b3 c1; bi (a,b)3 (b,a)1 (b,c)1;
# tri (a,b,a)1 (b,a,b)1 (a,b,c)1


def _lg(x):
    return math.log10(x)


def test_self_lm_hand_computed(spark):
    df = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    out = {r["doc"]: r for r in ngram_lm_logprob(df).collect()}
    # doc1 "a b a b": 3/7, bi(a,b)/a=3/3, tri(a,b,a)/bi(a,b)=1/3,
    #                 tri(b,a,b)/bi(b,a)=1/1
    exp1 = (_lg(3 / 7) + _lg(1.0) + _lg(1 / 3) + _lg(1.0)) / 4
    # doc2 "a b c": 3/7, 3/3, tri(a,b,c)/bi(a,b)=1/3
    exp2 = (_lg(3 / 7) + _lg(1.0) + _lg(1 / 3)) / 3
    assert out[1]["n_scored"] == 4
    assert out[1]["mean_sb_logprob"] == pytest.approx(exp1, abs=1e-12)
    assert out[2]["mean_sb_logprob"] == pytest.approx(exp2, abs=1e-12)


def test_cross_corpus_backoff_and_oov(spark):
    lm = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    df = spark.createDataFrame([(9, "a b x c b a")], "doc_id long, text string")
    row = ngram_lm_logprob(df, lm_df=lm).first()
    a = 0.4
    expected = [
        3 / 7,            # 'a' unigram start
        1.0,              # 'b' | a: bigram start, bi(a,b)/uni(a)
        a * a * 1 / 7,    # 'x' | a b: OOV everywhere -> α²·1/N
        a * a * 1 / 7,    # 'c' | b x: no tri/bi -> α²·uni(c)/N
        a * a * 3 / 7,    # 'b' | x c: no tri/bi -> α²·uni(b)/N
        a * 1 / 3,        # 'a' | c b: no tri, bi(b,a)/uni(b)=1/3 -> α/3
    ]
    exp = sum(_lg(s) for s in expected) / len(expected)
    assert row["n_scored"] == 6
    assert row["mean_sb_logprob"] == pytest.approx(exp, abs=1e-12)


def _brute_force(texts: dict[int, str], alpha=0.4) -> dict[int, float]:
    toks = {
        d: [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]
        for d, t in texts.items()
    }
    uni, bi, tri = {}, {}, {}
    for ws in toks.values():
        for i, w in enumerate(ws):
            uni[w] = uni.get(w, 0) + 1
            if i >= 1:
                bi[(ws[i - 1], w)] = bi.get((ws[i - 1], w), 0) + 1
            if i >= 2:
                k = (ws[i - 2], ws[i - 1], w)
                tri[k] = tri.get(k, 0) + 1
    n = sum(uni.values())
    out = {}
    for d, ws in toks.items():
        logs = []
        for i, w in enumerate(ws):
            w1 = ws[i - 1] if i >= 1 else None
            w2 = ws[i - 2] if i >= 2 else None
            if w2 is not None and (w2, w1, w) in tri:
                s = tri[(w2, w1, w)] / bi[(w2, w1)]
            elif w2 is not None and (w1, w) in bi:
                s = alpha * bi[(w1, w)] / uni[w1]
            elif w2 is not None:
                s = alpha * alpha * uni.get(w, 1) / n
            elif w1 is not None and (w1, w) in bi:
                s = bi[(w1, w)] / uni[w1]
            elif w1 is not None:
                s = alpha * uni.get(w, 1) / n
            else:
                s = uni.get(w, 1) / n
            logs.append(math.log10(s))
        if logs:
            out[d] = sum(logs) / len(logs)
    return out


def test_fixture_matches_brute_force(spark):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    got = {
        r["doc"]: r["mean_sb_logprob"] for r in ngram_lm_logprob(docs).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = _brute_force(texts)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d
        assert got[d] <= 0.0  # scores are probabilities-or-less
