"""Persisted Stupid Backoff LM (functions/ngram_io.py) + the broadcast
scoring path (quality.ngram_lm_logprob(lm=...)): save/load roundtrip
parity vs the in-job corpus path, pruned-model brute-force parity, the
shuffle-free plan guarantee, and artifact validation."""

from __future__ import annotations

import io
import json
import math
import os
import re
from contextlib import redirect_stdout

import pytest

from realtime_fraud_detection_spark.functions import ngram_io
from realtime_fraud_detection_spark.operators.quality import (
    fit_ngram_lm,
    ngram_lm_logprob,
    prune_ngram_lm,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def test_roundtrip_matches_in_job_scoring(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    lm_corpus = docs.filter("doc_id % 3 = 0")

    want = {
        r["doc"]: (r["n_scored"], r["mean_sb_logprob"])
        for r in ngram_lm_logprob(docs, lm_df=lm_corpus).collect()
    }

    path = str(tmp_path / "lm")
    meta = ngram_io.save_ngram_lm(fit_ngram_lm(lm_corpus), path, min_count=1)
    assert meta["counts"]["uni"] > 0
    lm = ngram_io.load_ngram_lm(spark, path)
    got = {
        r["doc"]: (r["n_scored"], r["mean_sb_logprob"])
        for r in ngram_lm_logprob(docs, lm=lm).collect()
    }
    assert set(got) == set(want)
    for d, (n, s) in want.items():
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(s, abs=1e-12), d


def _brute_force_pruned(lm_texts, texts, min_count, alpha=0.4):
    def toks(t):
        return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]

    uni, bi, tri = {}, {}, {}
    n = 0
    for t in lm_texts:
        ws = toks(t)
        n += len(ws)
        for i, w in enumerate(ws):
            uni[w] = uni.get(w, 0) + 1
            if i >= 1:
                bi[(ws[i - 1], w)] = bi.get((ws[i - 1], w), 0) + 1
            if i >= 2:
                k = (ws[i - 2], ws[i - 1], w)
                tri[k] = tri.get(k, 0) + 1
    uni = {k: v for k, v in uni.items() if v >= min_count}
    bi = {k: v for k, v in bi.items() if v >= min_count}
    tri = {k: v for k, v in tri.items() if v >= min_count}
    out = {}
    for d, t in texts.items():
        logs = []
        ws = toks(t)
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


def test_pruned_model_matches_brute_force(spark, tmp_path):
    # "a b" seen 3x (survives min_count=2), "b c"/"c d" once (pruned),
    # "e" twice as a unigram-only survivor, "d" pruned singleton
    lm_texts = ["a b a b a b e", "b c d e"]
    lm_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lm_texts)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "a b c d e a b"), (2, "z a b")], "doc_id long, text string"
    )
    path = str(tmp_path / "lm2")
    ngram_io.save_ngram_lm(fit_ngram_lm(lm_df), path, min_count=2)
    lm = ngram_io.load_ngram_lm(spark, path)
    got = {
        r["doc"]: r["mean_sb_logprob"]
        for r in ngram_lm_logprob(docs, lm=lm).collect()
    }
    want = _brute_force_pruned(
        lm_texts, {1: "a b c d e a b", 2: "z a b"}, min_count=2
    )
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12), d


def test_prune_keeps_backoff_closure(spark):
    lm_df = spark.createDataFrame(
        [(0, "a b a b a b c")], "doc_id long, text string"
    )
    lm = prune_ngram_lm(fit_ngram_lm(lm_df), 2)
    tri_rows = {(r["w2"], r["w1"], r["w"]) for r in lm.tri.collect()}
    bi_rows = {(r["w1"], r["w"]) for r in lm.bi.collect()}
    uni_rows = {r["w"] for r in lm.uni.collect()}
    for w2, w1, w in tri_rows:  # every surviving trigram's contexts survive
        assert (w2, w1) in bi_rows
        assert (w1, w) in bi_rows
    for w1, w in bi_rows:
        assert w1 in uni_rows
    assert float(lm.n_corpus) == 7.0  # total stays UNPRUNED


def test_broadcast_scoring_plan_is_shuffle_free_on_lm_side(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "lm3")
    ngram_io.save_ngram_lm(
        fit_ngram_lm(docs.filter("doc_id % 3 = 0")), path, min_count=2
    )
    lm = ngram_io.load_ngram_lm(spark, path)
    out = ngram_lm_logprob(docs, lm=lm)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_artifact_validation(spark, tmp_path):
    bad = tmp_path / "bad"
    os.makedirs(bad)
    with open(bad / "meta.json", "w") as f:
        json.dump({"format": "something-else", "kind": "nope"}, f)
    with pytest.raises(ValueError):
        ngram_io.load_ngram_lm(spark, str(bad))
    with pytest.raises(FileNotFoundError):
        ngram_io.load_ngram_lm(spark, str(tmp_path / "missing"))


def test_save_overwrites_atomically(spark, tmp_path):
    a = spark.createDataFrame([(0, "x y x y")], "doc_id long, text string")
    b = spark.createDataFrame([(0, "p q")], "doc_id long, text string")
    path = str(tmp_path / "lm4")
    ngram_io.save_ngram_lm(fit_ngram_lm(a), path)
    ngram_io.save_ngram_lm(fit_ngram_lm(b), path)
    lm = ngram_io.load_ngram_lm(spark, path)
    assert {r["w"] for r in lm.uni.collect()} == {"p", "q"}
    assert lm.n_corpus == 2.0
