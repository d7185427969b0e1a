"""CCNet head/middle/tail perplexity bucketing (quality.perplexity_buckets):
cut-point parity with NumPy's linear-interpolation percentile, ordering
invariants, and composition with stratified sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.quality import (
    ngram_lm_logprob,
    perplexity_buckets,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    scores = ngram_lm_logprob(docs, lm_df=docs.filter("doc_id % 3 = 0"))
    rows = perplexity_buckets(scores).collect()
    return rows


def test_cuts_match_numpy_percentile(bucketed):
    vals = np.array([r["mean_sb_logprob"] for r in bucketed])
    head_cut = np.percentile(vals, 100 * (1 - 1 / 3))  # linear interp,
    mid_cut = np.percentile(vals, 100 * (1 - 2 / 3))  # same as Spark percentile
    for r in bucketed:
        v = r["mean_sb_logprob"]
        want = "head" if v > head_cut else ("middle" if v > mid_cut else "tail")
        assert r["bucket"] == want, (r, head_cut, mid_cut)


def test_buckets_are_ordered_and_roughly_even(bucketed):
    by = {}
    for r in bucketed:
        by.setdefault(r["bucket"], []).append(r["mean_sb_logprob"])
    assert set(by) == {"head", "middle", "tail"}
    assert min(by["head"]) > max(by["middle"]) - 1e-12
    assert min(by["middle"]) > max(by["tail"]) - 1e-12
    n = len(bucketed)
    for b in by.values():  # interpolated cuts keep buckets within a few docs
        assert abs(len(b) - n / 3) <= 0.05 * n + 2


def test_composes_with_stratified_sampling(spark, bucketed):
    from realtime_fraud_detection_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(bucketed)
    kept = stratified_sample(
        df, "doc", "bucket", {"head": 1.0, "middle": 0.5, "tail": 0.0}
    )
    got = {r["bucket"] for r in kept.select("bucket").distinct().collect()}
    assert "tail" not in got and "head" in got


def test_approx_variant_keeps_ordering_invariant(spark):
    """The scale path (percentile_approx cuts) must preserve the bucket
    ORDER invariant exactly; only boundary membership may shift."""
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    scores = ngram_lm_logprob(docs, lm_df=docs.filter("doc_id % 3 = 0"))
    rows = perplexity_buckets(scores, exact=False).collect()
    by = {}
    for r in rows:
        by.setdefault(r["bucket"], []).append(r["mean_sb_logprob"])
    assert set(by) == {"head", "middle", "tail"}
    assert min(by["head"]) > max(by["middle"]) - 1e-12
    assert min(by["middle"]) > max(by["tail"]) - 1e-12
