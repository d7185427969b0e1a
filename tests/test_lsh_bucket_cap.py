"""max_bucket_size: LSH buckets above the cap are excluded from candidate
generation (their B² pair blow-up belongs to exact dedup, which handles the
identical-template case in O(B)) while normal near-dup pairs survive."""

from __future__ import annotations

import pytest

from realtime_fraud_detection_spark.operators import dedup as D

TEMPLATE = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
NEAR_A = "a genuinely unique document about spark partitioning strategies and shuffle costs"
NEAR_B = "a genuinely unique document about spark partitioning strategies and shuffle sizes"


def _corpus(spark, n_template=30):
    rows = [(i, TEMPLATE) for i in range(n_template)]
    rows += [(100, NEAR_A), (101, NEAR_B)]
    rows += [(200 + i, f"filler text number {i} with distinct content {i * 17}") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _pairs(spark, **kw):
    cands = D.minhash_lsh_candidates(
        _corpus(spark), "text", "doc_id", num_perm=4, band_size=2, **kw
    )
    return {(r["doc_a"], r["doc_b"]) for r in cands.collect()}


def test_uncapped_explodes_template_bucket(spark):
    pairs = _pairs(spark)
    template_pairs = {p for p in pairs if p[0] < 100 and p[1] < 100}
    assert len(template_pairs) == 30 * 29 // 2  # the B^2 blow-up
    assert (100, 101) in pairs


def test_capped_drops_template_keeps_near_dups(spark):
    pairs = _pairs(spark, max_bucket_size=10)
    assert all(not (p[0] < 100 and p[1] < 100) for p in pairs)
    assert (100, 101) in pairs
    # exact dedup still collapses the template cluster, in O(B)
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.functions.text import fingerprint

    exact = D.exact_dedup(_corpus(spark), fingerprint(F.col("text")), "doc_id")
    assert exact.filter(F.col("dup_count") == 30).count() == 1


def test_cap_above_bucket_sizes_is_noop(spark):
    assert _pairs(spark, max_bucket_size=1000) == _pairs(spark)


def test_lsh_plan_closed_form():
    from realtime_fraud_detection_spark.operators.dedup import (
        lsh_collision_prob,
        lsh_plan,
    )

    # num_perm=16, target 0.8: candidates r=4/b=4 (mid 0.707) vs r=8/b=2
    # (mid 0.917) — 0.707 is closer
    bands, rows, mid = lsh_plan(0.8, 16)
    assert (bands, rows) == (4, 4)
    assert abs(mid - 0.25**0.25) < 1e-12
    # a low threshold wants many bands of few rows (recall config)
    bands_lo, rows_lo, _ = lsh_plan(0.3, 16)
    assert rows_lo < rows
    # S-curve sanity: collision prob increases with similarity and is
    # ~50% at the midpoint
    assert lsh_collision_prob(mid, bands, rows) == pytest.approx(
        1 - (1 - 0.25) ** 4
    )
    assert lsh_collision_prob(0.95, bands, rows) > 0.9
    assert lsh_collision_prob(0.2, bands, rows) < 0.01
