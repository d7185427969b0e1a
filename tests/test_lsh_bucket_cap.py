"""max_bucket_size: LSH buckets above the cap are excluded from candidate
generation (their B² pair blow-up belongs to exact dedup, which handles the
identical-template case in O(B)) while normal near-dup pairs survive."""

from __future__ import annotations

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
