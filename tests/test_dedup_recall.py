"""MinHash-LSH at a production-shaped configuration (16 permutations,
4-row bands) against ground truth: every high-Jaccard pair in the documents
fixture must be recovered, with bounded false-candidate overhead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import dedup as D
from realtime_fraud_detection_spark.sources.testdata import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ground_truth_pairs(spark):
    """All-pairs exact Jaccard ≥ 0.8 (brute force on the 500-doc fixture)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    ids = docs.select("doc_id")
    pairs = (
        ids.withColumnRenamed("doc_id", "doc_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    sim = D.ngram_jaccard(docs, pairs, "text", "doc_id", 3)
    return {
        (r["doc_a"], r["doc_b"])
        for r in sim.filter(F.col("jaccard") >= 0.8).collect()
    }


def test_lsh_recall_at_production_config(spark, ground_truth_pairs):
    docs = load_table(spark, SF_SMOKE, "documents")
    cands = D.minhash_lsh_candidates(
        docs, "text", "doc_id", num_perm=16, band_size=4
    )
    got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    truth = ground_truth_pairs
    assert truth, "fixture should contain planted near-duplicates"
    # 4-row bands at jaccard 0.8: P(candidate) = 1-(1-0.8^4)^4 ≈ 0.87 per
    # pair; the planted pairs are ~0.98 → P ≈ 1-(1-0.92)^4 ≈ 0.99996
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9
    # candidate set stays far from all-pairs (bounded false positives)
    assert len(got) < 0.05 * (500 * 499 / 2)


def test_simhash_hamming_separates_near_dups(spark, ground_truth_pairs):
    """64-bit SimHash: planted near-dup pairs sit at much smaller Hamming
    distance than random pairs."""
    docs = load_table(spark, SF_SMOKE, "documents")
    sig = {r["doc"]: r["simhash64"] for r in D.simhash_signatures(docs, "text", "doc_id", bits=64).collect()}
    # two's-complement mask: signatures with bit 63 set are negative longs
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    dup_d = [ham(sig[a], sig[b]) for a, b in ground_truth_pairs]
    import itertools

    some_ids = sorted(sig)[:40]
    rand_d = [ham(sig[a], sig[b]) for a, b in itertools.combinations(some_ids, 2)
              if (a, b) not in ground_truth_pairs]
    # the fixture's docs share one vocabulary, so even unrelated pairs sit
    # close; near-dups must still be measurably closer
    assert sum(dup_d) / len(dup_d) * 2 < sum(rand_d) / len(rand_d)


def test_simhash_banded_pairs_exhaustive_for_bound(spark):
    """simhash_near_dup_pairs must return EXACTLY the pairs within the
    Hamming bound (the pigeonhole band guarantee is exhaustive, not
    probabilistic) — verified against all-pairs brute force on the fixture."""
    docs = load_table(spark, SF_SMOKE, "documents")
    sig = {
        r["doc"]: r["simhash64"]
        for r in D.simhash_signatures(docs, "text", "doc_id", bits=64).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    import itertools

    max_h = 12  # the shared-vocabulary fixture sits close; 12 gives a non-empty set
    truth = {
        (a, b): ham(sig[a], sig[b])
        for a, b in itertools.combinations(sorted(sig), 2)
        if ham(sig[a], sig[b]) <= max_h
    }
    assert truth, "fixture should contain pairs within the bound"
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(
            docs, "text", "doc_id", bits=64, max_hamming=max_h
        ).collect()
    }
    assert got == truth  # exact: same pairs AND same distances


def test_simhash_banded_pairs_bucket_cap(spark):
    """Identical docs all land in one band bucket; the cap drops that bucket
    from pair generation (exact dedup's job), distinct pairs still appear."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(20)]
    # one extra word on a 40-word doc flips ~5 of 64 bits (each bit's vote
    # margin grows with doc length); short docs flip far more
    long_doc = " ".join(f"word{i}" for i in range(40))
    rows += [(100, long_doc), (101, long_doc + " extra")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    uncapped = D.simhash_near_dup_pairs(df, "text", "doc_id", max_hamming=6).collect()
    capped = D.simhash_near_dup_pairs(
        df, "text", "doc_id", max_hamming=6, max_bucket_size=10
    ).collect()
    assert any(r["doc_a"] < 100 for r in uncapped)  # template pairs present uncapped
    assert all(r["doc_a"] >= 100 for r in capped)  # ...gone under the cap
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(100, 101)}


def test_simhash_pairs_with_precomputed_sigs_identical(spark):
    """The `sigs=` short-circuit (the suite's shared signature table) is
    value-identical to computing signatures in-call — same pairs, same
    distances, even with extra columns riding on the signature frame."""
    docs = load_table(spark, SF_SMOKE, "documents")
    fresh = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(
            docs, "text", "doc_id", bits=64, max_hamming=12
        ).collect()
    }
    shared = D.simhash_signatures(docs, "text", "doc_id", bits=(16, 64))
    reused = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(
            docs, "text", "doc_id", bits=64, max_hamming=12, sigs=shared
        ).collect()
    }
    assert fresh == reused
