"""Pin the scoring formulas to the reference, term for term:
decision/risk bands (TransactionProcessor.java:444-473), the fraud-rate gate
(:399-401), the velocity score (WindowProcessor.java:327-351), the ML-path
ensemble decision (ensemble_predictor.py:344-369), and the dedup fixes
(short-doc shingles, full-64-bit word hashes)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions import scoring as S
from realtime_fraud_detection_spark.functions.hashing import md5_bigint64
from realtime_fraud_detection_spark.operators import dedup as D


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).first()["x"]


def _col_over(spark, rows, schema, col):
    return [
        r["x"] for r in spark.createDataFrame(rows, schema).select(col.alias("x")).collect()
    ]


def test_decision_bands_match_reference(spark):
    rows = [(0.95,), (0.9,), (0.85,), (0.7,), (0.65,), (0.5,), (0.2,)]
    got = _col_over(
        spark, rows, "s double", S.decision(F.col("s"), F.lit(False))
    )
    assert got == ["DECLINE", "DECLINE", "REVIEW", "REVIEW", "APPROVE", "APPROVE", "APPROVE"]
    # blacklist overrides everything
    assert _one(spark, S.decision(F.lit(0.0), F.lit(True))) == "DECLINE"


def test_risk_bands_match_reference(spark):
    rows = [(0.95,), (0.8,), (0.6,), (0.4,)]
    got = _col_over(spark, rows, "s double", S.risk_level(F.col("s")))
    assert got == ["CRITICAL", "HIGH", "MEDIUM", "LOW"]  # no VERY_LOW on rule path
    assert _one(spark, S.risk_level(F.lit(0.0), F.lit(True))) == "CRITICAL"


def test_ensemble_decision_matches_reference(spark):
    # low confidence forces REVIEW before any probability band
    assert _one(spark, S.ensemble_decision(F.lit(0.99), F.lit(0.5))) == "REVIEW"
    rows = [(0.96,), (0.85,), (0.65,), (0.2,)]
    got = _col_over(
        spark, rows, "p double", S.ensemble_decision(F.col("p"), F.lit(0.9))
    )
    assert got == ["DECLINE", "REVIEW", "APPROVE_WITH_MONITORING", "APPROVE"]
    got_rl = _col_over(spark, rows + [(0.35,)], "p double", S.ensemble_risk_level(F.col("p")))
    assert got_rl == ["CRITICAL", "HIGH", "MEDIUM", "VERY_LOW", "LOW"]


def test_rule_score_fraud_rate_gate(spark):
    """The 2×fraudRate term fires only above 5% (TransactionProcessor.java:
    399-401): rates 0.04 and 0.05 contribute nothing, 0.06 adds 0.12."""

    def score(rate):
        return _one(
            spark,
            S.rule_based_score(
                prior_score=F.lit(0.0),
                user_risk_score=F.lit(0.0),
                is_new_account=F.lit(False),
                is_kyc_verified=F.lit(True),
                merchant_risk_level=F.lit("low"),
                merchant_is_blacklisted=F.lit(False),
                merchant_fraud_rate=F.lit(rate),
                is_high_risk_category=F.lit(False),
                is_large_for_user=F.lit(False),
                is_new_device=F.lit(False),
                is_night_time=F.lit(False),
                within_merchant_hours=F.lit(True),
            ),
        )

    assert score(0.04) == 0.0
    assert score(0.05) == 0.0
    assert abs(score(0.06) - 0.12) < 1e-12


def test_velocity_score_matches_reference(spark):
    """WindowProcessor.java:327-351 hand-computed: 25 tx (>20 → +0.4),
    12000 amount (>10000 → +0.3), fraudRate 5/25 → +0.08, diversity
    2/25 = 0.08 < 0.2 → +0.2 ⇒ 0.98; and the cap at 1.0."""
    v = S.velocity_score(F.lit(25), F.lit(12000.0), F.lit(5), F.lit(2))
    assert abs(_one(spark, v) - 0.98) < 1e-12
    # high diversity is NOT suspicious: 10/25 = 0.4 → no +0.2
    v2 = S.velocity_score(F.lit(25), F.lit(12000.0), F.lit(0), F.lit(10))
    assert abs(_one(spark, v2) - 0.7) < 1e-12
    # strict >: exactly 20/10000 stay in the lower tiers
    v3 = S.velocity_score(F.lit(20), F.lit(10000.0), F.lit(0), F.lit(1))
    assert abs(_one(spark, v3) - (0.2 + 0.2 + 0.2)) < 1e-12
    # cap
    v4 = S.velocity_score(F.lit(100), F.lit(50000.0), F.lit(100), F.lit(1))
    assert _one(spark, v4) == 1.0


def test_md5_bigint64_is_full_width_twos_complement(spark):
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    got = _col_over(
        spark, [(w,) for w in words], "w string", md5_bigint64(F.col("w"), salt="simhash:")
    )
    for w, g in zip(words, got):
        u = int(hashlib.md5(f"simhash:{w}".encode()).hexdigest()[:16], 16)
        expect = u - (1 << 64) if u >= (1 << 63) else u
        assert g == expect
    # at least one of a handful of hashes must exercise the high 4 bits
    assert any((g >> 60) & 0xF != 0 for g in (x & ((1 << 64) - 1) for x in got))


def test_simhash64_high_bits_can_vote(spark):
    """Regression: with 60-bit word hashes, bits 60-63 of simhash64 could
    never be set. With full-width hashes, a corpus of a few docs sets at
    least one of the top 4 bits somewhere."""
    rows = [(i, f"doc number {i} with some distinct words {i * 7} {i * 13}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sigs = [r["simhash64"] for r in D.simhash_signatures(df, "text", "doc_id", bits=64).collect()]
    assert any(((s & ((1 << 64) - 1)) >> 60) & 0xF != 0 for s in sigs)


def test_short_doc_shingles_stay_content_dependent(spark):
    """<k-word docs shingle to the whole text, so two different short docs
    no longer collide into identical MinHash signatures."""
    df = spark.createDataFrame(
        [(1, "red fish"), (2, "blue bird"), (3, "red fish")], "doc_id int, text string"
    )
    sh = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", D.word_shingles(F.col("text"), 3).alias("s")).collect()
    }
    assert sh[1] == ["red fish"]
    assert sh[2] == ["blue bird"]
    sig = D.minhash_signatures(df, "text", "doc_id", num_perm=4)
    rows = {r["doc"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"]) for r in sig.collect()}
    assert rows[1] != rows[2]
    assert rows[1] == rows[3]
