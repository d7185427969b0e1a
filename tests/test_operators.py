"""Operator-level unit tests: joins (J1-J6), dedup internals, similarity,
plan-shape assertions (pushdown / pruning / broadcast)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import dedup as D
from realtime_fraud_detection_spark.operators import joins as J
from realtime_fraud_detection_spark.operators import similarity as SIM
from realtime_fraud_detection_spark.plans import explain as X
from realtime_fraud_detection_spark.sources.testdata import load_table

from tests.conftest import SF_SMOKE


def test_windowed_stream_join_time_range(spark):
    base = pd.Timestamp("2024-01-01 10:00:00")
    left = spark.createDataFrame(
        pd.DataFrame({"user_id": ["u1", "u1"], "ts": [base, base + pd.Timedelta("20min")], "v": [1, 2]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": ["u1", "u1", "u2"],
                "ts": [base + pd.Timedelta("2min"), base + pd.Timedelta("40min"), base],
                "w": [10, 20, 30],
            }
        )
    )
    out = J.windowed_stream_join(left, right, "user_id").toPandas()
    # (v=1,w=10) within ±5min; others out of range or wrong key
    assert len(out) == 1 and out["v"].iloc[0] == 1 and out["w"].iloc[0] == 10


def test_pattern_similarity_join(spark):
    base = pd.Timestamp("2024-01-01 14:00:00")
    tx = spark.createDataFrame(
        pd.DataFrame(
            {
                "payment_method": ["credit_card"],
                "merchant_category": ["retail"],
                "amount": [250.0],
                "ts": [base],
            }
        )
    )
    pats = spark.createDataFrame(
        pd.DataFrame(
            {
                "payment_method": ["credit_card", "credit_card"],
                "merchant_category": ["retail", "grocery"],
                "amount_range": [200.0, 200.0],
                "hour_of_day": [14, 2],
                "fraud_rate": [0.1, 0.2],
                "occurrence_count": [5, 7],
            }
        )
    )
    out = J.pattern_similarity_join(tx, pats).toPandas()
    assert len(out) == 1  # only the retail pattern shares the composite key
    # sim = 0.3 + 0.4*(1-50/100) + 0.3*(1-0/24)
    assert abs(out["pattern_similarity"].iloc[0] - (0.3 + 0.2 + 0.3)) < 1e-9


def test_multi_stream_correlate_normalizes(spark):
    base = pd.Timestamp("2024-01-01 10:00:00")
    a = spark.createDataFrame(pd.DataFrame({"user_id": ["u1"], "ts": [base], "x": [1]}))
    b = spark.createDataFrame(pd.DataFrame({"user_id": ["u2"], "ts": [base], "y": ["z"]}))
    out = J.multi_stream_correlate([("tx", a), ("behavior", b)]).toPandas()
    assert set(out.columns) == {"user_id", "ts", "kind", "payload"}
    assert set(out["kind"]) == {"tx", "behavior"}


def test_profile_enrich_defaults(spark):
    tx = spark.createDataFrame(
        pd.DataFrame({"user_id": ["u1"], "merchant_id": ["m-missing"], "amount": [10.0]})
    )
    users = spark.createDataFrame(pd.DataFrame({"user_id": ["u1"], "risk_score": [0.9]}))
    merchants = spark.createDataFrame(
        pd.DataFrame({"merchant_id": ["m1"], "risk_level": ["high"], "fraud_rate": [0.1]})
    )
    out = J.profile_enrich(tx, users, merchants).toPandas()
    assert out["risk_level"].iloc[0] == "medium"  # default (TransactionProcessor.java:489-508)
    assert out["fraud_rate"].iloc[0] == 0.05


def test_word_shingles_and_jaccard(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e", "a b c d x"]})
    )
    sh = df.select("doc_id", D.word_shingles(F.col("text"), 3).alias("s")).toPandas()
    assert sh["s"].iloc[0].tolist() == ["a b c", "b c d", "c d e"]
    pairs = spark.createDataFrame(pd.DataFrame({"doc_a": [1], "doc_b": [2]}))
    jac = D.ngram_jaccard(df, pairs, "text", "doc_id", 3).toPandas()
    assert abs(jac["jaccard"].iloc[0] - 2 / 4) < 1e-9  # {abc,bcd} ∩ over union 4


def test_minhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["the quick brown fox jumps", "the quick brown fox jumps", "zzz yyy xxx www vvv"],
            }
        )
    )
    cands = D.minhash_lsh_candidates(df, "text", "doc_id", num_perm=4, band_size=2).toPandas()
    assert {(1, 2)} == set(zip(cands["doc_a"], cands["doc_b"]))


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "spark query engine with fast columnar execution",
                    "spark query engine with fast columnar executions",
                    "completely different words about gardening tulips",
                ],
            }
        )
    )
    out = df.select("doc_id", D.simhash(F.col("text"), 16).alias("h")).toPandas()
    h = dict(zip(out["doc_id"], out["h"]))
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h[1], h[2]) <= ham(h[1], h[3])


def test_brute_force_topk_self_consistency(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).toPandas()
    assert len(out) == 3
    assert (out.sort_values("rank")["cosine_sim"].diff().dropna() <= 0).all()
    assert 0 not in set(out["nid"])  # self excluded


def test_lsh_topk_recall_against_exact(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, q, k=5).toPandas()
    approx = SIM.lsh_topk(emb, q, k=5, n_planes=2, dim=64).toPandas()
    # with 2 planes (4 buckets) recall of top-5 should be decent
    e = set(zip(exact["qid"], exact["nid"]))
    a = set(zip(approx["qid"], approx["nid"]))
    assert len(e & a) / len(e) > 0.3


def test_cosine_topk_pandas_matches_expression(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qpd = emb.filter(F.col("vec_id") < 3).toPandas()
    got = SIM.cosine_topk_pandas(emb, qpd, k=3).toPandas()
    want = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=3).toPandas()
    g = set(zip(got["qid"], got["nid"]))
    w = set(zip(want["qid"], want["nid"]))
    assert g == w


def test_salted_join_matches_plain_join(spark, fraud_data):
    """Salting redistributes skew without changing results."""
    from realtime_fraud_detection_spark.operators.joins import salted_join

    _, _, tx = fraud_data
    left = tx.select("transaction_id", "user_id", "amount")
    right = tx.groupBy("user_id").agg(F.count("*").alias("cnt"))
    plain = left.join(right, "user_id").select("transaction_id", "cnt")
    salted = salted_join(left, right, "user_id", n_salt=4).select("transaction_id", "cnt")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_filter_pushdown_reaches_scan(spark):
    ev = load_table(spark, SF_SMOKE, "lineitem").filter(F.col("l_quantity") > 45).select(
        "l_orderkey", "l_quantity"
    )
    pf = X.pushed_filters(ev)
    assert "l_quantity" in pf
    cols = X.read_schema_columns(ev)
    assert set(cols) == {"l_orderkey", "l_quantity"}  # column pruning


def test_feature_statistics(spark):
    from realtime_fraud_detection_spark.operators.aggregations import feature_statistics

    df = spark.createDataFrame(
        pd.DataFrame({"a": [1.0, 2.0, 3.0, None], "b": [10.0, 10.0, 10.0, 10.0]})
    )
    out = feature_statistics(df, ["a", "b"]).toPandas().set_index("feature")
    assert out.loc["a", "n"] == 3
    assert out.loc["a", "null_count"] == 1
    assert abs(out.loc["a", "mean"] - 2.0) < 1e-12
    assert out.loc["b", "min"] == 10.0 and out.loc["b", "max"] == 10.0


def test_skew_report_flags_hot_key(spark):
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.scaling import skew_report

    # 1000 rows on key 'hot', 100 singleton keys
    df = spark.range(1100).select(
        F.when(F.col("id") < 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k")
    )
    summary, heavy = skew_report(df, ["k"], min_share=0.05)
    s = summary.collect()[0]
    assert s["n_rows"] == 1100 and s["n_keys"] == 101
    assert s["max_key_rows"] == 1000
    assert abs(s["max_share"] - round(1000 / 1100, 6)) < 1e-9
    h = heavy.collect()
    assert len(h) == 1 and h[0]["k"] == "hot" and h[0]["rank"] == 1


def test_skew_report_uniform_keys_empty_heavy_list(spark):
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.scaling import skew_report

    df = spark.range(2000).select((F.col("id") % 500).alias("k"))
    summary, heavy = skew_report(df, ["k"], min_share=0.01)
    s = summary.collect()[0]
    assert s["n_keys"] == 500 and s["p50_key_rows"] == 4
    assert heavy.count() == 0
