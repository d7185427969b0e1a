"""retrieval_metrics / class_report / multiclass_summary
(ml/evaluation.py): hand-computed cases, a Python replay on fixture-built
retrieval runs, and sklearn-convention pins for the multiclass report.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.evaluation import (
    class_report,
    multiclass_summary,
    retrieval_metrics,
)


def _results(spark):
    # query 1: relevant docs {10, 20, 30}; ranked list hits 10@1, 30@3
    # query 2: relevant {40}; ranked list misses entirely
    rows = [
        (1, 10, 1), (1, 99, 2), (1, 30, 3), (1, 98, 4),
        (2, 97, 1), (2, 96, 2),
    ]
    res = spark.createDataFrame(rows, "query_id long, doc_id long, rank int")
    truth = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 40)], "query_id long, doc_id long"
    )
    return res, truth


def test_retrieval_metrics_hand_computed(spark):
    res, truth = _results(spark)
    out = {
        r["query_id"]: r
        for r in retrieval_metrics(res, truth, k=3, rank_col="rank").collect()
    }
    q1 = out[1]
    assert q1["n_rel"] == 3 and q1["n_hit"] == 2
    assert q1["recall_at_k"] == 2 / 3  # achievable max is min(3, 3)
    assert q1["precision_at_k"] == 2 / 3
    assert q1["reciprocal_rank"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(q1["ndcg_at_k"] - dcg / idcg) < 1e-12
    q2 = out[2]
    assert q2["n_hit"] == 0 and q2["recall_at_k"] == 0.0
    assert q2["reciprocal_rank"] == 0.0 and q2["ndcg_at_k"] == 0.0


def test_rank_derivation_from_scores_tie_broken(spark):
    res = spark.createDataFrame(
        [(1, 10, 0.9), (1, 20, 0.9), (1, 30, 0.5)],
        "query_id long, doc_id long, score double",
    )
    truth = spark.createDataFrame([(1, 20)], "query_id long, doc_id long")
    # tie at 0.9 broken by doc_id asc: doc 10 rank 1, doc 20 rank 2
    r = retrieval_metrics(res, truth, k=2, score_col="score").first()
    assert r["reciprocal_rank"] == 0.5


def test_rank_xor_score_required(spark):
    res, truth = _results(spark)
    with pytest.raises(ValueError):
        retrieval_metrics(res, truth, k=3)
    with pytest.raises(ValueError):
        retrieval_metrics(res, truth, k=3, rank_col="rank", score_col="rank")


def test_retrieval_metrics_python_replay_on_fixture(spark):
    """Brute-force cosine top-k over the embeddings fixture, truth =
    same-label pairs; the operator must match an independent replay."""
    from realtime_fraud_detection_spark.sources.testdata import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings", fan_out=True)
        .filter(F.col("vec_id") < 120)
        .select("vec_id", "embedding", "label")
    )
    rows = emb.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return num / den if den else 0.0

    queries = sorted(vecs)[:10]
    k = 5
    res_rows, truth_rows = [], []
    for q in queries:
        scored = sorted(
            ((cos(vecs[q], vecs[d]), d) for d in vecs if d != q),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (s, d) in enumerate(scored[:k], start=1):
            res_rows.append((q, d, rank))
        truth_rows += [
            (q, d) for d in vecs if d != q and labels[d] == labels[q]
        ]
    res = spark.createDataFrame(
        res_rows, "query_id long, doc_id long, rank int"
    )
    truth = spark.createDataFrame(truth_rows, "query_id long, doc_id long")
    got = {
        r["query_id"]: r
        for r in retrieval_metrics(res, truth, k=k, rank_col="rank").collect()
    }
    # independent replay
    for q in queries:
        rel = {d for qq, d in truth_rows if qq == q}
        hits = [r for (qq, d, r) in res_rows if qq == q and d in rel]
        r = got[q]
        assert r["n_hit"] == len(hits)
        assert r["recall_at_k"] == len(hits) / min(len(rel), k)
        want_rr = 1.0 / min(hits) if hits else 0.0
        assert r["reciprocal_rank"] == want_rr


def test_class_report_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")],
        "label string, prediction string",
    )
    rep = {r["cls"]: r for r in class_report(df).collect()}
    a = rep["a"]
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (2, 1, 1, 1)
    assert a["precision"] == 0.5 and a["recall"] == 0.5 and a["f1"] == 0.5
    b = rep["b"]
    assert (b["support"], b["tp"], b["fp"]) == (2, 2, 1)
    assert b["precision"] == 2 / 3 and b["recall"] == 1.0
    c = rep["c"]  # never predicted: precision null, recall 0
    assert c["precision"] is None and c["recall"] == 0.0 and c["fp"] == 0


def test_multiclass_summary_sklearn_convention(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")],
        "label string, prediction string",
    )
    s = multiclass_summary(df).first()
    assert s["n"] == 5 and s["accuracy"] == 3 / 5
    # per-class f1: a=0.5, b=0.8, c=0 (null -> 0, zero_division=0)
    assert abs(s["macro_f1"] - (0.5 + 0.8 + 0.0) / 3) < 1e-12
    assert abs(s["macro_recall"] - (0.5 + 1.0 + 0.0) / 3) < 1e-12


def test_class_report_pred_only_class(spark):
    df = spark.createDataFrame(
        [("a", "z"), ("a", "a")], "label string, prediction string"
    )
    rep = {r["cls"]: r for r in class_report(df).collect()}
    z = rep["z"]  # predicted but never true
    assert z["support"] == 0 and z["fp"] == 1 and z["recall"] is None


def test_suite_retrieval_eval(spark):
    """Round-12 driver query: 32 fixed queries, metrics bounded, and a
    query's own vector never counts as a hit (self excluded from truth)."""
    from realtime_fraud_detection_spark.suite.mlops_q import (
        q_retrieval_eval,
    )
    from tests.conftest import SF_SMOKE

    rows = q_retrieval_eval(spark, SF_SMOKE).collect()
    assert len(rows) == 32
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert 0.0 <= r["precision_at_k"] <= 1.0
        assert 0.0 <= r["reciprocal_rank"] <= 1.0
        assert 0.0 <= r["ndcg_at_k"] <= 1.0
        assert r["n_hit"] <= min(r["n_rel"], 10)


# DuckDB twin of the q_retrieval_eval suite query — the floor-rounded
# form was promoted into ORACLES round 13 (suite/mlops_q.SQL_RETRIEVAL_EVAL);
# this copy stays UNROUNDED as the stronger pytest pin on the exact-math
# columns: ranks replay SQL_ANN_TOPK's rounded-
# cosine/row_number derivation, recall/precision/rr are small-int ratios
# (bit-exact), DCG/IDCG replay Spark's ascending fold with an ORDER BY
# list_reduce — the per-term 1/(ln(r+1)/ln(2)) is transcendental, so
# ndcg is compared at 1e-12 (the only non-exact column; the suite query
# rounds it to 6 dp).
_DUCK_RETRIEVAL = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS qid, label AS qlabel, e AS qe FROM v WHERE vec_id < 32),
scored AS (
  SELECT qid, v.vec_id AS nid,
    ROUND(
      list_sum(list_transform(range(1, 65), i -> qe[i] * v.e[i]))
      / (SQRT(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])))
         * SQRT(list_sum(list_transform(range(1, 65), i -> v.e[i] * v.e[i])))),
    6) AS cosine_sim
  FROM q CROSS JOIN v WHERE qid <> v.vec_id
),
topk AS (
  SELECT qid, nid, r FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, nid ASC) AS r
    FROM scored) WHERE r <= 10
),
rel AS (
  SELECT q.qid, v.vec_id AS nid
  FROM q JOIN v ON q.qlabel = v.label AND q.qid <> v.vec_id
),
n_rel AS (SELECT qid, COUNT(*) AS n_rel FROM rel GROUP BY qid),
hits AS (
  SELECT t.qid, COUNT(*) AS n_hit, MIN(t.r) AS first_r,
         list(t.r ORDER BY t.r) AS ranks
  FROM topk t JOIN rel USING (qid, nid) GROUP BY t.qid
)
SELECT n_rel.qid AS query_id, n_rel.n_rel,
  COALESCE(hits.n_hit, 0) AS n_hit,
  COALESCE(hits.n_hit, 0) / LEAST(n_rel.n_rel, 10) AS recall_at_k,
  COALESCE(hits.n_hit, 0) / 10.0 AS precision_at_k,
  COALESCE(1.0 / hits.first_r, 0.0) AS reciprocal_rank,
  COALESCE(
    list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(hits.ranks, r -> 1.0 / (ln(r + 1) / ln(2)))),
      (acc, x) -> acc + x)
    / list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(1, LEAST(n_rel.n_rel, 10) + 1), i -> 1.0 / (ln(i + 1) / ln(2)))),
        (acc, x) -> acc + x),
    0.0) AS ndcg_at_k
FROM n_rel LEFT JOIN hits ON n_rel.qid = hits.qid
ORDER BY query_id
"""


def test_suite_retrieval_eval_duckdb_twin(spark):
    import duckdb

    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.ml.evaluation import (
        retrieval_metrics,
    )
    from realtime_fraud_detection_spark.operators.similarity import (
        brute_force_topk,
    )
    from realtime_fraud_detection_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 32)
    results = brute_force_topk(emb, queries, k=10).select(
        F.col("qid").alias("query_id"),
        F.col("nid").alias("doc_id"),
        "rank",
    )
    truth = (
        queries.select(F.col("vec_id").alias("query_id"), "label")
        .join(emb.select(F.col("vec_id").alias("doc_id"), "label"), "label")
        .filter(F.col("query_id") != F.col("doc_id"))
        .select("query_id", "doc_id")
    )
    got = {
        r["query_id"]: r
        for r in retrieval_metrics(
            results, truth, k=10, rank_col="rank"
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    want = con.execute(_DUCK_RETRIEVAL).fetchall()
    assert len(want) == len(got) > 0
    for qid, n_rel, n_hit, rec, prec, rr, ndcg in want:
        g = got[qid]
        assert g["n_rel"] == n_rel and g["n_hit"] == n_hit, qid
        assert g["recall_at_k"] == rec, qid
        assert g["precision_at_k"] == prec, qid
        assert g["reciprocal_rank"] == rr, qid
        assert abs(g["ndcg_at_k"] - ndcg) < 1e-12, qid
