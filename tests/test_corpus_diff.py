"""corpus_diff (operators/curation.py) + best_threshold (ml/evaluation.py):
hand-computed deltas, normalization-invariance of 'changed', bit-exact
DuckDB parity for the diff summary, and operating-point selection laws."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.evaluation import best_threshold
from realtime_fraud_detection_spark.operators.curation import corpus_diff

SF = "/root/testdata/sf0.001"


def test_corpus_diff_hand_computed(spark):
    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "delta epsilon"),
            (3, "kept exactly"),
            (4, "Kept, EXACTLY!"),  # doc 4 changes only punctuation/case
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (2, "delta epsilon zeta"),  # changed (+1 token)
            (3, "kept exactly"),  # unchanged
            (4, "kept exactly"),  # unchanged under normalization
            (5, "brand new doc"),  # added
        ],
        "doc_id long, text string",
    )
    summary, per_doc = corpus_diff(old, new)
    s = {r["status"]: r for r in summary.collect()}
    assert s["added"]["n_docs"] == 1 and s["added"]["tokens"] == 3
    assert s["removed"]["n_docs"] == 1 and s["removed"]["tokens"] == 3
    assert s["changed"]["n_docs"] == 1 and s["changed"]["token_delta"] == 1
    assert s["unchanged"]["n_docs"] == 2
    d = {r["doc_id"]: r["status"] for r in per_doc.collect()}
    assert d == {
        1: "removed",
        2: "changed",
        3: "unchanged",
        4: "unchanged",
        5: "added",
    }


def test_corpus_diff_duckdb_parity(spark):
    import duckdb

    from realtime_fraud_detection_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents", fan_out=True)
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" extraqz"))
        ).otherwise(F.col("text")),
    )
    summary, _ = corpus_diff(old, new)
    got = [tuple(r) for r in summary.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(
        r"""
WITH old AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
  FROM documents WHERE doc_id % 7 != 0
), new AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(t), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         CASE WHEN trim(t) = '' THEN 0
              ELSE len(string_split_regex(trim(t), '\s+')) END AS toks
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN text || ' extraqz' ELSE text END AS t
        FROM documents WHERE doc_id % 5 != 0)
), j AS (
  SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
         CASE WHEN old.fp IS NULL THEN 'added'
              WHEN new.fp IS NULL THEN 'removed'
              WHEN old.fp = new.fp THEN 'unchanged'
              ELSE 'changed' END AS status,
         COALESCE(old.toks, 0) AS tokens_old,
         COALESCE(new.toks, 0) AS tokens_new
  FROM old FULL JOIN new ON old.doc_id = new.doc_id
)
SELECT status, COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN status = 'removed' THEN tokens_old ELSE tokens_new END)::BIGINT AS tokens,
       SUM(tokens_new - tokens_old)::BIGINT AS token_delta
FROM j GROUP BY status ORDER BY status
"""
    ).fetchall()
    assert got == want and len(got) == 4


def _scored(spark):
    rows = [(0.1, 0), (0.2, 1), (0.2, 0), (0.6, 1), (0.9, 1)]
    return spark.createDataFrame(rows, "score double, label int")


def test_best_threshold_f1(spark):
    # sweep: t=0.15 -> tp3 fp1 f1=6/7; t=0.5 -> tp2 fn1 f1=4/5; t=0.7 -> f1=2/4
    r = best_threshold(_scored(spark), [0.15, 0.5, 0.7]).first()
    assert r["threshold"] == 0.15 and r["f1"] == 6 / 7


def test_best_threshold_cost_and_tie_break(spark):
    # heavy fn cost pushes the threshold down; equal-cost ties pick lower t
    r = best_threshold(
        _scored(spark), [0.15, 0.5, 0.7], objective="cost", fn_cost=10.0
    ).first()
    assert r["threshold"] == 0.15
    df = spark.createDataFrame([(0.3, 1), (0.7, 0)], "score double, label int")
    # both thresholds below 0.3 give identical confusion -> lower wins
    r = best_threshold(df, [0.1, 0.2], objective="cost").first()
    assert r["threshold"] == 0.1


def test_best_threshold_objective_validated(spark):
    with pytest.raises(ValueError):
        best_threshold(_scored(spark), [0.5], objective="youden")
