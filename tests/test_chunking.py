"""chunk_documents: window/stride math, edge docs, and DuckDB parity on the
documents fixture (chunk_id = start/stride lets the oracle avoid ordinality)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.sampling import chunk_documents

from conftest import SF_SMOKE


def test_chunking_basic(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x"), (4, "  p   q  ")],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_tokens=3, stride=2)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert rows[(1, 0)]["chunk_text"] == "a b c"
    assert rows[(1, 1)]["chunk_text"] == "c d e"  # overlap of 1
    assert rows[(1, 3)]["chunk_text"] == "g"
    assert rows[(1, 3)]["chunk_tokens"] == 1
    assert rows[(1, 0)]["n_chunks"] == 4
    # empty doc → one empty chunk with zero tokens
    assert rows[(2, 0)]["chunk_text"] == "" and rows[(2, 0)]["chunk_tokens"] == 0
    # single token, multi-space normalization
    assert rows[(3, 0)]["chunk_text"] == "x"
    assert rows[(4, 0)]["chunk_text"] == "p q"


def test_chunking_stride_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=3, stride=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=3, stride=0)


def test_chunking_token_conservation(spark):
    """With stride == chunk_tokens (no overlap) every token lands in exactly
    one chunk."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
    out = chunk_documents(docs, chunk_tokens=50, stride=50)
    got = out.groupBy("doc_id").agg(F.sum("chunk_tokens").alias("t")).collect()
    want = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id",
            F.when(F.length(F.trim("text")) == 0, 0)
            .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
            .alias("t"),
        ).collect()
    }
    for r in got:
        assert r["t"] == want[r["doc_id"]]


def test_chunking_matches_duckdb(spark):
    out = (
        chunk_documents(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet"),
            chunk_tokens=40,
            stride=30,
        )
        .orderBy("doc_id", "chunk_id")
        .toPandas()
    )
    con = duckdb.connect()
    oracle = con.execute(
        rf"""
        WITH w AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE string_split_regex(trim(text), '\s+') END AS w
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
        ), st AS (
          SELECT doc_id, w,
                 generate_series(0, greatest(len(w) - 1, 0), 30) AS starts
          FROM w
        ), e AS (
          SELECT doc_id, w, len(starts) AS n_chunks,
                 UNNEST(starts) AS start
          FROM st
        )
        SELECT doc_id, start // 30 AS chunk_id, n_chunks,
               array_to_string(w[start + 1 : start + 40], ' ') AS chunk_text,
               len(w[start + 1 : start + 40]) AS chunk_tokens
        FROM e ORDER BY doc_id, chunk_id
        """
    ).fetchdf()
    assert len(out) == len(oracle)
    for col in ["doc_id", "chunk_id", "n_chunks", "chunk_tokens"]:
        assert (out[col].values == oracle[col].values).all(), col
    assert (out["chunk_text"].values == oracle["chunk_text"].values).all()
