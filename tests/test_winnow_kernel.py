"""The round-13 Arrow winnow kernel must be BIT-IDENTICAL to the staged
expression form — same fps arrays per document, including the short-doc /
empty-doc degenerate bounds and non-ASCII inputs (the normalization regex
maps everything outside [a-z0-9] to a space on both engines, so substring
semantics agree after it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.dedup import (
    winnow_digest,
    winnow_fingerprint_table,
)


def _parity(spark, rows, k=5, w=4):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    arrow = {
        r["doc_id"]: r["fps"]
        for r in winnow_fingerprint_table(
            df, "text", "doc_id", k=k, w=w, use_arrow=True
        ).collect()
    }
    expr = {
        r["doc_id"]: r["fps"]
        for r in winnow_fingerprint_table(
            df, "text", "doc_id", k=k, w=w, use_arrow=False
        ).collect()
    }
    assert arrow == expr
    assert all(fps == sorted(set(fps)) for fps in arrow.values())
    return arrow


def test_kernel_matches_expression_form(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox JUMPS  over... the lazy dog again and again"),
        (3, "short"),
        (4, "ab"),          # shorter than k -> single whole-text gram
        (5, ""),            # empty -> md5 of empty gram
        (6, None),          # null text behaves like empty
        (7, "a1b2c3d4e5f6g7h8i9j0" * 10),
    ]
    fps = _parity(spark, rows)
    # normalization invariance: 1 and 2 normalize identically
    assert fps[1] == fps[2]
    assert len(fps[4]) == 1 and len(fps[5]) == 1


def test_kernel_matches_on_non_ascii(spark):
    rows = [
        (1, "Héllo wörld ẞtraße — caffè ☕ №42"),
        (2, "ＡＢＣ ｄｅｆ 中文 text mixed 中 here ok"),
        (3, "KK kelvin sign maps to k"),  # U+212A lowercases to 'k'
        (4, "emoji 😀😀😀 run and text after it continues for a while"),
    ]
    _parity(spark, rows)


def test_digest_rides_the_kernel(spark):
    rows = [(i, f"document number {i} with some repeated words {i % 3}") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_fingerprints"], r["fp_digest"]) for r in
           winnow_digest(df, "text", "doc_id", k=5, w=4).collect()}
    assert len(out) == 20 and all(n >= 1 for n, _ in out.values())


def test_kernel_is_one_arrow_crossing(spark):
    from realtime_fraud_detection_spark.plans.explain import formatted_plan

    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    plan = formatted_plan(winnow_fingerprint_table(df, "text", "doc_id"))
    import re

    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "BatchEvalPython" not in plan
