"""The round-13 Arrow simhash kernel must be BIT-IDENTICAL to the
explode+groupBy expression form — same simhash{b} values per document
for every width, including empty / punctuation-only / non-ASCII inputs,
and the SAME row set (a NULL-text doc is dropped by both forms: the
expression form's explode over a NULL word array yields no votes row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.dedup import simhash_signatures


def _parity(spark, rows, bits=(16, 64)):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    arrow = {
        r["doc"]: tuple(r[f"simhash{b}"] for b in bits)
        for r in simhash_signatures(
            df, "text", "doc_id", bits=bits, use_arrow=True
        ).collect()
    }
    expr = {
        r["doc"]: tuple(r[f"simhash{b}"] for b in bits)
        for r in simhash_signatures(
            df, "text", "doc_id", bits=bits, use_arrow=False
        ).collect()
    }
    assert arrow == expr
    return arrow


def test_kernel_matches_expression_form(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox JUMPS  over... the lazy dog again and again"),
        (3, "short"),
        (4, "!!!"),  # normalizes to empty -> the empty word still votes
        (5, ""),  # empty text -> the empty word still votes
        (6, None),  # NULL text -> row dropped by BOTH forms
        (7, "a1b2c3d4e5f6g7h8i9j0 " * 10),
    ]
    sigs = _parity(spark, rows)
    # normalization invariance: 1 and 2 normalize identically
    assert sigs[1] == sigs[2]
    # empty-normalized docs still get a signature (the empty word votes)
    assert 4 in sigs and 5 in sigs and sigs[4] == sigs[5]
    # NULL text dropped, replaying the expression form's explode(NULL)
    assert 6 not in sigs
    # bit 63 can be populated in the 64-bit form (md5_bigint64 not the
    # 60-bit truncation): at least sign variety across docs
    assert any(v < 0 for _, v in sigs.values()) or all(
        v >= 0 for _, v in sigs.values()
    )


def test_kernel_matches_on_non_ascii(spark):
    rows = [
        (1, "Héllo wörld ẞtraße — caffè ☕ №42"),
        (2, "ＡＢＣ ｄｅｆ 中文 text mixed 中 here ok"),
        (3, "KK kelvin sign maps to k"),  # U+212A lowercases to 'k'
        (4, "emoji 😀😀😀 run and text after it continues for a while"),
    ]
    _parity(spark, rows)


def test_single_width_form(spark):
    rows = [(i, f"document number {i} with words {i % 3}") for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {
        r["doc"]: r["simhash64"]
        for r in simhash_signatures(
            df, "text", "doc_id", bits=64, use_arrow=True
        ).collect()
    }
    e = {
        r["doc"]: r["simhash64"]
        for r in simhash_signatures(
            df, "text", "doc_id", bits=64, use_arrow=False
        ).collect()
    }
    assert a == e and len(a) == 12


def test_kernel_is_one_arrow_crossing_no_exchange(spark):
    """The kernel form needs NO shuffle: the signature is per-document, so
    the whole chain is one MapInPandas over the scan — where the
    expression form exchanges (doc, vote-partials) for the groupBy."""
    import re

    from realtime_fraud_detection_spark.plans.explain import formatted_plan

    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    plan = formatted_plan(simhash_signatures(df, "text", "doc_id", bits=(16, 64)))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
