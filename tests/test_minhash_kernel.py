"""The round-13 Arrow minhash kernel must be BIT-IDENTICAL to the
explode+groupBy expression form — same mh{p} values per document for
every permutation, including short-doc fallback / empty /
punctuation-only / non-ASCII inputs, and the SAME row set (a NULL-text
doc is KEPT by both forms and hashes like the empty doc: in the
expression chain concat_ws(" ", NULL_word_array) is "", so the
short-doc fallback emits the empty shingle)."""

from __future__ import annotations

from realtime_fraud_detection_spark.operators.dedup import minhash_signatures


def _parity(spark, rows, num_perm=4, shingle_k=3):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    arrow = {
        r["doc"]: tuple(r[f"mh{p}"] for p in range(num_perm))
        for r in minhash_signatures(
            df, "text", "doc_id", num_perm=num_perm, shingle_k=shingle_k,
            use_arrow=True,
        ).collect()
    }
    expr = {
        r["doc"]: tuple(r[f"mh{p}"] for p in range(num_perm))
        for r in minhash_signatures(
            df, "text", "doc_id", num_perm=num_perm, shingle_k=shingle_k,
            use_arrow=False,
        ).collect()
    }
    assert arrow == expr
    return arrow


def test_kernel_matches_expression_form(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "The  quick BROWN fox... jumps over the lazy dog again and again"),
        (3, "two words"),  # n < k -> whole-text single-shingle fallback
        (4, "one"),
        (5, "!!!"),  # normalizes to empty -> the empty shingle still hashes
        (6, ""),
        (7, None),  # NULL text -> row KEPT by both forms (hashes like the empty doc)
        (8, "a1b2 c3d4 e5f6 g7h8 i9j0 " * 8),
    ]
    sigs = _parity(spark, rows)
    # normalization invariance: 1 and 2 normalize identically
    assert sigs[1] == sigs[2]
    # empty-normalized docs still get a signature
    assert 5 in sigs and 6 in sigs and sigs[5] == sigs[6]
    # NULL text KEPT by both forms, hashing like the empty doc
    assert 7 in sigs and sigs[7] == sigs[6]
    # short docs have content-dependent signatures (not a shared constant)
    assert sigs[3] != sigs[4]


def test_kernel_matches_on_non_ascii(spark):
    rows = [
        (1, "Héllo wörld ẞtraße — caffè ☕ №42 and some more words here"),
        (2, "ＡＢＣ ｄｅｆ 中文 text mixed 中 here ok right now"),
        (3, "KK kelvin sign maps to k in some lowercasings"),  # U+212A
        (4, "emoji 😀😀😀 run and text after it continues for a while"),
    ]
    _parity(spark, rows)


def test_kernel_matches_wide_perm_and_k(spark):
    rows = [(i, f"document number {i} carries words {i % 3} and {i % 5} ok")
            for i in range(12)]
    _parity(spark, rows, num_perm=16, shingle_k=2)


def test_kernel_is_one_arrow_crossing_no_exchange(spark):
    """The kernel form needs NO shuffle: the signature is per-document, so
    the whole chain is one MapInPandas over the scan — where the
    expression form exchanges (doc, num_perm partial mins) for the
    groupBy."""
    import re

    from realtime_fraud_detection_spark.plans.explain import formatted_plan

    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    plan = formatted_plan(minhash_signatures(df, "text", "doc_id", num_perm=4))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
