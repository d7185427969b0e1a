"""Corpus vocabulary statistics (operators/corpus) — hand-computed counts."""

from __future__ import annotations

from realtime_fraud_detection_spark.operators import corpus as CO

ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "a cat and a dog"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def test_term_table_tf_and_df(spark):
    got = {
        r["term"]: (r["tf"], r["df"])
        for r in CO.term_table(_df(spark), "text", "doc_id").collect()
    }
    assert got["the"] == (3, 2)   # twice in doc 1, once in doc 2
    assert got["cat"] == (2, 2)
    assert got["sat"] == (2, 2)
    assert got["a"] == (2, 1)     # twice, only in doc 3
    assert got["mat"] == (1, 1)


def test_top_k_terms_rank_and_tiebreak(spark):
    top = CO.top_k_terms(_df(spark), "text", "doc_id", 4).collect()
    ranked = [(r["rank"], r["term"], r["tf"]) for r in sorted(top, key=lambda r: r["rank"])]
    # tf=3: the; tf=2 ties broken alphabetically: a < cat < dog < sat
    assert ranked[0] == (1, "the", 3)
    assert ranked[1] == (2, "a", 2)
    assert ranked[2] == (3, "cat", 2)
    assert ranked[3] == (4, "dog", 2)


def test_vocab_summary(spark):
    row = CO.vocab_summary(_df(spark), "text", "doc_id").collect()[0]
    # terms: the(3) cat(2) sat(2) on(1) mat(1) dog(2) a(2) and(1) -> 8 terms, 14 tokens
    assert row["vocab_size"] == 8
    assert row["total_tokens"] == 14
    assert row["hapax_terms"] == 3  # on, mat, and
    assert row["type_token_ratio"] == round(8 / 14, 6)
