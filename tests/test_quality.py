"""Gopher/C4 repetition-quality stats (operators/quality): hand-computed
fractions on crafted docs, threshold behavior, and degenerate inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import quality as Q


def _stats(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r.asDict() for r in Q.repetition_stats(df, **kw).collect()}


def test_duplicate_line_fractions(spark):
    # 3 non-empty lines, "a b c" twice: dup_line_frac = 1/3,
    # line chars 5+5+5=15, duplicated 10 -> 2/3
    s = _stats(spark, [(1, "a b c\na b c\nx y z")])[1]
    assert s["n_lines"] == 3
    assert s["dup_line_frac"] == pytest.approx(round(1 / 3, 6))
    assert s["dup_line_char_frac"] == pytest.approx(round(10 / 15, 6))


def test_no_repetition_is_clean(spark):
    s = _stats(spark, [(1, "every line here\nis fully unique\nno repeats at all")])[1]
    assert s["dup_line_frac"] == 0.0
    assert s["dup_line_char_frac"] == 0.0
    assert s["dup5gram_char_frac"] == 0.0


def test_top_ngram_char_fraction(spark):
    # normalized: "ab cd ab cd ab cd" (17 chars); 2-grams: "ab cd" x3,
    # "cd ab" x2 -> top mass = 3*5 = 15 -> 15/17
    s = _stats(spark, [(1, "ab cd ab cd ab cd")])[1]
    assert s["top2gram_char_frac"] == pytest.approx(round(15 / 17, 6))


def test_dup_ngram_char_fraction_mass_ratio(spark):
    # "one two three four five one two three four five six" has the 5-gram
    # "one two three four five" twice among 7 5-grams; mass ratio checked
    # against a direct Python computation of the same definition
    text = "one two three four five one two three four five six"
    words = text.split()
    grams = [" ".join(words[i : i + 5]) for i in range(len(words) - 4)]
    from collections import Counter

    c = Counter(grams)
    dup = sum(cnt * len(g) for g, cnt in c.items() if cnt > 1)
    total = sum(cnt * len(g) for g, cnt in c.items())
    s = _stats(spark, [(1, text)])[1]
    assert s["dup5gram_char_frac"] == pytest.approx(round(dup / total, 6))


def test_gopher_pass_filters_repetitious_doc(spark):
    rows = [
        # fully diverse words — a template like "line %d of text" would
        # legitimately fail the top-2-gram threshold (its repeated bigrams
        # dominate), which is exactly what the filter is for
        (1, "\n".join(f"alpha{i} beta{i} gamma{i} delta{i} eps{i}" for i in range(10))),
        (2, "spam spam spam spam\n" * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    stats = Q.repetition_stats(df)
    passed = {
        r["doc_id"]: r["ok"]
        for r in stats.withColumn("ok", Q.gopher_repetition_pass(stats)).collect()
    }
    assert passed == {1: True, 2: False}


def test_empty_and_whitespace_docs(spark):
    s = _stats(spark, [(1, ""), (2, "   \n  \n ")])
    for d in (1, 2):
        assert s[d]["n_lines"] == 0
        assert s[d]["dup_line_frac"] == 0.0
