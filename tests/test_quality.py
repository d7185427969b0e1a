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


# ---------------------------------------------------------------------------
# C4 line/page heuristics (operators/quality.c4_line_stats / c4_page_pass)
# ---------------------------------------------------------------------------
def _c4(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    stats = Q.c4_line_stats(df, "text", "doc_id")
    return {
        r["doc"]: r.asDict()
        for r in stats.withColumn("ok", Q.c4_page_pass(stats)).collect()
    }


def test_c4_keeps_terminal_punct_five_word_lines(spark):
    text = (
        "This is a proper sentence right here.\n"  # kept
        "no terminal punctuation on this line\n"   # not kept (no punct)
        "Too short.\n"                             # not kept (<5 words)
        "This one mentions javascript libraries today.\n"  # not kept (js)
        "Another fully valid sentence ends here!\n"  # kept
        "And a third keeps the page alive?"          # kept
    )
    s = _c4(spark, [(1, text)])[1]
    assert s["n_rich_lines"] == 6
    assert s["n_kept_lines"] == 3
    assert s["terminal_line_frac"] == pytest.approx(round(5 / 6, 6))
    assert s["short_line_frac"] == pytest.approx(round(1 / 6, 6))
    assert s["ok"] is True


def test_c4_page_fails_on_lorem_brace_or_few_lines(spark):
    good = "One good sentence sits here.\nA second good sentence follows now.\nAnd a third one completes it."
    s = _c4(
        spark,
        [
            (1, good),
            (2, good + "\nsome lorem ipsum filler"),
            (3, good + "\nfunction() { return; }"),
            (4, "Only two good sentences exist here.\nSo the page must fail now."),
        ],
    )
    assert s[1]["ok"] is True
    assert s[2]["ok"] is False  # lorem ipsum
    assert s[3]["ok"] is False  # curly brace
    assert s[4]["ok"] is False  # < 3 kept lines


# ---------------------------------------------------------------------------
# PII bank (functions/pii): counts + redaction placeholders
# ---------------------------------------------------------------------------
def test_pii_counts_and_redaction(spark):
    from realtime_fraud_detection_spark.functions import pii as P

    text = (
        "Mail alice@example.com or bob.smith@corp.co, call 555-123-4567, "
        "server 10.1.2.3, card 4111-1111-1111-1111, SSN 987-65-4321."
    )
    df = spark.createDataFrame([(1, text)], "id int, t string")
    counts = P.pii_counts(F.col("t"))
    row = df.select(
        *[counts[k].alias(k) for k in P.PII_PATTERNS],
        P.redact_pii(F.col("t")).alias("red"),
    ).collect()[0]
    assert row["email"] == 2
    assert row["phone"] == 1
    assert row["ipv4"] == 1
    assert row["credit_card"] == 1
    assert row["ssn"] == 1
    red = row["red"]
    for tok in ("[EMAIL]", "[PHONE]", "[IPV4]", "[CREDIT_CARD]", "[SSN]"):
        assert tok in red
    assert "alice@example.com" not in red
    assert "4111" not in red
    assert "987-65-4321" not in red


def test_pii_clean_text_untouched(spark):
    from realtime_fraud_detection_spark.functions import pii as P

    text = "No identifiers here, just prose with numbers like 42 and 3.14."
    df = spark.createDataFrame([(1, text)], "id int, t string")
    row = df.select(P.redact_pii(F.col("t")).alias("red")).collect()[0]
    assert row["red"] == text


def test_boilerplate_line_stats_cross_doc(spark):
    rows = [
        (1, "Shared footer line\nUnique content one"),
        (2, "Shared footer line\nDifferent content two"),
        (3, "Totally unique document"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc"]: (r["n_boiler_lines"], r["boiler_line_frac"])
        for r in Q.boilerplate_line_stats(df, "text", "doc_id").collect()
    }
    assert got[1] == (1, 0.5)
    assert got[2] == (1, 0.5)
    assert got[3] == (0, 0.0)


def test_contamination_stats_broadcast_ngram_overlap(spark):
    # doc 1 contains the benchmark's 8-gram verbatim; doc 2 shares only
    # shorter overlaps; doc 3 is clean
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id int, text string",
    )
    rows = [
        (1, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
        (2, "alpha beta gamma delta unrelated tail of words here"),
        (3, "completely different content with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in Q.contamination_stats(df, bench, n=8).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_contamination_short_doc_exact_match(spark):
    # docs shorter than n fall back to the whole text as one shingle:
    # a short doc equal to a short benchmark row is flagged
    bench = spark.createDataFrame([(1, "tiny eval prompt")], "doc_id int, text string")
    df = spark.createDataFrame(
        [(10, "tiny eval prompt"), (11, "another tiny prompt")],
        "doc_id int, text string",
    )
    got = {
        r["doc"]: r["contaminated"]
        for r in Q.contamination_stats(df, bench, n=8).collect()
    }
    assert got == {10: True, 11: False}


# ---------------------------------------------------------------------------
# CCNet-style corpus-relative token-frequency signals
# ---------------------------------------------------------------------------

def _tf_corpus(spark):
    # corpus tf: the=4, cat=2, sat=2, here=1, rare=1, words=1
    return spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat sat the"),
            (3, "the here rare words"),
        ],
        "doc_id int, text string",
    )


def test_token_frequency_stats_hand_computed(spark):
    out = {
        r["doc"]: r.asDict()
        for r in Q.token_frequency_stats(_tf_corpus(spark)).collect()
    }
    d1, d2, d3 = out[1], out[2], out[3]
    assert (d1["n_tokens"], d1["n_distinct_tokens"]) == (3, 3)
    assert (d2["n_tokens"], d2["n_distinct_tokens"]) == (4, 3)
    # doc1 occurrence tfs: the=4, cat=2, sat=2 -> mean 8/3
    assert d1["mean_token_tf"] == pytest.approx(2.666667)
    # doc2: the,the(4) cat(2) sat(2) -> (4+4+2+2)/4 = 3
    assert d2["mean_token_tf"] == pytest.approx(3.0)
    # doc3: the(4) here(1) rare(1) words(1) -> 7/4; hapax 3/4
    assert d3["mean_token_tf"] == pytest.approx(1.75)
    assert d3["hapax_frac"] == pytest.approx(0.75)
    assert d1["hapax_frac"] == 0.0
    # rare (tf<=2): doc1 cat+sat = 2/3
    assert d1["rare_frac"] == pytest.approx(0.666667)
    assert d3["rare_frac"] == pytest.approx(0.75)


def test_unigram_logprob_ranks_gibberish_below_common_text(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((99, "zxqv wjkp qqrst mmnbv xxyzw"))  # corpus-unique junk
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc"]: r["mean_unigram_logprob"] for r in Q.unigram_logprob(df).collect()}
    assert got[99] < got[0]  # rare-token doc scores strictly lower
    # N = 95 tokens; junk doc: every token tf=1 -> logprob = -log10(95)
    import math

    assert got[99] == pytest.approx(-math.log10(95.0), abs=1e-12)


def test_unigram_logprob_matches_duckdb_within_tolerance(spark):
    """Transcendental — outside the bit-exact oracle surface, so verified
    against an independent DuckDB formulation with tolerance instead."""
    import duckdb

    from realtime_fraud_detection_spark.sources.testdata import load_table

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    got = {r["doc"]: r["mean_unigram_logprob"] for r in Q.unigram_logprob(docs).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = dict(
        con.execute(
            r"""
WITH ws AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS w
  FROM documents
),
tok AS (SELECT doc_id, unnest(w) AS t FROM ws),
dt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
tf AS (SELECT t, CAST(SUM(c) AS BIGINT) AS tf FROM dt GROUP BY 1),
n AS (SELECT CAST(SUM(tf) AS BIGINT) AS n FROM tf)
SELECT doc_id,
       SUM(c * log10(tf)) / SUM(c) - log10((SELECT n FROM n))
FROM dt JOIN tf USING (t) GROUP BY 1
"""
        ).fetchall()
    )
    assert set(got) == set(want)
    for doc in got:
        assert got[doc] == pytest.approx(want[doc], abs=1e-9), doc
