"""Exact duplicate-span detection (operators/spans — Lee et al. ACL'22
substring dedup): hand-computed span boundaries, within-doc repeats,
strip behavior, and bit-exact DuckDB parity on the documents fixture."""

from __future__ import annotations

import pytest

from realtime_fraud_detection_spark.functions.hashing import md5_bigint_sql
from realtime_fraud_detection_spark.operators import spans as S

from tests.conftest import SF_SMOKE

COMMON = "one two three four five six"


@pytest.fixture(scope="module")
def pair_docs(spark):
    return spark.createDataFrame(
        [
            (1, f"aaa bbb {COMMON} ccc ddd"),
            (2, f"xxx {COMMON} yyy zzz www"),
        ],
        "doc_id int, text string",
    )


def _spans(df, k=4, min_count=2):
    rows = S.duplicate_spans(df, "text", "doc_id", k=k, min_count=min_count).collect()
    return sorted(
        (r["doc"], r["span_start"], r["span_end"], r["span_tokens"], r["n_dup_grams"])
        for r in rows
    )


def test_cross_doc_shared_run_exact_boundaries(spark, pair_docs):
    # the 6 shared tokens sit at positions 2-7 (doc 1) and 1-6 (doc 2);
    # only the three 4-grams fully inside the shared run repeat — grams
    # crossing the boundary occur once and must not widen the span
    assert _spans(pair_docs) == [(1, 2, 7, 6, 3), (2, 1, 6, 6, 3)]


def test_min_count_above_occurrences_finds_nothing(spark, pair_docs):
    assert _spans(pair_docs, min_count=3) == []


def test_within_doc_repeat_counts(spark):
    df = spark.createDataFrame(
        [(7, "p q r s t p q r s t")], "doc_id int, text string"
    )
    # grams 'p q r s' (pos 0, 5) and 'q r s t' (pos 1, 6) each occur twice;
    # positions 1->5 gap >= k so the two repeats are separate spans
    assert _spans(df) == [(7, 0, 4, 5, 2), (7, 5, 9, 5, 2)]


def test_unique_corpus_and_short_docs_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "q w e r t y u i"), (3, "x y")],
        "doc_id int, text string",
    )
    assert _spans(df) == []
    # a short doc duplicated verbatim is exact_dedup's job, not a span
    dup_short = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z")], "doc_id int, text string"
    )
    assert _spans(dup_short) == []


def test_strip_removes_exact_token_ranges(spark, pair_docs):
    sp = S.duplicate_spans(pair_docs, "text", "doc_id", k=4)
    out = {
        r["doc_id"]: r["stripped_text"]
        for r in S.strip_duplicate_spans(pair_docs, sp, "text", "doc_id").collect()
    }
    assert out[1] == "aaa bbb ccc ddd"
    assert out[2] == "xxx yyy zzz www"


def test_strip_keeps_docs_without_spans(spark):
    df = spark.createDataFrame(
        [(1, f"aaa {COMMON}"), (2, f"bbb {COMMON}"), (3, "Nothing DUPLICATED here!")],
        "doc_id int, text string",
    )
    sp = S.duplicate_spans(df, "text", "doc_id", k=4)
    out = {
        r["doc_id"]: r["stripped_text"]
        for r in S.strip_duplicate_spans(df, sp, "text", "doc_id").collect()
    }
    # doc 3 has no spans -> normalized text unchanged (left join null path)
    assert out[3] == "nothing duplicated here"
    assert out[1] == "aaa" and out[2] == "bbb"


K = 8
_H = md5_bigint_sql("s")
_LEADS = ", ".join(f"lead(tok, {i}) OVER win AS l{i}" for i in range(1, K))
_CAT = "concat_ws(' ', tok, " + ", ".join(f"l{i}" for i in range(1, K)) + ")"
PARITY_SQL = rf"""
WITH ws AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS w
  FROM documents
),
toks AS (SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS pos FROM ws),
gr AS (
  SELECT doc_id, pos, {_CAT} AS s
  FROM (SELECT doc_id, pos, tok, {_LEADS}
        FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
  WHERE l{K - 1} IS NOT NULL
),
g AS (SELECT doc_id, pos, {_H} AS h FROM gr),
dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
m AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER win2 >= {K} THEN 1 ELSE 0 END AS b
  FROM m WINDOW win2 AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS sp
  FROM brk
)
SELECT doc_id AS doc, min(pos) AS span_start, max(pos) + {K - 1} AS span_end,
       max(pos) + {K - 1} - min(pos) + 1 AS span_tokens,
       count(*) AS n_dup_grams
FROM isl GROUP BY doc_id, sp
ORDER BY doc, span_start
"""


def test_duplicate_spans_match_duckdb_on_fixture(spark):
    """Bit-exact parity with an independent DuckDB formulation at sf0.001
    (the operator is exact, but it lives outside the driver's 50-entry
    oracle window — this test carries the exactness instead)."""
    import duckdb

    from realtime_fraud_detection_spark.sources.testdata import load_table

    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    got = sorted(
        (r["doc"], r["span_start"], r["span_end"], r["span_tokens"], r["n_dup_grams"])
        for r in S.duplicate_spans(docs, "text", "doc_id", k=K).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = [
        (int(a), int(b), int(c), int(d), int(e))
        for a, b, c, d, e in con.execute(PARITY_SQL).fetchall()
    ]
    assert len(got) > 0  # the fixture contains near/exact dups by construction
    assert got == want
