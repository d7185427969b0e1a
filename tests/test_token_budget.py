"""Token-budget mixture sampling (operators/sampling.token_budget_sample):
bit-exact DuckDB parity of the selection, the minimal-prefix law, budget
nesting, and exactness of the bucket-offset prefix-sum decomposition.
"""

from __future__ import annotations

import duckdb
import pytest

from realtime_fraud_detection_spark.operators.sampling import (
    token_budget_sample,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

BUDGETS = {"en": 20000, "fr": 10000, "de": 8000, "es": 10000, "zh": 6000}
DOCS = f"{SF_SMOKE}/documents.parquet"


def _spark_selection(spark, budgets=BUDGETS, **kw):
    docs = load_table(spark, SF_SMOKE, "documents")
    picked = token_budget_sample(
        docs, budgets, group_col="lang", token_col="n_chars",
        id_col="doc_id", **kw,
    )
    return {
        (r.doc_id, r.lang, r.n_chars)
        for r in picked.select("doc_id", "lang", "n_chars").collect()
    }


def _duck_selection(budgets=BUDGETS):
    """Single per-group window — the straightforward sequential rendering
    the distributed bucket-offset form must equal exactly."""
    branches = "".join(
        f"WHEN lang = '{k}' THEN {v} " for k, v in sorted(budgets.items())
    )
    sql = f"""
    WITH base AS (
      SELECT doc_id, lang, n_chars,
             ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM read_parquet('{DOCS}')
    ),
    cum AS (
      SELECT *, COALESCE(SUM(n_chars) OVER (
        PARTITION BY lang ORDER BY h, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM base
    )
    SELECT doc_id, lang, n_chars FROM cum
    WHERE prev < CASE {branches}ELSE 0 END
    """
    return {(r[0], r[1], r[2]) for r in duckdb.sql(sql).fetchall()}


def test_duckdb_parity_bit_exact(spark):
    assert _spark_selection(spark) == _duck_selection()


def test_minimal_prefix_reaches_budget(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    picked = token_budget_sample(
        docs, BUDGETS, group_col="lang", token_col="n_chars", id_col="doc_id"
    )
    per_group = {
        r.lang: (r.total, r.picked_max)
        for r in picked.groupBy("lang")
        .agg({"n_chars": "sum"})
        .withColumnRenamed("sum(n_chars)", "total")
        .join(
            picked.groupBy("lang").agg({"n_chars": "max"})
            .withColumnRenamed("max(n_chars)", "picked_max"),
            "lang",
        )
        .collect()
    }
    corpus_totals = {
        r.lang: r.ct
        for r in docs.groupBy("lang").agg({"n_chars": "sum"})
        .withColumnRenamed("sum(n_chars)", "ct").collect()
    }
    for lang, budget in BUDGETS.items():
        total, _ = per_group[lang]
        if corpus_totals[lang] >= budget:
            # reached the budget, and no doc is superfluous: every kept doc
            # had prev < budget, so total - (any single doc) < budget + doc
            assert total >= budget, lang
        else:
            assert total == corpus_totals[lang], lang


def test_dropping_last_selected_goes_under_budget(spark):
    """Minimality: remove the LAST selected doc (in the hash order) of each
    budget-reaching group and the remaining token mass is under budget."""
    sel = _duck_selection()
    sql_h = (
        "('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    )
    rows = duckdb.sql(
        f"SELECT doc_id, lang, n_chars, {sql_h} AS h FROM read_parquet('{DOCS}')"
    ).fetchall()
    by_lang: dict[str, list] = {}
    for doc_id, lang, n_chars, h in rows:
        if (doc_id, lang, n_chars) in sel:
            by_lang.setdefault(lang, []).append((h, doc_id, n_chars))
    corpus_tot: dict[str, int] = {}
    for _, lang, n_chars, _h in rows:
        corpus_tot[lang] = corpus_tot.get(lang, 0) + n_chars
    for lang, picked in by_lang.items():
        budget = BUDGETS[lang]
        if corpus_tot[lang] < budget:
            continue
        picked.sort()
        total = sum(t for _, _, t in picked)
        assert total >= budget
        assert total - picked[-1][2] < budget, lang


def test_budget_nesting(spark):
    half = {k: v // 2 for k, v in BUDGETS.items()}
    assert _spark_selection(spark, budgets=half) <= _spark_selection(spark)


def test_bucket_decomposition_exact(spark):
    """n_buckets=1 (single window per group) and the default 256-way
    bucket-offset form select identical rows — the distributed prefix sum
    is exact, not approximate."""
    assert _spark_selection(spark, n_buckets=1) == _spark_selection(spark)
    assert _spark_selection(spark, n_buckets=16) == _spark_selection(spark)


def test_unlisted_group_dropped_by_default(spark):
    only_en = _spark_selection(spark, budgets={"en": 20000})
    assert only_en
    assert {lang for _, lang, _ in only_en} == {"en"}


def test_bad_n_buckets_raises(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        token_budget_sample(
            docs, BUDGETS, group_col="lang", token_col="n_chars",
            id_col="doc_id", n_buckets=12,
        )


def test_suite_query_nonempty_and_proper_subset(spark):
    from realtime_fraud_detection_spark.suite.dedup_q import q_token_budget_mix

    rows = q_token_budget_mix(spark, SF_SMOKE).collect()
    assert rows
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert 0 < len(rows) < n_docs
