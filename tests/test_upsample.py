"""Fractional upsampling (operators/sampling.upsample_by_factor):
bit-exact DuckDB parity, integer/fractional repeat laws, monotonicity in
the factor, and the hash-law equivalence with hash_sample for f < 1."""

from __future__ import annotations

import duckdb
import pytest

from realtime_fraud_detection_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    hash_sample,
    upsample_by_factor,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

DOCS = f"{SF_SMOKE}/documents.parquet"
FACTORS = {"en": 1.0, "de": 2.4, "fr": 1.5, "es": 0.4, "zh": 3.0}


def _spark_rows(spark, factors=FACTORS, **kw):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = upsample_by_factor(
        docs, factors, group_col="lang", id_col="doc_id", **kw
    )
    return {(r.doc_id, r.lang, r.epoch) for r in
            out.select("doc_id", "lang", "epoch").collect()}


def test_duckdb_parity_bit_exact(spark):
    branches_whole = "".join(
        f"WHEN lang = '{k}' THEN {int(v)} " for k, v in sorted(FACTORS.items())
    )
    branches_frac = "".join(
        f"WHEN lang = '{k}' THEN {int(round((v - int(v)) * SAMPLE_BUCKETS))} "
        for k, v in sorted(FACTORS.items())
    )
    sql = f"""
    WITH base AS (
      SELECT doc_id, lang,
        (CASE {branches_whole}ELSE 1 END) +
        (CASE WHEN
           (('0x' || substr(md5('upsample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % {SAMPLE_BUCKETS}) < (CASE {branches_frac}ELSE 0 END)
         THEN 1 ELSE 0 END) AS copies
      FROM read_parquet('{DOCS}')
    )
    SELECT doc_id, lang, unnest(range(copies)) AS epoch
    FROM base WHERE copies > 0
    """
    duck = {(r[0], r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert _spark_rows(spark) == duck


def test_integer_factor_exact_copies(spark):
    rows = _spark_rows(spark, factors={"en": 2.0}, default=0.0)
    docs = load_table(spark, SF_SMOKE, "documents")
    n_en = docs.filter("lang = 'en'").count()
    assert len(rows) == 2 * n_en
    assert {e for _, _, e in rows} == {0, 1}
    ids = {d for d, _, _ in rows}
    assert all((d, "en", 0) in rows and (d, "en", 1) in rows for d in ids)


def test_fractional_factor_bounds_and_monotone(spark):
    low = _spark_rows(spark, factors={"de": 1.3}, default=0.0)
    high = _spark_rows(spark, factors={"de": 1.8}, default=0.0)
    docs = load_table(spark, SF_SMOKE, "documents")
    n_de = docs.filter("lang = 'de'").count()
    assert n_de <= len(low) <= 2 * n_de
    assert low <= high  # raising the factor only ever adds copies
    assert len(low) < len(high)


def test_sub_one_factor_matches_hash_sample(spark):
    """f < 1 with hash_sample's seed IS hash_sample — one selection law
    across the down- and up-sampling operators."""
    docs = load_table(spark, SF_SMOKE, "documents")
    up = upsample_by_factor(
        docs, {}, group_col="lang", id_col="doc_id",
        default=0.35, seed="sample:",
    )
    want = {r.doc_id for r in hash_sample(docs, "doc_id", 0.35).collect()}
    got = {r.doc_id for r in up.collect()}
    assert got == want
    assert up.filter("epoch != 0").count() == 0


def test_default_keeps_unlisted_groups_once(spark):
    rows = _spark_rows(spark, factors={"de": 2.0})
    docs = load_table(spark, SF_SMOKE, "documents")
    n_en = docs.filter("lang = 'en'").count()
    en_rows = [(d, l, e) for d, l, e in rows if l == "en"]
    assert len(en_rows) == n_en
    assert all(e == 0 for _, _, e in en_rows)


def test_negative_factor_raises(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        upsample_by_factor(
            docs, {"en": -0.5}, group_col="lang", id_col="doc_id"
        )
