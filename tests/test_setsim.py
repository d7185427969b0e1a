"""Prefix-filtered exact Jaccard self-join (operators/setsim.py).

The contract under test is EXACTNESS: unlike MinHash-LSH, the prefix
filter must lose no qualifying pair — so the core check is set equality
against an all-pairs brute force, not recall bounds.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.setsim import (
    jaccard_similarity_join,
    prefix_filtered_candidates,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, n=250):
    from realtime_fraud_detection_spark.sources.testdata import load_table

    return load_table(spark, SF, "documents", fan_out=True).filter(
        F.col("doc_id") < n
    )


def _shingle_sets(spark, df, k=3):
    """Driver-side replay of shingle_table(distinct=True) for brute force."""
    from realtime_fraud_detection_spark.operators.dedup import shingle_table

    rows = shingle_table(df, "text", "doc_id", k, distinct=True).collect()
    return {r["doc"]: set(r["sh"]) for r in rows}


def _brute_pairs(sets, t):
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = len(sets[a] | sets[b])
            if u == 0:
                continue
            j = len(sets[a] & sets[b]) / u
            if j >= t:
                out[(a, b)] = j
    return out


@pytest.mark.parametrize("t", [0.5, 0.8])
def test_exact_join_matches_brute_force(spark, t):
    docs = _docs(spark).cache()
    want = _brute_pairs(_shingle_sets(spark, docs), t)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_similarity_join(
            docs, "text", "doc_id", threshold=t
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_candidates_are_superset_and_filtered(spark):
    docs = _docs(spark).cache()
    sets = _shingle_sets(spark, docs)
    t = 0.5
    want = set(_brute_pairs(sets, t))
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filtered_candidates(
            docs, "text", "doc_id", threshold=t
        ).collect()
    }
    assert want <= cand  # completeness: the filter may over-generate only
    n = len(sets)
    all_pairs = n * (n - 1) // 2
    # the point of prefix filtering: candidates are a small fraction of
    # the quadratic space (documents fixture is mostly non-duplicates)
    assert len(cand) < all_pairs / 4


def test_prefix_shorter_at_higher_threshold(spark):
    docs = _docs(spark, n=120).cache()
    lo = prefix_filtered_candidates(docs, threshold=0.5).count()
    hi = prefix_filtered_candidates(docs, threshold=0.9).count()
    assert hi <= lo


def test_hand_computed_tiny(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words appear in this one text"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_similarity_join(
            df, "text", "doc_id", threshold=0.5, shingle_k=3
        ).collect()
    }
    # docs 1/2: 7 shingles each, 6 shared -> J = 6/8 = 0.75
    assert out == {(1, 2): 0.75}


def test_no_cartesian_in_plan(spark):
    docs = _docs(spark, n=50)
    plan = jaccard_similarity_join(docs, threshold=0.7)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan


def test_threshold_validation(spark):
    with pytest.raises(ValueError):
        prefix_filtered_candidates(_docs(spark, 10), threshold=0.0)


def _verified(spark, docs, pairs, t, a="doc_a", b="doc_b"):
    from realtime_fraud_detection_spark.operators.dedup import ngram_jaccard

    p = pairs.select(F.col(a).alias("doc_a"), F.col(b).alias("doc_b"))
    return {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard(docs, p, "text", "doc_id", 3)
        .filter(F.col("jaccard") >= t - 1e-9)
        .collect()
    }


def test_incremental_matches_self_join_cross_pairs(spark):
    from realtime_fraud_detection_spark.operators.setsim import (
        prefix_filtered_candidates_incremental,
    )

    t = 0.5
    docs = _docs(spark).cache()
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    new_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    inc = prefix_filtered_candidates_incremental(
        batch, corpus, threshold=t
    )
    got = _verified(spark, docs, inc, t, a="new_doc", b="corpus_doc")
    got = {(min(p), max(p)) for p in got}

    full = jaccard_similarity_join(docs, threshold=t)
    want = {
        (r["doc_a"], r["doc_b"])
        for r in full.collect()
        if (r["doc_a"] in new_ids) != (r["doc_b"] in new_ids)
    }
    assert got == want and len(want) > 0


def test_incremental_probe_broadcasts_batch_side(spark):
    from realtime_fraud_detection_spark.operators.setsim import (
        prefix_filtered_candidates_incremental,
    )

    docs = _docs(spark, n=120)
    plan = (
        prefix_filtered_candidates_incremental(
            docs.filter(F.col("doc_id") % 3 == 0),
            docs.filter(F.col("doc_id") % 3 != 0),
            threshold=0.6,
        )
        ._jdf.queryExecution()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_incremental_unseen_vocabulary_is_safe(spark):
    from realtime_fraud_detection_spark.operators.setsim import (
        prefix_filtered_candidates_incremental,
    )

    corpus = _docs(spark, n=80)
    batch = spark.createDataFrame(
        [(900001, "wholly novel vocabulary nothing shared anywhere here ok")],
        "doc_id long, text string",
    )
    out = prefix_filtered_candidates_incremental(
        batch, corpus, threshold=0.5
    )
    assert out.count() == 0


def test_incremental_from_persisted_index(spark, tmp_path):
    from realtime_fraud_detection_spark.operators.setsim import (
        prefix_filtered_candidates_incremental,
        prefix_index,
        token_df_table,
    )

    t = 0.5
    docs = _docs(spark).cache()
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    token_df_table(corpus).write.parquet(str(tmp_path / "dfreq"))
    dfreq = spark.read.parquet(str(tmp_path / "dfreq"))
    prefix_index(corpus, threshold=t, dfreq=dfreq).write.parquet(
        str(tmp_path / "idx")
    )
    via_store = prefix_filtered_candidates_incremental(
        batch,
        threshold=t,
        corpus_index=spark.read.parquet(str(tmp_path / "idx")),
        corpus_dfreq=dfreq,
    )
    direct = prefix_filtered_candidates_incremental(batch, corpus, threshold=t)
    assert {tuple(r) for r in via_store.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_posting_cap_bounds_skew(spark):
    docs = _docs(spark).cache()
    capped = prefix_filtered_candidates(
        docs, threshold=0.5, max_posting_size=5
    ).count()
    uncapped = prefix_filtered_candidates(docs, threshold=0.5).count()
    assert capped <= uncapped


def test_jaccard_ingest_suite_query_matches_duckdb_bit_exact(spark):
    """The incremental-ingest suite query (rows-only in the driver window)
    against its DuckDB twin — bit-exact, the merchant_updates promotion
    pattern: the probe's completeness guarantee makes its output exactly
    'all (batch, corpus) pairs with jaccard >= t', which the oracle
    states as the split restriction of the all-pairs shingle join."""
    import duckdb

    from realtime_fraud_detection_spark.suite.dedup_q import (
        SQL_JACCARD_INGEST,
        q_jaccard_ingest,
    )
    from tests.conftest import SF_SMOKE
    from tools.check_oracle import compare

    sdf = q_jaccard_ingest(spark, SF_SMOKE).toPandas()
    assert len(sdf) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    odf = con.execute(SQL_JACCARD_INGEST).fetchdf()
    problems = compare("jaccard_ingest", sdf, odf)
    assert not problems, problems
