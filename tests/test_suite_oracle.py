"""Every declared query hash-matches its DuckDB oracle at sf0.001 — the same
comparison the driver's correctness gate runs (full-SF run:
`python tools/check_oracle.py /root/testdata/sf0.01`)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_oracle import compare, duck_con  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def smoke_duck():
    return duck_con(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, smoke_duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    sql = ORACLES.get(name)
    if sql is None:
        assert len(sdf) >= 0  # rows-only contract (approximate operators)
        return
    odf = smoke_duck.execute(sql).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "velocity_score" in df.columns


def test_every_query_has_oracle_or_is_declared_approximate():
    # bm25_search idf is transcendental — tolerance parity in test_corpus.py
    approximate = {
        "ann_lsh",
        "ann_ivf",
        # int8 quantization is approximate by construction; recall +
        # reconstruction bounds in tests/test_int8_ann.py
        "ann_int8",
        # IVF,PQ stacks three approximations; recall >= SQ8 pinned in
        # tests/test_pq_ann.py
        "ann_pq",
        # serve-from-artifacts path of ann_pq (same approximations; the
        # build/serve split is the deliverable — BENCH records both)
        "ann_pq_serve",
        # IVF over SQ8 codes / residual IVF,PQ — composed indexes, recall
        # bounds in tests/test_int8_ann.py / tests/test_pq_ann.py
        "ann_ivf_int8",
        "ann_pq_res",
        "semantic_dedup",
        "doc_chunks",
        "bm25_search",
        # RRF fusion of BM25 + cosine lists — rank inputs derive from
        # transcendental scores (the bm25 class); bit-exact pure-Python
        # replay parity in tests/test_hybrid_search.py
        "hybrid_search",
        # iterative distributed training — no SQL form; NumPy-replay
        # parity + holdout accuracy in tests/test_text_classifier.py
        "text_classifier",
        # BPE train+apply — no SQL form; merge-sequence, roundtrip and
        # reference-encoder parity in tests/test_bpe.py
        "bpe_tokens",
        # unigram-LM EM train+apply — no SQL form; lattice hand-checks +
        # hypothesis roundtrip in tests/test_unigram_lm.py
        "unigram_tokens",
        # transcendental log10 + 6-way CASE over three count joins;
        # hand-computed + brute-force parity in tests/test_ngram_lm.py
        "ngram_lm",
        # persisted-LM broadcast scoring twin — roundtrip + pruned
        # brute-force parity in tests/test_ngram_io.py
        "ngram_lm_serve",
        # HLL ∪ DDSketch rollup panel: DataSketches HLL estimates have no
        # DuckDB twin and the DDSketch bucket boundary is transcendental
        # (ceil(ln x / ln γ)); accuracy + mergeability laws pinned in
        # tests/test_sketches.py / tests/test_quantile_sketch.py
        "sketch_panel",
        # isotonic calibration — MLlib PAV fit, no SQL twin; Brier/
        # monotonicity/persistence pinned in tests/test_calibration.py
        "score_calibration",
        # iterative power iteration — no SQL form; exact Python replay
        # in tests/test_pagerank.py
        "pagerank",
        # LPA communities — iterative, no SQL form; hand-traced parity +
        # determinism in tests/test_label_propagation.py
        "communities",
        # (k_core was promoted into the oracle window round 13 — the
        # k-core is a unique fixed point, so a DuckDB recursive-CTE
        # re-peel is exact; the case_decision∪filter_project merge freed
        # the slot)
        # multimodal decode/feature extraction — seeded deterministic
        # decode fakes (no codecs in container), no SQL twin; payload-
        # pruning + batch-shape laws in tests/test_multimodal.py
        "multimodal_features",
        # time-decayed running sums — transcendental 2^x weights;
        # brute-force replay parity in tests/test_time_decay.py
        "decayed_velocity",
        # stacking combine + nested explanation arrays — array<struct>
        # output has no flat DuckDB twin; hand-computed + Python-replay
        # parity in tests/test_explain.py
        "ensemble_explain",
        # hashed-n-gram embedding pipeline — arrays have no flat DuckDB
        # twin; hash-replay parity + recall pins in tests/test_text_embed.py
        "text_embed_ann",
        # named A/B experiment lifecycle — erfc p-value approximation has
        # no DuckDB twin; NumPy replay of the reference arithmetic in
        # tests/test_experiments.py
        "ab_experiments",
        # trained sequential scorer — iterative decimal-sum logistic fit,
        # no SQL form; holdout-AUC + bit-determinism + pure-expression
        # scoring pinned in tests/test_sequential.py
        "sequence_scores",
        # (jaccard_ingest / model_eval / volume_anomalies were promoted
        # into the oracle window round 12 — the rule_score and
        # pattern_buckets panel merges freed the slots; target_encoding
        # followed late round 12 via the velocity_sliding merge;
        # drift_report and retrieval_eval were promoted round 13 via the
        # event_features∪json_extract and rolling_profile∪velocity_lookup
        # merges — their formerly test-pinned twins are now the oracles)
    }
    missing = set(QUERIES) - set(ORACLES) - approximate
    assert not missing, f"queries without oracle: {missing}"


def test_oracled_queries_fill_driver_window():
    """The driver checks only the FIRST 50 queries() entries (insertion
    order). Every oracle-backed query must sit inside that window and
    every window slot must be oracle-backed — rows-only queries go after."""
    names = list(QUERIES)
    window, tail = names[:50], names[50:]
    assert all(n in ORACLES for n in window), [n for n in window if n not in ORACLES]
    assert not any(n in ORACLES for n in tail), [n for n in tail if n in ORACLES]
