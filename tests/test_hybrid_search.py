"""Reciprocal-rank fusion (operators/corpus.rrf_fuse) — exact-replay parity
and the hybrid_search suite query.

The fused score is an exact decimal sum of per-row DECIMAL(20,16)-quantized
contributions w/(k+rank), so a pure-Python replay (same shortest-repr double
→ half-up quantization Spark's double→decimal cast performs) must reproduce
scores and the fused ordering bit-for-bit.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.corpus import rrf_fuse
from tests.conftest import SF_SMOKE

Q16 = Decimal("1e-16")


def _contrib(w: float, k: int, rank: int) -> Decimal:
    # Spark's double→decimal cast goes through the shortest decimal repr
    # (BigDecimal.valueOf == Double.toString == Python repr) then rounds
    # HALF_UP to the target scale.
    return Decimal(repr(w / (k + rank))).quantize(Q16, rounding=ROUND_HALF_UP)


def _replay(lists: dict[str, list[tuple[int, int, int]]], k: int,
            weights: dict[str, float] | None = None):
    """Pure-Python RRF: {source: [(q, doc, rank), ...]} → ordered fused rows."""
    weights = weights or {}
    acc: dict[tuple[int, int], dict] = {}
    for src, rows in lists.items():
        w = float(weights.get(src, 1.0))
        for q, doc, rank in rows:
            e = acc.setdefault((q, doc), {"score": Decimal(0), "ranks": {}})
            e["score"] += _contrib(w, k, rank)
            e["ranks"][src] = rank
    out = []
    for q in sorted({q for q, _ in acc}):
        cands = [(d, e) for (qq, d), e in acc.items() if qq == q]
        cands.sort(key=lambda de: (-de[1]["score"], de[0]))
        for i, (d, e) in enumerate(cands, start=1):
            out.append((q, d, float(round(e["score"], 6)), i, e["ranks"]))
    return out


def _lists_df(spark, rows):
    return spark.createDataFrame(rows, ["q_id", "doc", "rank"])


def test_rrf_exact_replay(spark):
    lex = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 10, 2)]
    vec = [(1, 11, 1), (1, 13, 2), (1, 10, 3), (2, 21, 1), (2, 20, 2)]
    fused = rrf_fuse(
        {"lex": _lists_df(spark, lex), "vec": _lists_df(spark, vec)}, k=60
    )
    got = {
        (r.q_id, r.doc): (r.rrf_score, r.rank, r.lex_rank, r.vec_rank)
        for r in fused.collect()
    }
    expect = _replay({"lex": lex, "vec": vec}, k=60)
    assert len(got) == len(expect)
    for q, d, score, rank, ranks in expect:
        assert got[(q, d)] == (
            score, rank, ranks.get("lex"), ranks.get("vec")
        ), (q, d)


def test_rrf_doc_in_both_lists_outranks_single_list(spark):
    # doc 11 is mid-rank in both lists; doc 10/12 lead one list each —
    # with k=60 the two mid contributions beat any single top contribution.
    lex = [(1, 10, 1), (1, 11, 2)]
    vec = [(1, 12, 1), (1, 11, 2)]
    fused = rrf_fuse(
        {"lex": _lists_df(spark, lex), "vec": _lists_df(spark, vec)}, k=60
    ).collect()
    by_rank = {r.rank: r.doc for r in fused}
    assert by_rank[1] == 11
    # docs present in one list only carry a NULL rank for the other source
    one_sided = {r.doc: (r.lex_rank, r.vec_rank) for r in fused}
    assert one_sided[10] == (1, None)
    assert one_sided[12] == (None, 1)


def test_rrf_weights_shift_order(spark):
    lex = [(1, 10, 1), (1, 11, 2)]
    vec = [(1, 11, 1), (1, 10, 2)]
    # symmetric lists: unweighted RRF ties 10 and 11 (broken by doc id) —
    # up-weighting vec must put its leader first
    unweighted = rrf_fuse(
        {"lex": _lists_df(spark, lex), "vec": _lists_df(spark, vec)}, k=60
    ).collect()
    assert {r.rank: r.doc for r in unweighted}[1] == 10  # tie → doc asc
    weighted = rrf_fuse(
        {"lex": _lists_df(spark, lex), "vec": _lists_df(spark, vec)},
        k=60,
        weights={"vec": 3.0},
    ).collect()
    assert {r.rank: r.doc for r in weighted}[1] == 11


def test_rrf_top_k_truncates_per_query(spark):
    lex = [(1, d, r) for r, d in enumerate(range(10, 16), start=1)]
    vec = [(1, d, r) for r, d in enumerate(range(13, 19), start=1)]
    fused = rrf_fuse(
        {"lex": _lists_df(spark, lex), "vec": _lists_df(spark, vec)},
        k=60,
        top_k=4,
    ).collect()
    assert sorted(r.rank for r in fused) == [1, 2, 3, 4]


def test_bad_inputs_raise(spark):
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse({}, k=60)
    with pytest.raises(ValueError):
        rrf_fuse({"lex": _lists_df(spark, [(1, 10, 1)])}, k=0)


def test_hybrid_search_suite_query(spark):
    from realtime_fraud_detection_spark.suite.dedup_q import q_hybrid_search

    rows = q_hybrid_search(spark, SF_SMOKE).collect()
    assert rows
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
    # the query set is every 97th doc of the 500-doc fixture
    assert set(per_q) == {0, 97, 194, 291, 388, 485}
    for q, rs in per_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # every candidate came from at least one retriever
        assert all(
            r.lex_rank is not None or r.vec_rank is not None for r in rs
        )
    # genuinely hybrid: each query's fused list draws on BOTH retrievers
    for q, rs in per_q.items():
        assert any(r.lex_rank is not None for r in rs), q
        assert any(r.vec_rank is not None for r in rs), q


def test_hybrid_search_replays_from_its_source_lists(spark):
    """End-to-end: re-derive the two ranked lists exactly as the suite
    query builds them, fuse in pure Python, and require the suite query's
    fused output bit-for-bit (scores at 6 dp, ranks, source ranks)."""
    from realtime_fraud_detection_spark.operators import similarity as SIM
    from realtime_fraud_detection_spark.operators.corpus import bm25_rank
    from realtime_fraud_detection_spark.sources.testdata import load_table
    from realtime_fraud_detection_spark.suite.dedup_q import (
        _docs,
        q_hybrid_search,
    )

    docs = _docs(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = docs.filter("doc_id % 97 = 0").selectExpr(
        "doc_id AS q_id",
        "concat_ws(' ', slice(split(trim(regexp_replace(lower(text), "
        "'[^a-z0-9]+', ' ')), ' '), 1, 4)) AS query",
    )
    lex = [
        (r.q_id, r.doc, r.rank)
        for r in bm25_rank(docs, queries, top_k=20).collect()
    ]
    vec = [
        (r.qid, r.nid, r.rank)
        for r in SIM.brute_force_topk(
            emb, emb.filter("vec_id % 97 = 0"), k=20
        ).collect()
    ]
    expect = {
        (q, d): (score, rank, ranks.get("lex"), ranks.get("vec"))
        for q, d, score, rank, ranks in _replay(
            {"lex": lex, "vec": vec}, k=60
        )
        if rank <= 10
    }
    got = {
        (r.q_id, r.doc): (r.rrf_score, r.rank, r.lex_rank, r.vec_rank)
        for r in q_hybrid_search(spark, SF_SMOKE).collect()
    }
    assert got == expect
