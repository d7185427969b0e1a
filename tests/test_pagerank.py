"""PageRank (operators/graph.py): exact replay against a Python power
iteration with identical arithmetic, the dangling-mass correction,
determinism, and rank-sum conservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.graph import pagerank

# the classic 4-vertex example: d is dangling (no out-edges)
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d")]


def _reference(edges, n_iters, damping=0.85):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    out_deg = {v: 0 for v in verts}
    for s, _ in edges:
        out_deg[s] += 1
    rank = {v: 1.0 / n for v in verts}
    for _ in range(n_iters):
        dangling = sum(rank[v] for v in verts if out_deg[v] == 0)
        inflow = {v: 0.0 for v in verts}
        for s, d in edges:
            inflow[d] += rank[s] / out_deg[s]
        base = (1.0 - damping) / n + damping * dangling / n
        rank = {v: base + damping * inflow[v] for v in verts}
    return rank


@pytest.fixture(scope="module")
def ranks(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    return {r["v"]: r["rank"] for r in pagerank(df, iters=20).collect()}


def test_matches_reference_power_iteration(ranks):
    want = _reference(EDGES, 20)
    assert set(ranks) == set(want)
    for v in want:
        assert ranks[v] == pytest.approx(want[v], abs=1e-9), v


def test_rank_mass_conserved_and_ordering(ranks):
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    # a receives ALL of c's mass (c→a is c's only edge) → top; dangling
    # d, fed only by half of b, stays at the bottom
    assert ranks["a"] == max(ranks.values())
    assert ranks["d"] == min(ranks.values())


def test_deterministic_across_runs(spark, ranks):
    df = spark.createDataFrame(EDGES, "src string, dst string").repartition(7)
    again = {r["v"]: r["rank"] for r in pagerank(df, iters=20).collect()}
    assert again == ranks  # decimal sums → identical on any partitioning


def test_isolated_vertices_get_base_rank(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    verts = spark.createDataFrame([("a",), ("z",)], "v string")
    out = {r["v"]: r["rank"] for r in pagerank(df, iters=10, vertices=verts).collect()}
    assert "z" in out and out["z"] > 0  # isolated: base + dangling share
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_fraud_graph_smoke(spark, fraud_data):
    """user→merchant transaction edges: ranks sum to 1, merchants with
    more distinct payers rank above sparsely-visited ones on average."""
    _, _, tx = fraud_data
    edges = tx.select(
        F.col("user_id").alias("src"), F.col("merchant_id").alias("dst")
    ).distinct()
    pr = pagerank(edges, iters=10)
    total = pr.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-6)
    deg = edges.groupBy(F.col("dst").alias("v")).agg(F.count("*").alias("in_deg"))
    joined = pr.join(deg, "v").collect()
    hi = [r["rank"] for r in joined if r["in_deg"] >= 15]
    lo = [r["rank"] for r in joined if r["in_deg"] <= 5]
    if hi and lo:
        assert sum(hi) / len(hi) > sum(lo) / len(lo)
