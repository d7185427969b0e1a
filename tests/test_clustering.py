"""Connected-components dedup clustering (operators/clustering): min-label
propagation vs a Python union-find ground truth, plus survivor selection."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import clustering as C


def _uf_components(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label = min id in component
    comp = {}
    for v in range(n_vertices):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def _run(spark, edges, vertices=None):
    edf = spark.createDataFrame(edges, "doc_a int, doc_b int")
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], "doc_id int")
        if vertices is not None
        else None
    )
    return {
        r["doc"]: r["cluster"]
        for r in C.connected_components(edf, vertices=vdf).collect()
    }


def test_small_known_graph(spark):
    got = _run(spark, [(1, 2), (2, 3), (5, 6)], vertices=range(1, 8))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_chain_worst_case_diameter(spark):
    """A 16-vertex chain needs diameter-many propagation rounds — the
    convergence loop, not a fixed round count, must carry the label to the
    far end."""
    got = _run(spark, [(i, i + 1) for i in range(15)])
    assert set(got.values()) == {0}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges, vertices=range(n))
    assert got == _uf_components(n, edges)


def test_survivors_keep_min_per_cluster_and_singletons(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id int, text string"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "doc_a int, doc_b int")
    clusters = C.connected_components(edges)
    kept = sorted(
        r["doc_id"] for r in C.dedup_survivors(df, clusters, "doc_id").collect()
    )
    # 1 survives {1,2,3}; 5 survives {5,6}; 0, 4, 7 are singletons
    assert kept == [0, 1, 4, 5, 7]


def test_deterministic_across_runs(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _run(spark, edges)


def test_edge_contraction_path_equivalent(spark):
    """contract_threshold=0 forces contraction every round; results must be
    identical to the uncontracted path (long chain exercises multi-round
    convergence through contracted super-vertex edges)."""
    rng = random.Random(13)
    edges = [(i, i + 1) for i in range(20)]  # one chain: diameter 20
    edges += [(rng.randrange(40, 70), rng.randrange(40, 70)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(edges, "doc_a int, doc_b int")
    plain = {
        r["doc"]: r["cluster"] for r in C.connected_components(edf).collect()
    }
    contracted = {
        r["doc"]: r["cluster"]
        for r in C.connected_components(edf, contract_threshold=0).collect()
    }
    assert plain == contracted
    uf = _uf_components(70, edges)
    assert plain == {v: uf[v] for v in plain}  # consistent with union-find
