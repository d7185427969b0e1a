"""k-core peeling (operators/graph.k_core): hand graphs, brute-force
replay parity on a pseudo-random graph, and edge cases."""

from __future__ import annotations

import pytest

from realtime_fraud_detection_spark.operators.graph import k_core


def _members(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["v"] for r in k_core(df, k).collect()}


def _brute(edges, k):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    return {v for v in adj if adj[v]}


def test_hand_graphs(spark):
    # triangle with a pendant: 2-core is the triangle, pendant peels
    g = [(1, 2), (2, 3), (3, 1), (3, 4)]
    assert _members(spark, g, 2) == {1, 2, 3}
    assert _members(spark, g, 1) == {1, 2, 3, 4}
    assert _members(spark, g, 3) == set()
    # K4 survives 3-core
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _members(spark, k4, 3) == {0, 1, 2, 3}
    # chain peels completely at k=2 (the round-per-layer shape)
    chain = [(i, i + 1) for i in range(10)]
    assert _members(spark, chain, 2) == set()
    # cascade: removing the hub's fringe drops the hub below k
    star_plus = [(0, i) for i in range(1, 5)] + [(1, 2), (2, 3), (3, 1)]
    assert _members(spark, star_plus, 3) == {0, 1, 2, 3}


def test_matches_bruteforce(spark):
    edges = []
    state = 11
    for _ in range(400):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = (state >> 16) % 80
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = (state >> 16) % 80
        if a != b:
            edges.append((a, b))
    for k in (2, 3, 4):
        assert _members(spark, edges, k) == _brute(edges, k), k


def test_max_iter_guard(spark):
    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(df, 2, max_iter=3)


def test_peel_degree_agg_is_map_side_combined(spark):
    """The per-round degree aggregate must ship PARTIAL counts into the
    shuffle (HashAggregate(partial_count) below the Exchange) — at 53M
    edges (the 100x probe) a final-only aggregate would shuffle every
    edge endpoint raw. This pins the peel's one-shuffle-per-round cost
    model the SCALE.md k_core row relies on."""
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.plans.explain import formatted_plan

    cur = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "a long, b long"
    )
    deg = (
        cur.select(F.col("a").alias("v"))
        .unionAll(cur.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    plan = formatted_plan(deg)
    assert "partial_count" in plan, plan
    # partial runs BELOW the exchange. Formatted-plan node ids are
    # assigned leaf-first (Scan=1 ... partial HashAggregate=6,
    # Exchange=7, final HashAggregate=8), so "below the shuffle" means
    # the partial node's id is SMALLER than the Exchange's. The partial
    # node is identified by its detail block carrying partial_count — a
    # bare `(\d+) HashAggregate` match would grab whichever aggregate
    # prints first and the ordering check would be vacuous (ADVICE r12;
    # the old comment also had the id direction backwards).
    import re

    ex = re.search(r"\((\d+)\) Exchange", plan)
    part_id = None
    # the detail section prints one blank-line-separated block per node
    for block in re.split(r"\n\s*\n", plan):
        m = re.match(r"\((\d+)\) HashAggregate", block.strip())
        if m and "partial_count" in block:
            part_id = int(m.group(1))
            break
    assert ex and part_id is not None, plan
    assert part_id < int(ex.group(1)), (part_id, ex.group(1), plan)


def test_k_core_return_edges_nesting(spark):
    """k-cores nest (Seidman): peeling k=3 from the k=2-core's surviving
    edges (`return_edges=True`) must give exactly the k=3-core of the full
    graph — the round-13 multi-k seeding capability. Also pins that the
    returned edge frame is canonical (src < dst, no duplicates)."""
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.graph import k_core

    # two triangles sharing a vertex + a pendant chain: 2-core = both
    # triangles, 3-core = empty; plus a K4 so the 3-core is non-empty
    edges = [
        (1, 2), (2, 3), (3, 1),
        (3, 4), (4, 5), (5, 3),
        (5, 6), (6, 7),
        (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    v2, e2 = k_core(df, 2, return_edges=True)
    chained = sorted(r["v"] for r in k_core(e2, 3).collect())
    scratch = sorted(r["v"] for r in k_core(df, 3).collect())
    assert chained == scratch == [10, 11, 12, 13]
    rows = e2.collect()
    assert all(r["src"] < r["dst"] for r in rows)
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
