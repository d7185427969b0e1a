"""Label propagation communities (operators/graph.py:label_propagation):
density communities vs connectivity components (bridged cliques split),
the hand-traced deterministic update, and run-to-run determinism."""

from __future__ import annotations

from realtime_fraud_detection_spark.operators.graph import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def test_bridged_triangles_split_into_two_communities(spark):
    """Two triangles joined by one bridge: ONE connected component but
    TWO LPA communities (hand-traced: the deterministic min-tie update
    settles {1,2,3}→1 and {4,5,6}→4 in three rounds)."""
    e = _edges(spark, _clique([1, 2, 3]) + _clique([4, 5, 6]) + [(3, 4)])
    got = {r["v"]: r["label"] for r in label_propagation(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_density_vs_connectivity(spark):
    """The same bridged-clique graph is a single connected component —
    LPA's community split is information CC cannot express."""
    from realtime_fraud_detection_spark.operators.clustering import (
        connected_components,
    )

    e = _edges(spark, _clique([1, 2, 3, 4, 5]) + _clique([10, 11, 12, 13, 14]) + [(5, 10)])
    cc = connected_components(e, src_col="src", dst_col="dst")
    assert cc.select("cluster").distinct().count() == 1
    lpa = label_propagation(e)
    labels = {r["v"]: r["label"] for r in lpa.collect()}
    assert len(set(labels.values())) == 2
    # each clique is uniformly labeled
    assert len({labels[v] for v in [1, 2, 3, 4, 5]}) == 1
    assert len({labels[v] for v in [10, 11, 12, 13, 14]}) == 1


def test_deterministic_across_runs_and_partitionings(spark):
    e = _edges(
        spark,
        _clique([1, 2, 3, 4]) + _clique([7, 8, 9]) + [(4, 7), (2, 9)],
    )
    a = sorted(map(tuple, label_propagation(e).collect()))
    b = sorted(map(tuple, label_propagation(e.repartition(7)).collect()))
    assert a == b


def test_self_loops_and_duplicates_ignored(spark):
    e = _edges(
        spark,
        _clique([1, 2, 3]) + [(1, 1), (2, 1), (1, 2), (3, 3)],
    )
    got = {r["v"]: r["label"] for r in label_propagation(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_empty_graph(spark):
    e = _edges(spark, []).filter("src is not null")
    assert label_propagation(e).count() == 0
