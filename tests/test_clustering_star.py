"""connected_components_star (large-star/small-star) equals the min-label
propagation variant on random graphs, long chains, and vertex frames."""

from __future__ import annotations

import random

from realtime_fraud_detection_spark.operators.clustering import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["doc"]: r["cluster"] for r in df.collect()}


def test_star_equals_propagation_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(100 + trial * 40)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        e = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        base = _labels(connected_components(e))
        star = _labels(connected_components_star(e))
        assert star == base, f"trial {trial}"


def test_star_on_long_chain(spark):
    """A 200-node path — the adversarial diameter case the variant exists
    for. Both implementations must collapse it to one component labelled 0."""
    e = spark.createDataFrame([(i, i + 1) for i in range(200)], ["doc_a", "doc_b"])
    star = _labels(connected_components_star(e))
    assert set(star.values()) == {0}
    assert len(star) == 201


def test_star_with_vertices_and_isolates(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"])
    v = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], ["doc_id"])
    star = _labels(connected_components_star(e, vertices=v, vertex_col="doc_id"))
    assert star == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
