"""Exact triangle counting (operators/graph.triangle_count): hand graphs,
DuckDB brute-force parity on a deterministic pseudo-random graph, and
input normalization (direction/duplicates/self-loops)."""

from __future__ import annotations

import duckdb

from realtime_fraud_detection_spark.operators.graph import triangle_count


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["v"]: r["triangles"] for r in triangle_count(df).collect()}


def test_hand_graphs(spark):
    # K3: one triangle, every vertex in it
    assert _counts(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}
    # K4: 4 triangles, every vertex in 3
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # path and star: triangle-free
    assert _counts(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 0, 2: 0, 3: 0, 4: 0}
    star = [(0, i) for i in range(1, 6)]
    assert all(v == 0 for v in _counts(spark, star).values())
    # bipartite: triangle-free regardless of density
    bip = [(a, 100 + b) for a in range(5) for b in range(5)]
    assert all(v == 0 for v in _counts(spark, bip).values())


def test_normalizes_direction_duplicates_loops(spark):
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 1), (2, 3)]
    assert _counts(spark, messy) == {1: 1, 2: 1, 3: 1}


def test_matches_duckdb_bruteforce(spark):
    # deterministic pseudo-random graph: 120 vertices, ~700 edges
    edges = []
    state = 7
    for _ in range(700):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = (state >> 16) % 120  # high bits: LCG low bits lattice badly
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = (state >> 16) % 120
        if a != b:
            edges.append((a, b))
    got = _counts(spark, edges)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE raw(src BIGINT, dst BIGINT);"
    )
    con.executemany("INSERT INTO raw VALUES (?, ?)", edges)
    rows = con.execute("""
        WITH e AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
          SELECT x AS v FROM tri UNION ALL
          SELECT y FROM tri UNION ALL
          SELECT z FROM tri
        ),
        verts AS (SELECT a AS v FROM e UNION SELECT b FROM e)
        SELECT verts.v, COUNT(corners.v) AS t
        FROM verts LEFT JOIN corners ON corners.v = verts.v
        GROUP BY 1
    """).fetchall()
    want = {v: t for v, t in rows}
    assert got == want
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def test_suite_query_matches_duckdb_on_fixture(spark):
    """The `triangles` suite query (user co-occurrence graph from events)
    matches a DuckDB brute force of the same graph definition."""
    from realtime_fraud_detection_spark.suite.graph_q import q_triangles

    got = {
        (r["v"], r["triangles"])
        for r in q_triangles(spark, "/root/testdata/sf0.001").collect()
    }
    con = duckdb.connect()
    rows = con.execute("""
        WITH affin AS (
          SELECT user_id, json_extract(props, 'k')::INT AS k
          FROM '/root/testdata/sf0.001/events.parquet'
          GROUP BY 1, 2 HAVING COUNT(*) >= 3
        ),
        e AS (
          SELECT DISTINCT a.user_id AS a, b.user_id AS b
          FROM affin a JOIN affin b ON a.k = b.k AND a.user_id < b.user_id
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
          SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
        ),
        verts AS (SELECT a AS v FROM e UNION SELECT b FROM e)
        SELECT verts.v, COUNT(corners.v) FROM verts
        LEFT JOIN corners ON corners.v = verts.v GROUP BY 1
    """).fetchall()
    assert got == {(v, t) for v, t in rows}


def test_edge_sampled_estimate(spark):
    """DOULION edge sampling: deterministic (md5 coin), p=1.0 returns the
    exact counts scaled by 1.0, and a clique's global estimate at p<1 is
    within a loose band of the exact count (the estimator is unbiased;
    one fixed seed draw lands near the mean on a dense graph)."""
    import itertools

    # K12: 220 triangles at every vertex is dense enough for a stable draw
    edges = spark.createDataFrame(
        list(itertools.combinations(range(12), 2)), "src long, dst long"
    )
    exact_total = sum(
        r["triangles"] for r in triangle_count(edges).collect()
    )
    assert exact_total == 3 * 220  # C(12,3) triangles x 3 corners

    full = {  # p = 1.0: identical to exact, as doubles
        r["v"]: r["triangles"]
        for r in triangle_count(edges, edge_sample=1.0).collect()
    }
    ex = {r["v"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert full == {v: float(t) for v, t in ex.items()}

    est1 = triangle_count(edges, edge_sample=0.7).collect()
    est2 = triangle_count(edges.repartition(5), edge_sample=0.7).collect()
    # deterministic: same estimate on any partitioning
    assert sorted(map(tuple, est1)) == sorted(map(tuple, est2))
    total_est = sum(r["triangles"] for r in est1)
    assert 0.4 * exact_total <= total_est <= 2.5 * exact_total


def test_shared_key_edges_cap_and_stats(spark):
    """shared_key_edges: hot keys above max_bucket_size are dropped from
    pairing entirely (deterministic, no sampling bias), the stats row
    reports the drop and the exact post-cap pair volume, and min_shared
    counts only surviving keys."""
    from realtime_fraud_detection_spark.operators.graph import (
        shared_key_edges,
    )

    rows = (
        [(u, 1) for u in range(10)]     # hot key: 10 members → 45 pairs
        + [(1, 2), (2, 2), (3, 2)]      # small key: 3 pairs
        + [(1, 3), (2, 3)]              # small key: 1 pair
    )
    m = spark.createDataFrame(rows, "uid long, k int")

    # uncapped: all keys pair
    edges, stats = shared_key_edges(m, "uid", "k")
    assert stats == {"dropped_keys": 0, "est_pairs": 49}
    assert edges.count() == 45  # distinct pairs: hot key covers the rest

    # cap below the hot key: only the small keys pair
    edges, stats = shared_key_edges(m, "uid", "k", max_bucket_size=5)
    assert stats == {"dropped_keys": 1, "est_pairs": 4}
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (1, 2), (2, 3)} | {(1, 3)}
    assert got == {(1, 2), (1, 3), (2, 3)}

    # min_shared over surviving keys: pairs sharing both small keys
    edges, stats = shared_key_edges(
        m, "uid", "k", min_shared=2, max_bucket_size=5
    )
    assert {(r["src"], r["dst"]) for r in edges.collect()} == {(1, 2)}


def test_suite_graph_cap_does_not_bind_on_fixture(spark):
    """The suite queries' _AFFINITY_CAP must not bind at fixture scale
    (output parity with the uncapped DuckDB definition above depends on
    it); pin dropped_keys == 0 on the smoke fixture."""
    from pyspark.sql import functions as F
    from realtime_fraud_detection_spark.operators.graph import (
        shared_key_edges,
    )
    from realtime_fraud_detection_spark.sources.testdata import load_table
    from realtime_fraud_detection_spark.suite.graph_q import (
        _AFFINITY_CAP,
        _affinity,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    _edges, stats = shared_key_edges(
        _affinity(ev), "user_id", "k", max_bucket_size=_AFFINITY_CAP
    )
    assert stats["dropped_keys"] == 0


def test_doulion_unbiased_across_independent_coins(spark):
    """The DOULION estimator's bias/variance claim, pinned rather than
    cited (round-10 item): on a clique-union graph (the near-dup pair
    topology the sampler exists for), 8 independent md5 coins at p=0.5
    give estimates whose MEAN lands within a few percent of the exact
    global count (unbiasedness), while single draws spread wide enough
    to justify the variance warning in the docstring. `sample_salt`
    exists exactly so replicates can be independent; the default salt
    stays fixed for suite determinism."""
    import itertools
    import statistics

    edges = []
    for c in range(10):  # 10 disjoint 10-cliques: 3600 triangle-corners
        base = c * 100
        edges += [
            (base + a, base + b)
            for a, b in itertools.combinations(range(10), 2)
        ]
    df = spark.createDataFrame(edges, "src long, dst long")
    exact = sum(r["triangles"] for r in triangle_count(df).collect())
    assert exact == 10 * 120 * 3

    ests = [
        sum(
            r["triangles"]
            for r in triangle_count(
                df, edge_sample=0.5, sample_salt=f"tri{i}:"
            ).collect()
        )
        for i in range(8)
    ]
    mean = statistics.mean(ests)
    # measured on these fixed coins: mean rel err 5.7%, worst draw 29%
    assert abs(mean - exact) / exact < 0.15
    assert all(abs(e - exact) / exact < 0.5 for e in ests)
    # and at least one draw differs from another: the salts really do
    # produce independent sparsifications
    assert len(set(ests)) > 1
