"""Iterative graph analytics beyond connected components (which lives in
operators/clustering.py with the dedup machinery that motivated it).

PageRank over the transaction graph is the classic "importance under
random traversal" fraud signal: a merchant or mule account that many
independently-risky paths flow into outranks its raw degree
(degree-style features are §2.8 M8 `network_features`; this is the
iterative refinement the reference's GNN module gestures at).

Power iteration as DataFrame ops, with the engine's iterative-loop
rules: per round ONE shuffle keyed by the edge destination (map-side
combined), rank tables localCheckpoint'd so lineage stays flat, the
driver holding only scalars (the dangling-mass term). Rank sums route
through DECIMAL, so ranks are bit-deterministic on any partitioning —
the same order-insensitivity rule every aggregate in this repo follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scaling import (
    RollingCheckpoint,
    dedup_edges,
    edge_storage_level,
    scaled_shuffle,
)

_DEC = "decimal(38,20)"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 15,
    vertices: DataFrame | None = None,
    vertex_col: str | None = None,
) -> DataFrame:
    """(vertex, rank) after `iters` power iterations on the DIRECTED
    edge list; ranks sum to 1. Dangling vertices (no out-edges — present
    only as destinations, or isolated via `vertices`) spread their mass
    uniformly each round, the standard correction (Page et al. 1999);
    that mass is the one driver-side scalar per round.

    Scale: the contribution join shuffles (dst, rank/out_deg) — edge-
    keyed, map-side combined; out-degrees compute once. Rounds are a
    fixed count (power iteration converges geometrically at rate
    `damping`; 15 rounds ≈ 1e-1.06… residual 0.85^15 ≈ 0.087 of the gap,
    plenty for ranking stability — raise `iters` for tighter tolerance).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    m = e.count()

    # per-round shuffles (contribution join + inflow aggregate) carry
    # edge-proportional state — size them from the edge count, not the
    # session default (operators/scaling.py); each round materializes
    # inside the block via the dangling-mass full-scan aggregate
    with scaled_shuffle(e.sparkSession, m):
        verts = e.select(F.col("src").alias("v")).union(
            e.select(F.col("dst").alias("v"))
        )
        if vertices is not None:
            vcol = vertex_col or vertices.columns[0]
            verts = verts.union(vertices.select(F.col(vcol).alias("v")))
        verts = verts.distinct().localCheckpoint()
        n = verts.count()
        if n == 0:
            return verts.select(F.col("v"), F.lit(0.0).alias("rank"))

        out_deg = e.groupBy(F.col("src").alias("v")).agg(
            F.count("*").alias("out_deg")
        )
        ranks = verts.join(out_deg, "v", "left").select(
            "v", F.lit(1.0 / n).alias("rank"), F.coalesce("out_deg", F.lit(0)).alias("out_deg")
        ).localCheckpoint(eager=False)
        ranks = _pagerank_rounds(e, ranks, n, damping, iters)
    return ranks.select("v", "rank")


def _pagerank_rounds(
    e: DataFrame, ranks: DataFrame, n: int, damping: float, iters: int
) -> DataFrame:
    # rolling chain: each round's rank table is vertex-sized, but 15+
    # un-freed generations still add up — free round k−1 once round k's
    # dangling aggregate has materialized it
    chain = RollingCheckpoint(e.sparkSession)
    for _ in range(iters):
        # dangling mass: ranks of vertices with no out-edges. The scalar's
        # full-scan aggregate ALSO materializes the lazy checkpoint — one
        # job per round instead of two (the CC convergence-probe rule;
        # the conditional sum reads every partition, no short-circuit)
        dangling = (
            ranks.agg(
                F.sum(
                    F.when(F.col("out_deg") == 0, F.col("rank"))
                    .otherwise(F.lit(0.0))
                    .cast(_DEC)
                ).alias("m")
            ).first()["m"]
        )
        dangling = float(dangling or 0.0)
        chain.free_prev()  # the aggregate materialized the newest ranks
        contribs = (
            e.join(ranks.withColumnRenamed("v", "src"), "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.col("c").cast(_DEC)).cast("double").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            ranks.select("v", "out_deg")
            .join(contribs, "v", "left")
            .select(
                "v",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
                "out_deg",
            )
        )
        ranks = chain.roll(ranks)
    # the last round's lazy checkpoint was materialized by its own
    # dangling-mass aggregate only for rounds 2..iters; materialize the
    # final table before the scaled-shuffle conf is restored
    ranks.agg(F.count("*")).collect()
    chain.free_prev()
    return ranks


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    edge_sample: float | None = None,
    sample_salt: str = "tri:",
) -> DataFrame:
    """(vertex, triangles) — exact per-vertex triangle counts on the
    UNDIRECTED simple graph induced by `edges` (direction, duplicates and
    self-loops are dropped first). Triangle density is the classic dense-
    neighborhood fraud signal (collusive rings close triangles; organic
    customer/merchant traffic is locally tree-like), and the global count
    (`SUM(triangles)/3`) is the graph-health scalar.

    Scale shape — degree-ordered edge orientation (Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer"): every
    undirected edge is oriented from its lower-(degree, id) endpoint to
    the higher one, which makes the oriented out-degree O(sqrt(m)) even
    when a hub's raw degree is millions. Wedges (u→v, u→w) are then a
    self-equi-join on the oriented SOURCE — the per-key fan-out is the
    oriented out-degree, so the "last reducer" hub key that breaks the
    naive neighbor join cannot occur — and each wedge closes into a
    triangle iff (v→w) is itself an oriented edge: one more equi join.
    Three shuffles total (degree agg, wedge self-join, closing semi
    join); no driver state, no iteration.

    The input frame is evaluated twice (a raw count sizes the shuffles,
    then the canonicalizing distinct consumes it) — localCheckpoint an
    EXPENSIVE derived edge frame before passing it in.

    ``edge_sample`` (DOULION, Tsourakakis et al. KDD'09): keep each
    undirected edge with probability p via a DETERMINISTIC md5 coin on
    the canonical endpoint pair, count triangles on the sparsified
    graph, scale counts by 1/p³ — an unbiased estimator of both the
    per-vertex and global counts (unbiasedness + spread pinned across
    independent coin salts in tests/test_triangles.py; `sample_salt`
    exists exactly so replicates CAN be independent — the default coin
    is fixed for suite determinism), with wedge volume (the stage that
    outgrows a cluster's shuffle capacity on clique-dominated graphs —
    a near-dup pair graph is a union of near-cliques, so exact wedge
    volume is Θ(Σ clique_size³)) cut by p². Output column `triangles`
    becomes a DOUBLE estimate; vertices whose every edge was sampled
    away are absent (they'd report 0.0).
    """
    # scale target from the RAW input count — a count-only aggregate is
    # memory-trivial, whereas the dedup distinct below is exactly the
    # kind of 32-way partial hash aggregate that OOMs a default heap at
    # 50M+ edges, so it must run INSIDE the scaled scope (measured: the
    # 100x probe died in this distinct when it ran pre-scope)
    m_est = edges.count()
    # wedge join output amplifies each edge by the oriented out-degree
    # (O(sqrt(m)) worst case) — size shuffles from the edge count with a
    # tighter per-partition budget than the iterative ops, and
    # materialize the vertex-sized result inside the scaled block
    with scaled_shuffle(
        edges.sparkSession, m_est, rows_per_partition=250_000
    ) as parts:
        # canonical undirected simple edges: (a < b), dedup, no loops.
        # The key repartition with an EXPLICIT count puts the dedup's
        # hash aggregate after a controlled-width shuffle: a bare
        # distinct runs its partial aggregate over the INPUT partitioning
        # (an upstream join's AQE-coalesced fat partitions give every map
        # task a multi-million-entry hash map), and a count-less
        # repartition(cols) is itself AQE-coalesced right back to fat
        # partitions — the 100x probe OOM'd under each in turn
        a, b = F.col(src_col), F.col(dst_col)
        und = dedup_edges(
            edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
            .filter(F.col("a") != F.col("b")),
            ["a", "b"],
            parts,
            m_est,
        )
        if edge_sample is not None:
            if not (0.0 < edge_sample <= 1.0):
                raise ValueError(f"edge_sample must be in (0, 1], got {edge_sample}")
            # deterministic md5 coin per canonical edge: same sparsified
            # graph on every run/partitioning (the suite determinism rule)
            from ..functions.hashing import md5_bigint

            coin = md5_bigint(
                F.concat_ws(":", F.col("a"), F.col("b")), salt=sample_salt
            )
            und = und.filter((coin % 1_000_000) < int(edge_sample * 1_000_000))
        lvl = edge_storage_level(m_est)
        und = (
            und.localCheckpoint()
            if lvl is None
            else und.localCheckpoint(storageLevel=lvl)
        )
        out = _triangle_count(und)
        if edge_sample is not None:
            out = out.select(
                "v",
                (F.col("triangles") / F.lit(float(edge_sample) ** 3)).alias(
                    "triangles"
                ),
            )
        return out.localCheckpoint()


def _triangle_count(und: DataFrame) -> DataFrame:
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orient: lower (degree, id) -> higher (degree, id)
    ranked = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    oriented = ranked.localCheckpoint(eager=False)  # three consumers below
    # wedges around each source u: (u -> v, u -> w), one per unordered
    # {v, w} (t1 < t2 keeps each wedge once)
    e1 = oriented.select(F.col("s").alias("u"), F.col("t").alias("v"))
    e2 = oriented.select(F.col("s").alias("u"), F.col("t").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    # the closing edge between v and w is oriented one way or the other;
    # normalize the probe to both and semi-join the oriented edge set
    closing = oriented.select(
        F.least("s", "t").alias("v"), F.greatest("s", "t").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"], "left_semi")
    # each triangle is found exactly once (at its unique lowest-order
    # apex); credit all three corners for the per-vertex counts
    corners = (
        tris.select(F.col("u").alias("v"))
        .unionAll(tris.select(F.col("v").alias("v")))
        .unionAll(tris.select(F.col("w").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.select("v")
        .join(corners, "v", "left")
        .select("v", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    return_edges: bool = False,
):
    """(vertex) — members of the k-core of the undirected simple graph:
    the maximal subgraph where every vertex keeps degree >= k after
    everything below is recursively peeled away (Seidman 1983 "Network
    structure and minimum degree"). The densest-region filter that
    triangles alone can't give: a fraud ring whose members each touch
    >= k shared entities survives the peel; organic tree-like traffic
    (degree piles with no mutual reinforcement) dissolves.

    Iterative peeling with the engine's loop discipline: per round ONE
    map-side-combined degree aggregate over the surviving edge table,
    one semi-join to drop light vertices, lazy localCheckpoint
    materialized by the convergence count (one job per round). Rounds
    are data-dependent — typically O(log n) for real graphs but a chain
    peels one layer per round (adversarial O(n); `max_iter` caps it and
    raises, the same guard as the CC loops).
    """
    # scale target from the raw input count — the canonicalizing distinct
    # is itself a heap-heavy aggregate and must run inside the scope
    m_est = edges.count()
    # per-round degree aggregate + two semi-joins carry edge-proportional
    # state: size their shuffles from the edge count (operators/scaling.py);
    # every round materializes via its convergence count, and the final
    # vertex set materializes before the conf restores
    with scaled_shuffle(edges.sparkSession, m_est) as parts:
        a, b = F.col(src_col), F.col(dst_col)
        # per-round checkpoint chain with prompt block release: peeling
        # removes FEW edges per round on dense graphs, so un-freed round
        # checkpoints accumulate rounds × ~full-table in the block
        # manager (the 100x probe OOM'd the default heap this way)
        chain = RollingCheckpoint(edges.sparkSession)
        # explicit-count key repartition before the dedup — see
        # triangle_count for why a bare distinct (or a count-less
        # repartition, which AQE re-coalesces) OOMs over fat partitions
        lvl = edge_storage_level(m_est)
        cur = chain.roll(
            dedup_edges(
                edges.select(
                    F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
                ).filter(F.col("a") != F.col("b")),
                ["a", "b"],
                parts,
                m_est,
            ),
            storage_level=lvl,
        )
        n_edges = cur.count()
        for _ in range(max_iter):
            if n_edges == 0:
                break
            deg = (
                cur.select(F.col("a").alias("v"))
                .unionAll(cur.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count("*").alias("d"))
            )
            keep = deg.filter(F.col("d") >= k).select("v")
            nxt = chain.roll(
                cur.join(keep.select(F.col("v").alias("a")), "a", "left_semi")
                .join(keep.select(F.col("v").alias("b")), "b", "left_semi")
                .select("a", "b"),
                storage_level=edge_storage_level(n_edges),
            )
            n_next = nxt.count()  # materializes the checkpoint (one job/round)
            chain.free_prev()  # round k−1's blocks are no longer needed
            if n_next in (0, n_edges):  # emptied or stable — converged
                cur, n_edges = nxt, n_next
                break
            cur, n_edges = nxt, n_next
        else:
            raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
        vertices = (
            cur.select(F.col("a").alias("v"))
            .unionAll(cur.select(F.col("b").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        if return_edges:
            # the surviving (already checkpointed, canonical a<b) edge
            # table — k-cores nest (Seidman: the k₂-core of G for k₂>k₁ is
            # the k₂-core of G's k₁-core), so callers peeling several k
            # values can seed the next peel from this instead of the full
            # graph (round 13: the expensive early full-graph rounds run
            # once instead of once per k)
            return vertices, cur.select(
                F.col("a").alias(src_col), F.col("b").alias(dst_col)
            )
        return vertices


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """(v, label) — community detection by synchronous label propagation
    (Raghavan, Albert & Kumara, Phys. Rev. E 76, 2007) on the undirected
    simple graph. Communities are DENSITY structure, not connectivity:
    two cliques joined by one bridge edge are a single connected
    component (`clustering.connected_components`) but two LPA
    communities — the distinction that separates a fraud ring from the
    organic traffic it happens to touch.

    Deterministic variant of the (originally randomized) algorithm:
    every round each vertex adopts the most frequent label among its
    neighbors PLUS its own current label (the self-vote damps the
    two-cycle oscillation synchronous updates are prone to), ties broken
    by the smallest label — so labels are a pure function of the input
    edge set, any partitioning. Converged when no label changes; if the
    residual oscillation survives `max_rounds`, the round-`max_rounds`
    labeling is returned (still deterministic — documented LPA behavior,
    not an error).

    Loop discipline (the pagerank/k_core rules): the neighbor table is
    built once; each round is ONE label join + one map-side-combined
    (v, label) count + the argmax aggregate, with the convergence count
    materializing the round's lazy checkpoint (one job per round) and
    round k−1's blocks freed as round k lands."""
    m_est = edges.count()
    with scaled_shuffle(edges.sparkSession, m_est) as parts:
        a, b = F.col(src_col), F.col(dst_col)
        half = dedup_edges(
            edges.select(
                F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
            ).filter(F.col("a") != F.col("b")),
            ["a", "b"],
            parts,
            m_est,
        )
        # the neighbor table is 2x the edge list and lives for every
        # round — above the edge-table threshold it must park on disk
        # (OOM-ladder knob 4; the 100x probe failed exactly here before)
        und_base = half.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
            half.select(F.col("b").alias("v"), F.col("a").alias("u"))
        )
        lvl = edge_storage_level(2 * m_est)
        und = (
            und_base.localCheckpoint(eager=True)
            if lvl is None
            else und_base.localCheckpoint(eager=True, storageLevel=lvl)
        )
        chain = RollingCheckpoint(edges.sparkSession)
        labels = chain.roll(
            und.select("v").distinct().select("v", F.col("v").alias("label"))
        )
        n_v = labels.count()  # materializes the initial labeling
        if n_v == 0:
            return labels.select("v", "label")
        for _ in range(max_rounds):
            votes = und.join(
                labels.select(F.col("v").alias("u"), "label"), "u"
            ).select("v", "label")
            counts = (
                votes.unionAll(labels)  # self-vote
                .groupBy("v", "label")
                .agg(F.count("*").alias("cnt"))
            )
            # min over (−cnt, label): highest count, then smallest label
            pick = counts.groupBy("v").agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label"))
                )["label"].alias("new_label")
            )
            nxt = chain.roll(
                labels.join(pick, "v").select(
                    "v",
                    F.col("new_label").alias("label"),
                    (F.col("new_label") != F.col("label")).cast("int").alias("_chg"),
                )
            )
            changed = nxt.agg(F.sum("_chg").alias("c")).first()["c"] or 0
            chain.free_prev()
            labels = nxt.select("v", "label")
            if changed == 0:
                break
        # the loop's last convergence count already materialized the
        # final checkpoint; drop everything older (the pagerank ending)
        chain.free_prev()
        return labels


def shared_key_edges(
    memberships: DataFrame,
    id_col: str,
    key_col: str,
    min_shared: int = 1,
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, dict]:
    """Co-occurrence pair graph from an (id, key) membership table: edge
    (src < dst) whenever two ids share >= `min_shared` keys — the
    device/entity-affinity graph behind the triangle and community fraud
    signals (reference's network module derives the same graph from
    shared attributes; see SURVEY §2.8 M8).

    Scale shape: the pair join shuffles on the key only, and per-key
    contributor counts are the skew risk — one hot key with u members
    emits u²/2 join rows before any downstream filter runs (the LSH
    bucket problem in a different costume, operators/dedup.py
    `max_bucket_size`). The cap applies the same guard with the same
    semantics: keys whose membership exceeds `max_bucket_size` are
    dropped from pairing entirely — an entity shared by thousands of
    users carries no affinity signal (a stopword, not a device), and a
    deterministic drop beats a biased sample. The cap decision costs one
    scan of the (small) membership table; oversized keys are
    broadcast-anti-joined away.

    Returns (edges, stats): `stats["dropped_keys"]` for the cap log and
    `stats["est_pairs"]` (the exact post-cap pair-row count, from
    sum sz·(sz−1)/2) which also sizes the dedup/aggregation plan —
    explicit-width repartition above SAFE_DEDUP_THRESHOLD so the partial
    hash agg never runs over AQE-fattened join output partitions."""
    m = memberships.select(
        F.col(id_col).alias("_id"), F.col(key_col).alias("_k")
    )
    sizes = m.groupBy("_k").agg(F.count(F.lit(1)).alias("_bsz"))
    cap_pred = (
        F.col("_bsz") > max_bucket_size
        if max_bucket_size is not None
        else F.lit(False)
    )
    agg = sizes.agg(
        F.coalesce(
            F.sum(F.when(cap_pred, F.lit(1))), F.lit(0)
        ).alias("dropped"),
        F.coalesce(
            F.sum(
                F.when(
                    ~cap_pred, F.col("_bsz") * (F.col("_bsz") - 1) / 2
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("pairs"),
    ).first()
    stats = {
        "dropped_keys": int(agg["dropped"]),
        "est_pairs": int(agg["pairs"]),
    }
    if stats["dropped_keys"]:
        m = m.join(
            F.broadcast(sizes.filter(cap_pred).select("_k")),
            "_k",
            "left_anti",
        )
    a = m.select(F.col("_id").alias("src"), "_k")
    b = m.select(F.col("_id").alias("dst"), "_k")
    pairs = (
        a.join(b, "_k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    n_pairs = stats["est_pairs"]
    if min_shared <= 1:
        edges, parts = _sized_pair_agg(pairs, n_pairs)
        edges = (
            edges.distinct()
            if parts is None
            else edges.dropDuplicates()
        )
    else:
        shaped, _ = _sized_pair_agg(pairs, n_pairs)
        edges = (
            shaped.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("_shared"))
            .filter(F.col("_shared") >= min_shared)
            .select("src", "dst")
        )
    return edges, stats


def _sized_pair_agg(pairs: DataFrame, n_pairs: int):
    """Pin an explicit shuffle width on (src, dst) when the pair volume
    exceeds the safe partial-agg threshold (scaling.dedup_edges's rule:
    bare distinct/groupBy partial maps are sized by the INPUT
    partitioning, and AQE re-fattens count-less repartitions)."""
    from .scaling import (
        DEFAULT_ROWS_PER_PARTITION,
        SAFE_DEDUP_THRESHOLD,
    )

    if n_pairs <= SAFE_DEDUP_THRESHOLD:
        return pairs, None
    parts = max(32, -(-n_pairs // DEFAULT_ROWS_PER_PARTITION))
    return pairs.repartition(parts, "src", "dst"), parts
