"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane, SimHash-for-vectors) variant as the 100 TB scale path:
the bucketed form turns the q×N cross join into an equi join on the bucket
signature, probing only colliding buckets.

Dot products are pure `zip_with`/`aggregate` higher-order expressions —
JVM-side, no Python. For very wide vectors or very hot paths, swap in the
pandas_udf variant (`cosine_topk_pandas`) which moves the math to NumPy BLAS
over Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries × corpus cross join (broadcast the query side — it is small by
    construction), then a per-query top-k window. Similarity is rounded
    before ranking so ranking ties are broken deterministically by id.

    Norms are hoisted to one l2_norm per ROW before the cross join (r13):
    the inlined cosine() recomputed BOTH interpreted-HOF norm folds per
    PAIR — 3× the per-pair element work for |q|·|corpus| pairs. Same
    expressions over the same values, so the quotient is bit-identical.
    """
    c = emb.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv"))
    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv"))
    c = c.withColumn("_nn", l2_norm(F.col("nv")))
    q = q.withColumn("_qn", l2_norm(F.col("qv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(
                dot(F.col("qv"), F.col("nv")) / (F.col("_qn") * F.col("_nn")),
                round_digits,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: bit b = sign(vec · plane_b).

    `planes` are fixed (seeded) constant vectors, folded into the plan as
    literals — at scale this is a pure scan + projection, no shuffle.
    """
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        s = dot(vec, plane)
        bits.append(F.when(s >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency at
    plan-build time, reproducible everywhere)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    Recall depends on n_planes; the equi join on `bucket` replaces the cross
    join, so cost is per-bucket not corpus-wide. ``planes``: persisted
    hyperplanes (functions/ann_io) — skips the (deterministic) regeneration
    and pins the bucketing to the artifact that encoded a stored corpus.
    """
    if planes is None:
        planes = make_planes(dim, n_planes)
    c = emb.select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(vec_col)).alias("nv"),
    ).withColumn("bucket", hyperplane_bucket(F.col("nv"), planes))
    q = queries.select(
        F.col(id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", hyperplane_bucket(F.col("qv"), planes))
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# Driver-local quantizer training gate: inputs up to this many CELLS
# (rows x dim) collect and fit with the seeded NumPy Lloyd's below —
# ~64 MB of doubles, the same "model-sized collect" budget as the
# codebook/centroid literals the fit produces. Quantizer training is
# DISTRIBUTIONAL (FAISS trains on 10k-1M samples regardless of corpus
# size): at 100 TB the caller passes `sampling.hash_sample(...)`, which
# lands under the gate by construction; anything larger falls back to
# the distributed MLlib fit. The gate exists because an MLlib KMeans fit
# costs ~20 scheduled jobs (init rounds + Lloyd iterations) — ~8-15 s of
# pure job-scheduling latency on a 2 000-row fixture, 28+ s across one
# IVF,PQ build's 9 fits, while the local fit is milliseconds.
_LOCAL_FIT_CELLS = 8_000_000


def _kmeans_local(X, k: int, seed: int, max_iter: int = 20, tol: float = 1e-4):
    """Seeded k-means++ init + Lloyd's over a driver-side sample.
    Deterministic for a given (X row order, seed, numpy): callers sort X
    canonically before calling. Distances use the expanded |x|^2 -
    2x.c + |c|^2 form (n x k matrix, never n x k x dim); empty clusters
    keep their previous center (MLlib's behavior); ties take the lowest
    centroid id (argmin-first)."""
    import numpy as np

    n = X.shape[0]
    rng = np.random.RandomState(seed)
    x2 = (X * X).sum(1)
    first = int(rng.randint(n))
    C = [X[first]]
    d2 = np.maximum(x2 - 2.0 * (X @ X[first]) + x2[first], 0.0)
    for _ in range(1, k):
        tot = float(d2.sum())
        j = int(rng.choice(n, p=d2 / tot)) if tot > 0 else int(np.argmax(d2))
        C.append(X[j])
        d2 = np.minimum(d2, np.maximum(x2 - 2.0 * (X @ X[j]) + x2[j], 0.0))
    C = np.stack(C)
    for _ in range(max_iter):
        D = x2[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None]
        assign = D.argmin(1)
        new = C.copy()
        for c in range(k):
            members = assign == c
            if members.any():
                new[c] = X[members].mean(0)
        move = float(np.sqrt(((new - C) ** 2).sum(1)).max())
        C = new
        if move < tol:
            break
    return [list(map(float, c)) for c in C]


def _local_fit_sample(df: DataFrame, vec_col: str, max_rows: int):
    """Collect up to the local-fit gate as a canonically ordered (by
    vector content — id-independent) float64 matrix, or None if the
    input exceeds the gate (caller falls back to the distributed fit).
    The limit probe short-circuits the scan; the collect is gate-bounded
    by construction and goes through Arrow (`toArrow`) — py4j row
    pickling was ~10 s of a ~100k-row sample collect."""
    import numpy as np

    if df.select(vec_col).limit(max_rows + 1).count() > max_rows:
        return None
    tbl = df.select(_as_double(F.col(vec_col)).alias("v")).toArrow()
    arr = tbl.column("v").combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    X = flat.reshape(len(arr), -1)
    return X[np.lexsort(X.T[::-1])]


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment in one Arrow-batched scan — the
    expanded -2x.c + |c|^2 argmin (per-row |x|^2 constant dropped), ties
    to the lowest centroid id. ``passthrough=False``: (id, cell) only.
    ``passthrough=True``: the input columns plus ``cell`` — a pure
    scan-side projection like MLlib's transform, NO join/shuffle (the
    shape semantic_dedup needs: every input column rides through the
    same Arrow batch)."""
    import numpy as np

    W = np.array([[-2.0 * c for c in ctr] for ctr in centroids], np.float64)
    b = np.array([_sqnorm(ctr) for ctr in centroids], np.float64)

    from pyspark.sql.types import IntegerType, StructField, StructType

    src = df if passthrough else df.select(id_col, vec_col)
    out_schema = StructType(  # fresh StructType: .add would mutate src's
        list(src.schema.fields) + [StructField("cell", IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            pdf = pdf.copy()
            pdf["cell"] = (X @ W.T + b[None]).argmin(1).astype(np.int32)
            yield pdf

    res = src.mapInPandas(assign, out_schema)
    return res if passthrough else res.select(id_col, "cell")


def fit_kmeans(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    seed: int = 42,
    local_cells: int | None = None,
) -> list[list[float]] | None:
    """Centroids for a k-means quantizer: driver-local seeded Lloyd's
    under the `local_cells` gate (None = the module _LOCAL_FIT_CELLS,
    read at CALL time so tests can force the fallback), None above it —
    callers fall back to their MLlib path (which also yields the
    assignment frame for free)."""
    if local_cells is None:
        local_cells = _LOCAL_FIT_CELLS
    dim = len(df.select(vec_col).first()[0])
    X = _local_fit_sample(df, vec_col, max(local_cells // dim, k))
    return None if X is None else _kmeans_local(X, k, seed)


def fit_coarse_quantizer(
    emb: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_on: DataFrame | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Fit the IVF coarse quantizer ONCE and return what every IVF-family
    index actually consumes: (centroids, cells_df) where cells_df is the
    materialized (nid, cell) assignment (vertex-sized, two columns).

    Every composed index over the same corpus — IVF flat, IVF,SQ8,
    IVF,PQ, residual IVF,PQ — shares the identical coarse model (same
    n_cells, same seed), and the KMeans fit is the single largest
    build-cost line (SCALE.md ann_pq_res anatomy: 8.2 s of a 24.9 s
    build at sf0.1). Fit it once, inject it everywhere via the
    operators' `coarse=` parameter; production serves it from the
    persisted-centroids artifact the same way (functions/ann_io.py).

    Under the _LOCAL_FIT_CELLS gate the fit is the seeded driver-local
    Lloyd's (model-sized sample by construction — the FAISS training
    topology) and the assignment one Arrow scan; above it, the
    distributed MLlib fit. `fit_on` restricts TRAINING to a sample
    (`sampling.hash_sample`) while assignment still scans `emb` — the
    production shape when the corpus itself exceeds the gate."""
    c = emb.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv")
    )
    train = (
        c
        if fit_on is None
        else fit_on.select(
            F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv")
        )
    )
    centroids = fit_kmeans(train, n_cells, "nv", seed)
    if centroids is not None:
        cells_df = assign_cells(c, centroids, "nid", "nv").localCheckpoint()
        return centroids, cells_df
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = c.withColumn("fv", array_to_vector(F.col("nv")))
    km = KMeans(k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell")
    model = km.fit(
        train.withColumn("fv", array_to_vector(F.col("nv")))
        if fit_on is not None
        else with_vec
    )
    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    cells_df = (
        model.transform(with_vec).select("nid", "cell").localCheckpoint()
    )
    return centroids, cells_df


def _explode_probe_cells(q: DataFrame, cells: Column, n_probe: int) -> DataFrame:
    """Attach one row per probed coarse cell: `cell` = the i-th nearest
    centroid id, i = 1..n_probe (r14). The direct form —
    ``explode(slice(array_sort(cells), 1, n_probe)["cell"])`` — paid the
    Generate tax: the generator expression re-evaluates per OUTPUT
    element, so every query row computed the full n_cells × dim distance
    array (and its sort) n_probe times. Staging the probed-id array in
    the CHILD project (evaluated once per input row — a Project below a
    Generate is per-input) and exploding a LITERAL index array (free to
    re-evaluate) restores one distance pass per query. `element_at` then
    picks the id; the size filter covers n_probe > n_cells, where slice
    would have emitted fewer rows. Output rows and values are identical
    to the direct form (same array, same order)."""
    staged = q.withColumn("_probed", F.slice(F.array_sort(cells), 1, n_probe)["cell"])
    return (
        staged.withColumn(
            "_pi", F.explode(F.array(*[F.lit(i + 1) for i in range(n_probe)]))
        )
        .filter(F.col("_pi") <= F.size("_probed"))
        .withColumn("cell", F.element_at("_probed", F.col("_pi")))
        .drop("_probed", "_pi")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    coarse: tuple[list[list[float]], DataFrame] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: MLlib KMeans as the coarse quantizer.

    Corpus vectors are assigned to their nearest centroid cell once (a scan +
    broadcast of tiny centroids); each query probes its `n_probe` nearest
    cells. The expensive pairwise cosine runs only within probed cells — an
    equi join on `cell`, the same shuffle shape as the LSH variant but with
    data-adaptive buckets (better recall on clustered corpora).

    At 100 TB: centroids train on a sample, assignment is a scan-side
    projection, and the per-cell join is the only shuffle. `coarse`
    injects a pre-fit (centroids, cells_df) — see fit_coarse_quantizer.
    """
    if coarse is None:
        coarse = fit_coarse_quantizer(emb, n_cells, id_col, vec_col, seed)
    centroids, cells_df = coarse
    c = emb.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv"))
    corpus = c.join(cells_df, "nid")

    def dist_to(center: list[float]) -> Column:
        arr = F.array(*[F.lit(x) for x in center])
        return F.aggregate(
            F.zip_with(F.col("qv"), arr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv"))
    cells = F.array(
        *[F.struct(dist_to(ctr).alias("d"), F.lit(i).alias("cell")) for i, ctr in enumerate(centroids)]
    )
    q_probed = _explode_probe_cells(q, cells, n_probe)
    scored = (
        F.broadcast(q_probed)
        .join(corpus, "cell")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_pandas(
    emb: DataFrame,
    queries_pd,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """NumPy/BLAS variant: queries broadcast as a dense matrix, corpus scanned
    in Arrow batches via mapInPandas — the shape you want when q is in the
    thousands and vectors are wide."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qids = queries_pd[id_col].to_numpy()
    qm = np.stack(queries_pd[vec_col].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("nid", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            nm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            nm /= np.linalg.norm(nm, axis=1, keepdims=True)
            sims = qm @ nm.T  # (q, batch)
            nids = pdf[id_col].to_numpy()
            out = {
                "qid": np.repeat(qids, len(nids)),
                "nid": np.tile(nids, len(qids)),
                "cosine_sim": sims.ravel(),
            }
            yield pd.DataFrame(out)

    scored = emb.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return (
        scored.filter(F.col("qid") != F.col("nid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory-footprint scale path: a 100 TB
# float32 embedding store becomes ~25 TB of int8 codes (plus two
# dim-sized parameter vectors), which is routinely the difference between
# an ANN index fitting executor memory or not (FAISS's SQ8 quantizer;
# Jegou et al. PAMI'11 product quantization is the next refinement).
# ---------------------------------------------------------------------------
def quantization_params(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension affine quantization grid (mins, scales) with
    code = round((x - min_d)/scale_d) - 128, scale_d = range_d/255.

    One posexplode → dim-keyed min/max aggregate; the collected result is
    DIM-sized (the quantizer model), which then folds into downstream
    plans as literals — the same "train small, apply as a scan" shape as
    the LSH planes and KMeans centroids. Constant dimensions get scale 1
    so they quantize to code -128 and dequantize exactly. (The min/max
    grid needs the FULL corpus — a sampled grid would clip the tails;
    clipping is saturated-safe post-round-5 but costs accuracy.)"""
    stats = (
        emb.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.min(F.col("x").cast("double")).alias("lo"),
             F.max(F.col("x").cast("double")).alias("hi"))
        .orderBy("d")
        .collect()
    )
    mins = [r["lo"] for r in stats]
    scales = [(r["hi"] - r["lo"]) / 255.0 if r["hi"] > r["lo"] else 1.0 for r in stats]
    return mins, scales


def quantize_embeddings(
    emb: DataFrame,
    mins: list[float],
    scales: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(nid, codes: array<tinyint>, dq_norm) — true 1-byte codes (the
    4x byte saving over float32 is only real if the stored element type
    is TINYINT, not int) plus the dequantized L2 norm, precomputed once
    here so pair scoring never recomputes norms (the hoisting rule from
    embedding_near_dup_pairs). Codes are saturated to [-128, 127] before
    the narrowing cast (FAISS SQ8 saturation): applying a persisted
    (mins, scales) grid to NEW vectors outside the trained min/max must
    clamp, not overflow."""
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    scales_arr = F.array(*[F.lit(float(s)) for s in scales])
    v = _as_double(F.col(vec_col))
    codes = F.zip_with(
        F.zip_with(v, mins_arr, lambda x, m: x - m),
        scales_arr,
        lambda x, s: F.greatest(
            F.lit(-128), F.least(F.lit(127), F.round(x / s).cast("int") - 128)
        ).cast("tinyint"),
    )
    staged = emb.select(F.col(id_col).alias("nid"), codes.alias("codes"))
    dq = F.zip_with(
        F.zip_with(
            F.col("codes"), scales_arr, lambda c, s: (c + 128).cast("double") * s
        ),
        mins_arr,
        lambda x, m: x + m,
    )
    return staged.select("nid", "codes", l2_norm(dq).alias("dq_norm"))


def int8_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    params: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Asymmetric top-k over the quantized corpus: queries stay float,
    neighbors are int8 codes — FAISS's asymmetric distance computation,
    which loses half as much precision as quantizing both sides.

    dot(q, x̂) decomposes as Σ (q_d·scale_d)·code_d + Σ q_d·(min_d +
    128·scale_d): the query side pre-scales ONCE (it is broadcast-small),
    so the per-pair work is a single codegen'd-shape zip_with over int
    codes — identical cost to the float baseline but reading a quarter
    of the bytes. Exact within quantization error; recall vs the exact
    baseline is pinned by test. ``params``: a persisted (mins, scales)
    grid (functions/ann_io.load_sq8_grid) — serve from the artifact
    instead of retraining."""
    mins, scales = params if params is not None else quantization_params(emb, vec_col)
    corpus = quantize_embeddings(emb, mins, scales, id_col, vec_col)
    scales_arr = F.array(*[F.lit(float(s)) for s in scales])
    offs_arr = F.array(
        *[F.lit(float(m + 128.0 * s)) for m, s in zip(mins, scales)]
    )
    qv = _as_double(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.zip_with(qv, scales_arr, lambda x, s: x * s).alias("qs"),
        dot(qv, offs_arr).alias("qbias"),
        l2_norm(qv).alias("qnorm"),
    )
    sim = (
        (dot(F.col("qs"), F.transform(F.col("codes"), lambda c: c.cast("double")))
         + F.col("qbias"))
        / (F.col("qnorm") * F.col("dq_norm"))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(sim, 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_int8_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    coarse: tuple[list[list[float]], DataFrame] | None = None,
) -> DataFrame:
    """The full coarse+fine ANN stack: IVF cell pruning (KMeans coarse
    quantizer) over an int8-quantized corpus with asymmetric fine
    scoring — FAISS's IVF,SQ8 index as DataFrame ops. The probed-cell
    equi join bounds how many pairs are scored; the int8 codes bound the
    bytes each scored pair reads. Both approximations compose: recall vs
    the exact baseline is pinned by test. `coarse` injects a pre-fit
    (centroids, cells_df) — see fit_coarse_quantizer."""
    if coarse is None:
        coarse = fit_coarse_quantizer(emb, n_cells, id_col, vec_col, seed)
    centroids, cells_df = coarse

    mins, scales = quantization_params(emb, vec_col)
    corpus = quantize_embeddings(emb, mins, scales, id_col, vec_col).join(
        cells_df, "nid"
    )

    def dist_to(center: list[float]) -> Column:
        arr = F.array(*[F.lit(x) for x in center])
        return F.aggregate(
            F.zip_with(F.col("qv"), arr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    scales_arr = F.array(*[F.lit(float(s)) for s in scales])
    offs_arr = F.array(
        *[F.lit(float(m + 128.0 * s)) for m, s in zip(mins, scales)]
    )
    qv = _as_double(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("qid"),
        qv.alias("qv"),
        F.zip_with(qv, scales_arr, lambda x, s: x * s).alias("qs"),
        dot(qv, offs_arr).alias("qbias"),
        l2_norm(qv).alias("qnorm"),
    )
    cells = F.array(
        *[
            F.struct(dist_to(ctr).alias("d"), F.lit(i).alias("cell"))
            for i, ctr in enumerate(centroids)
        ]
    )
    q_probed = _explode_probe_cells(q, cells, n_probe).drop("qv")
    sim = (
        (dot(F.col("qs"), F.transform(F.col("codes"), lambda c_: c_.cast("double")))
         + F.col("qbias"))
        / (F.col("qnorm") * F.col("dq_norm"))
    )
    scored = (
        F.broadcast(q_probed)
        .join(corpus, "cell")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(sim, 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid, "Product Quantization for
# Nearest Neighbor Search", PAMI 2011) — the refinement past SQ8: the
# vector is split into M sub-vectors, each quantized to one of Ks
# per-sub-space KMeans centroids, so a D-dim float32 vector stores as M
# CODE BYTES (Ks <= 256) instead of 4*D — 32x for D=64, M=8 (SQ8 is 4x).
# Scoring is FAISS's asymmetric distance computation (ADC): per query,
# one M*Ks lookup table of query-subvector x centroid dot products is
# precomputed on the (broadcast-small) query side; each corpus pair then
# costs M table lookups over the code bytes — no float vector is read.
# An exact re-rank stage fetches full vectors for only the top
# rerank*k ADC candidates per query (FAISS's refine/RFlat pattern),
# which restores recall to the exact baseline while still scanning only
# codes corpus-wide.
# ---------------------------------------------------------------------------
def pq_train(
    emb: DataFrame,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Per-sub-space codebooks: codebooks[s][j] = centroid j of sub-space
    s (a list of D/M floats). M small KMeans fits; the collected model is
    M*Ks*(D/M) = Ks*D floats — model-sized, folded into downstream plans
    as literals (the planes/centroids/SQ8-grid pattern). Codebooks are
    DISTRIBUTIONAL, so at corpus scale train on a sample — pass
    `sampling.hash_sample(emb, id_col, 0.01)` (FAISS trains its
    quantizers the same way); encoding still scans everything.

    Under the _LOCAL_FIT_CELLS gate the vectors collect ONCE
    (canonically ordered) and all M sub-space fits run as driver-local
    seeded Lloyd's — an MLlib fit is ~20 scheduled jobs of latency and
    this function runs M of them; above the gate, the concurrent
    distributed fits below."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from concurrent.futures import ThreadPoolExecutor

    dim = len(emb.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    X = _local_fit_sample(
        emb, vec_col, max(_LOCAL_FIT_CELLS // dim, ks)
    )
    if X is not None:
        return [
            _kmeans_local(X[:, s * sub : (s + 1) * sub], ks, seed + s)
            for s in range(m)
        ]
    v = emb.select(_as_double(F.col(vec_col)).alias("nv")).localCheckpoint(
        eager=True  # M concurrent consumers; slice, don't re-project
    )

    def fit_one(s: int) -> list[list[float]]:
        sliced = v.select(
            array_to_vector(F.slice(F.col("nv"), s * sub + 1, sub)).alias("fv")
        )
        km = KMeans(k=ks, seed=seed + s, featuresCol="fv", predictionCol="c")
        return [list(map(float, c)) for c in km.fit(sliced).clusterCenters()]

    # the M sub-space fits are independent — submit them as concurrent
    # Spark jobs (job submission is thread-safe; each fit is seeded, so
    # results are deterministic and order is fixed by index). Serially
    # this loop was the wall-clock of every PQ build.
    with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
        return list(pool.map(fit_one, range(m)))


def _pq_flat_lits(codebooks: list[list[list[float]]], fn) -> Column:
    """Flat array literal of fn(centroid) over (sub-space, centroid) in
    row-major order: entry s*Ks + j."""
    return F.array(
        *[F.lit(float(fn(c))) for book in codebooks for c in book]
    )


def _sqnorm(vec: list[float]) -> float:
    return sum(x * x for x in vec)


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """(nid, codes: array<tinyint> of length M, dq_norm) — each code is
    the argmin-distance centroid of its sub-space (ties by centroid id),
    dq_norm = |reconstruction| = sqrt(sum of chosen-centroid squared
    norms) — precomputed once here so ADC scoring never touches float
    vectors (the norm-hoisting rule).

    Two BIT-IDENTICAL implementations (parity pinned by
    tests/test_pq_ann.py::test_arrow_chain_encode_parity):

    - ``impl="arrow"`` (default): one Arrow-batched ``mapInPandas``
      kernel. NumPy replays the chain's exact IEEE accumulation order
      (elementwise term products, left-to-right adds over the sub-dim,
      ``argmin`` = first minimum = lowest centroid id), so codes and
      norms match the chain bit-for-bit. The plan is ONE node — the
      chain form's ~3k-node expression tree costs ~6.7 s of Catalyst
      ANALYSIS per query at m=8, ks=16 (a fixed cost repeated per
      query, the dominant term of a PQ build at bench SF — SCALE.md
      ann_pq anatomy), which this path removes entirely. The Python
      crossing is a deliberate trade: the encode is a one-time build
      pass per corpus, the kernel is vectorized C over Arrow batches
      (no per-row Python), and peak memory is bounded per sub-space at
      batch_rows × Ks × sub doubles.

    - ``impl="chain"``: pure-JVM chained scalar multiply-adds over
      unpacked vector elements (no HOF lambdas — those are interpreted
      per element, CLAUDE.md) in the EXPANDED form d'_j = Σ_t
      x_t·(−2c_jt) + |c_j|², not (x−c)²: argmin is invariant to the
      per-row constant |x_s|², constants fold at plan time, and the
      chain is ~half the Catalyst nodes of the squared-difference form
      (analysis 14.8 s → 6.7 s, codes identical). Use where a pipeline
      must stay inside whole-stage codegen end-to-end (no Arrow
      serialization of the float vectors)."""
    if impl == "arrow":
        return _pq_encode_arrow(emb, codebooks, id_col, vec_col)
    m = len(codebooks)
    ks = len(codebooks[0])
    sub = len(codebooks[0][0])
    dim = m * sub
    staged = emb.select(
        F.col(id_col).alias("nid"),
        *[
            F.element_at(F.col(vec_col), i + 1).cast("double").alias(f"e{i}")
            for i in range(dim)
        ],
    )

    def code_for(s: int) -> Column:
        cands = []
        for j in range(ks):
            d = None
            for t, c in enumerate(codebooks[s][j]):
                term = F.col(f"e{s * sub + t}") * F.lit(-2.0 * c)
                d = term if d is None else d + term
            d = d + F.lit(_sqnorm(codebooks[s][j]))
            cands.append(F.struct(d.alias("d"), F.lit(j).alias("j")))
        return F.array_sort(F.array(*cands))[0]["j"].cast("tinyint")

    coded = staged.select(
        "nid", F.array(*[code_for(s) for s in range(m)]).alias("codes")
    )
    n2 = _pq_flat_lits(codebooks, _sqnorm)
    dq2 = None
    for s in range(m):
        term = F.element_at(
            n2, F.lit(s * ks + 1) + F.element_at(F.col("codes"), s + 1).cast("int")
        )
        dq2 = (F.lit(0.0) + term) if dq2 is None else (dq2 + term)
    return coded.select("nid", "codes", F.sqrt(dq2).alias("dq_norm"))


def _pq_encode_arrow(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched PQ encode (see :func:`pq_encode` ``impl="arrow"``).

    Bit-exactness contract with the chain form, term by term:
    - weights are the SAME Python-folded doubles ``-2.0 * c`` the chain
      embeds as literals;
    - per (row, centroid) the products x_t·w_t are elementwise IEEE
      doubles accumulated LEFT TO RIGHT over t (a Python loop over the
      sub-dim — never ``np.sum``, whose pairwise blocking changes the
      rounding), then ``+ |c_j|²`` last, exactly the chain's order;
    - ``argmin`` returns the FIRST minimum = lowest centroid id, the
      chain's (d, j) struct-sort tie-break;
    - dq_norm accumulates ``0.0 + n2[code_0] + n2[code_1] + …`` in
      sub-space order, then ``sqrt`` (correctly rounded in both IEEE
      and JVM), matching the chain's lookup chain."""
    import numpy as np

    m = len(codebooks)
    ks = len(codebooks[0])
    sub = len(codebooks[0][0])
    # (m, ks, sub) folded weights and (m, ks) squared norms — model-sized
    # closure state shipped once per task with the serialized function
    W = np.array(
        [[[-2.0 * c for c in cent] for cent in book] for book in codebooks],
        dtype=np.float64,
    )
    B = np.array(
        [[_sqnorm(cent) for cent in book] for book in codebooks],
        dtype=np.float64,
    )

    out_schema = (
        f"nid {emb.schema[id_col].dataType.simpleString()}, "
        "codes array<tinyint>, dq_norm double"
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            codes = np.empty((n, m), dtype=np.int64)
            dq2 = np.zeros(n, dtype=np.float64)  # the chain's leading 0.0
            for s in range(m):
                terms = X[:, s * sub : (s + 1) * sub][:, None, :] * W[s][None]
                acc = terms[:, :, 0].copy()
                for t in range(1, sub):
                    acc += terms[:, :, t]
                acc += B[s][None]
                codes[:, s] = acc.argmin(axis=1)
                dq2 = dq2 + B[s][codes[:, s]]
            codes8 = codes.astype(np.int8)
            yield pd.DataFrame(
                {
                    "nid": pdf["nid"],
                    "codes": list(codes8),
                    "dq_norm": np.sqrt(dq2),
                }
            )

    src = emb.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("v")
    )
    return src.mapInPandas(encode, out_schema)


def _pq_query_side(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    centroids: list[list[float]] | None = None,
    n_probe: int | None = None,
    by_residual: bool = False,
) -> DataFrame:
    """Query-side PQ prep in ONE Arrow kernel: (qid, qv, qnorm, lut[,
    cell, qcbias]) — lut[s*Ks+j] = dot(q_sub_s, centroid_sj), cell the
    exploded top-n_probe coarse cells, qcbias the per-probed-cell
    dot(q, c(cell)) the residual ADC needs.

    Exists for DRIVER-side plan-construction cost, not executor speed:
    the HOF form built m*ks `aggregate(zip_with(...))` columns — ~700
    py4j lambda round-trips ≈ 5 s of plan building PER QUERY CALL at
    m=8, ks=16 (the whole serve-path wall at bench SF; the query frame
    itself is a handful of rows). NumPy replays the fold order of the
    HOFs it replaces (leading 0.0, left-to-right adds, stable
    (d, cell) probe order) so values are bit-identical."""
    import numpy as np

    m = len(codebooks)
    ks = len(codebooks[0])
    sub = len(codebooks[0][0])
    B = np.array(codebooks, dtype=np.float64)  # (m, ks, sub)
    C = (
        np.array([[float(x) for x in ctr] for ctr in centroids], np.float64)
        if centroids is not None
        else None
    )

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    src = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    fields = [
        src.schema["qid"],
        StructField("qv", ArrayType(DoubleType())),
        StructField("qnorm", DoubleType()),
        StructField("lut", ArrayType(DoubleType())),
    ]
    if C is not None:
        fields.append(StructField("cell", IntegerType()))
        if by_residual:
            fields.append(StructField("qcbias", DoubleType()))
    out_schema = StructType(fields)

    def prep(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.stack(pdf["qv"].to_numpy()).astype(np.float64, copy=False)
            dim = X.shape[1]
            lut = np.empty((n, m * ks), np.float64)
            for s in range(m):
                prod = X[:, s * sub : (s + 1) * sub][:, None, :] * B[s][None]
                acc = np.zeros((n, ks), np.float64)
                for t in range(sub):
                    acc = acc + prod[:, :, t]
                lut[:, s * ks : (s + 1) * ks] = acc
            qn = np.zeros(n, np.float64)
            for t in range(dim):
                qn = qn + X[:, t] * X[:, t]
            qn = np.sqrt(qn)
            out = pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "qv": list(X),
                    "qnorm": qn,
                    "lut": list(lut),
                }
            )
            if C is None:
                yield out
                continue
            n_cells = C.shape[0]
            D = np.zeros((n, n_cells), np.float64)
            for t in range(dim):
                diff = X[:, t][:, None] - C[:, t][None]
                D = D + diff * diff
            cell_ids = np.arange(n_cells)
            probes = np.empty((n, n_probe), np.int64)
            for i in range(n):
                order = np.lexsort((cell_ids, D[i]))  # (d, cell) asc
                probes[i] = order[:n_probe]
            rep = out.loc[out.index.repeat(n_probe)].reset_index(drop=True)
            rep["cell"] = probes.reshape(-1).astype(np.int32)
            if by_residual:
                bias = np.zeros((n, n_cells), np.float64)
                for t in range(dim):
                    bias = bias + X[:, t][:, None] * C[:, t][None]
                rep["qcbias"] = bias[
                    np.repeat(np.arange(n), n_probe), probes.reshape(-1)
                ]
            yield rep

    return src.mapInPandas(prep, out_schema)


def _adc_sum(m: int, ks: int) -> Column:
    """Chained-scalar ADC lookup sum over the code bytes: Σ_s
    lut[s*Ks + code_s] — same left-fold order as the aggregate() form it
    replaces (HOFs are interpreted; this chain codegens), reading `codes`
    and `lut` columns."""
    tot = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"),
            F.lit(s * ks + 1) + F.element_at(F.col("codes"), s + 1).cast("int"),
        )
        tot = (F.lit(0.0) + term) if tot is None else tot + term
    return tot

def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC top-k with exact re-ranking.

    Stage 1 (codes only): every (query, corpus) pair scores as M lookups
    into the query's broadcast M*Ks dot-product table — the corpus scan
    reads M bytes per vector. Stage 2 (floats, candidates only): the top
    rerank*k ADC candidates per query join back to the float vectors for
    exact cosine; with rerank*k candidates the output recall dominates
    any single-stage quantized scorer (pinned >= the SQ8 path by test).
    At 100 TB the candidate join touches q*rerank*k rows — negligible
    against the code scan, which is 32x smaller than the float scan.
    ``codebooks``: persisted codebooks (functions/ann_io) — serve from
    the artifact instead of retraining (m and ks are then read from the
    codebook shape). ``codes``: the persisted encoded corpus
    (a (nid, codes, dq_norm) frame as written by :func:`pq_encode`) —
    the full SERVE path then never trains nor encodes: the code table
    scans, the float store is touched only for the rerank*k candidates
    per query."""
    if codebooks is None:
        codebooks = pq_train(emb, m=m, ks=ks, vec_col=vec_col, seed=seed)
    m, ks = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    corpus = (
        codes.select("nid", "codes", "dq_norm")
        if codes is not None
        else pq_encode(emb, codebooks, id_col, vec_col)
    )

    # (qid, qv, qnorm, lut) in one Arrow kernel — the HOF form cost ~5 s
    # of driver-side plan construction per call (see _pq_query_side)
    q = _pq_query_side(queries, codebooks, id_col, vec_col)
    adc = _adc_sum(len(codebooks), ks) / (F.col("qnorm") * F.col("dq_norm"))
    w = Window.partitionBy("qid").orderBy(F.desc("adc_sim"), F.asc("nid"))
    cands = (
        F.broadcast(q)
        .crossJoin(corpus)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "qv", "qnorm", "nid", adc.alias("adc_sim"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rerank * k)
    )
    exact = cands.join(
        emb.select(
            F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv")
        ),
        "nid",
    ).select(
        "qid",
        "nid",
        F.round(
            dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * l2_norm(F.col("nv"))),
            6,
        ).alias("cosine_sim"),
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    m: int = 8,
    ks: int = 16,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    by_residual: bool = False,
    coarse: tuple[list[list[float]], DataFrame] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF,PQ: coarse KMeans cell pruning composed with PQ-ADC fine
    scoring and exact re-rank — the full FAISS index family ported to
    DataFrame ops. Cells bound how many pairs score; codes bound the
    bytes per scored pair; the re-rank bounds recall loss. Three
    compositions, one equi join + one candidate join.

    ``by_residual=True`` is FAISS's default IVF,PQ encoding: the PQ
    codebooks quantize the RESIDUAL x − c(cell) instead of x itself.
    Residuals have much less variance than raw vectors (the coarse
    quantizer already explains the cell-level structure), so the same
    code budget reconstructs tighter — mean reconstruction error
    <= the non-residual form at equal (m, ks), pinned by test. The
    extra cost is per-cell lookup tables: reconstruction norms become
    (cell, sub-space, code)-indexed literals (n_cells*m*ks floats —
    still model-sized) and each probed (query, cell) pair adds one
    query·centroid dot product on the broadcast side.

    `coarse` injects a pre-fit (centroids, cells_df) and `codebooks`
    pre-trained raw-vector PQ books (non-residual only: residual books
    are a function of the cells, so they always train here) — the
    build-once / serve-many split fit_coarse_quantizer documents."""
    from concurrent.futures import ThreadPoolExecutor

    if by_residual and codebooks is not None:
        raise ValueError(
            "residual codebooks are cell-dependent; inject `coarse`, "
            "not `codebooks`, for by_residual=True"
        )
    c = emb.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv"))
    if coarse is None and not (by_residual or codebooks is not None):
        # coarse quantizer and PQ codebooks train on independent views —
        # run both fits as concurrent Spark jobs (thread-safe submission,
        # both seeded, results deterministic)
        with ThreadPoolExecutor(max_workers=2) as pool:
            coarse_f = pool.submit(
                fit_coarse_quantizer, emb, n_cells, id_col, vec_col, seed
            )
            books_f = pool.submit(pq_train, emb, m, ks, vec_col, seed)
            coarse = coarse_f.result()
            codebooks = books_f.result()
    if coarse is None:
        coarse = fit_coarse_quantizer(emb, n_cells, id_col, vec_col, seed)
    if not by_residual and codebooks is None:
        codebooks = pq_train(emb, m, ks, vec_col, seed)
    centroids, cells_df = coarse

    if by_residual:
        cents_lit = F.lit([[float(x) for x in ctr] for ctr in centroids])
        # the residual frame feeds BOTH codebook training and encoding —
        # materialize it once instead of re-running the join + zip_with
        res = c.join(cells_df, "nid").select(
            "nid",
            F.zip_with(
                F.col("nv"),
                F.element_at(cents_lit, F.col("cell") + 1),
                lambda x, y: x - y,
            ).alias("embedding"),
        ).localCheckpoint()
        codebooks = pq_train(res, m=m, ks=ks, vec_col="embedding", seed=seed)
        sub = len(codebooks[0][0])
        # codes quantize residuals; the reconstruction is
        # c(cell) + r̂, so its norm is (cell, sub-space, code)-indexed:
        # |x̂|² = Σ_m |c_m + r̂_{m,code_m}|², precomputed as literals
        norms_per_cell = F.lit(
            [
                [
                    _sqnorm(
                        [
                            cv + rv
                            for cv, rv in zip(
                                ctr[s * sub : (s + 1) * sub], codebooks[s][j]
                            )
                        ]
                    )
                    for s in range(m)
                    for j in range(ks)
                ]
                for ctr in centroids
            ]
        )
        coded = (
            pq_encode(res, codebooks, "nid", "embedding")
            .drop("dq_norm")
            .join(cells_df, "nid")
        )
        # bind the per-cell norm table as an ATTRIBUTE column before the
        # lookups: element_at on a LITERAL array copies the whole array
        # per access (CLAUDE.md), and the old zip_with/aggregate form
        # evaluated the nested-literal extract inside an interpreted
        # lambda — m copies of an n_cells*m*ks-double literal per row.
        # The m references below keep CollapseProject from re-inlining
        # the alias; the chained-scalar sum codegens (the _adc_sum shape)
        with_lut = coded.withColumn(
            "lut", F.element_at(norms_per_cell, F.col("cell") + 1)
        )
        corpus = with_lut.withColumn(
            "dq_norm", F.sqrt(_adc_sum(m, ks))
        ).drop("lut")
    else:
        sub = len(codebooks[0][0])
        corpus = pq_encode(emb, codebooks, id_col, vec_col).join(cells_df, "nid")

    # (qid, qv, qnorm, lut, cell[, qcbias]) in one Arrow kernel over the
    # tiny query frame — the HOF form (m*ks LUT dots + n_cells probe
    # distances + per-cell residual bias) cost seconds of driver-side
    # plan construction per call (see _pq_query_side); qcbias carries
    # dot(q, c(cell)) so ADC adds it for dot(q, x̂) = dot(q, c) + Σ r̂
    q = _pq_query_side(
        queries, codebooks, id_col, vec_col,
        centroids=centroids, n_probe=n_probe, by_residual=by_residual,
    )
    adc_dot = _adc_sum(m, ks)
    if by_residual:
        adc_dot = adc_dot + F.col("qcbias")
    adc = adc_dot / (F.col("qnorm") * F.col("dq_norm"))
    w = Window.partitionBy("qid").orderBy(F.desc("adc_sim"), F.asc("nid"))
    cands = (
        F.broadcast(q)
        .join(corpus, "cell")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "qv", "qnorm", "nid", adc.alias("adc_sim"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rerank * k)
    )
    exact = cands.join(
        emb.select(
            F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv")
        ),
        "nid",
    ).select(
        "qid",
        "nid",
        F.round(
            dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * l2_norm(F.col("nv"))),
            6,
        ).alias("cosine_sim"),
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("nid"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    q_col: str = "qid",
    doc_col: str = "nid",
    rel_col: str = "relevance",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking of per-query candidate lists
    (Carbonell & Goldstein, SIGIR 1998) — the standard post-retrieval
    diversification step: greedily pick the candidate maximizing

        lam * relevance(d)  -  (1 - lam) * max_{s in selected} cos(d, s)

    so near-duplicate hits are demoted in favor of novel ones. lam=1 is
    plain relevance order; lam=0 is pure diversity.

    Input: (q_col, doc_col, rel_col, vec_col) — a retriever's top-k table
    (e.g. `brute_force_topk` output joined back to its vectors, or a
    `corpus.rrf_fuse` result). Output: (q, doc, relevance, novelty_penalty,
    mmr_rank) with novelty_penalty = the max cosine to previously selected
    docs at pick time (0.0 for the first pick).

    The greedy loop is inherently sequential PER QUERY but each group is a
    candidate list (tens of rows, corpus-independent), so this runs as one
    `applyInPandas` over query groups — an Arrow-batched crossing sized by
    |queries| x k, never the corpus; ties break by doc id. At 100 TB the
    cost lives entirely in the upstream retriever.
    """
    import numpy as np

    out_fields = []
    for f in candidates.schema.fields:
        if f.name in (q_col, doc_col, rel_col):
            out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    schema = (
        ", ".join(out_fields)
        + ", novelty_penalty double, mmr_rank int"
    )

    def _mmr(pdf):
        pdf = pdf.sort_values(doc_col, kind="mergesort").reset_index(drop=True)
        v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0.0] = 1.0
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        penalties: list[float] = []
        remaining = list(range(n))
        while remaining and len(selected) < k:
            best, best_score, best_pen = None, None, 0.0
            for i in remaining:
                if selected:
                    sims = (v[selected] @ v[i]) / (norms[selected] * norms[i])
                    pen = float(np.max(sims))
                else:
                    pen = 0.0
                score = lam * float(rel[i]) - (1.0 - lam) * pen
                # strict > keeps the lowest doc id on ties (remaining is
                # doc-id-ordered)
                if best is None or score > best_score:
                    best, best_score, best_pen = i, score, pen
            selected.append(best)
            penalties.append(best_pen)
            remaining.remove(best)
        out = pdf.iloc[selected][[q_col, doc_col, rel_col]].copy()
        out["novelty_penalty"] = [round(p, 6) for p in penalties]
        out["mmr_rank"] = range(1, len(selected) + 1)
        return out

    return candidates.groupBy(q_col).applyInPandas(_mmr, schema)


def _pca_sign_fix(components):
    """Deterministic eigenvector orientation: each component's
    largest-|w| element is positive (ties -> lowest index). eigh returns
    an arbitrary sign per vector; without a convention, two equally
    correct fits produce different codes downstream."""
    import numpy as np

    out = []
    for w in components:
        w = np.asarray(w, dtype=np.float64)
        j = int(np.argmax(np.abs(w)))
        out.append((-w if w[j] < 0 else w).tolist())
    return out


def pca_fit(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    local_cells: int | None = None,
    fit_on: DataFrame | None = None,
) -> tuple[list[float], list[list[float]]]:
    """PCA for embedding columns — the FAISS pre-transform (PCAR) that
    makes high-dimensional ANN affordable: project d-dim vectors onto the
    top-k principal directions before SQ8/PQ coding, trading a measured
    recall haircut for a k/d scan-cost factor.

    Returns (mean, components) with components a k×d row matrix, ready
    for :func:`pca_project` and the functions/ann_io artifact.

    Under the `_LOCAL_FIT_CELLS` gate: the canonical-order float64 sample
    collects once through Arrow and NumPy eigh solves the d×d covariance
    (model-sized by construction — the FAISS training topology; pass
    `fit_on` a hash_sample to stay under the gate on a big corpus).
    Above it: ONE distributed pass of d + d(d+1)/2 fixed-point LONG sum
    aggregates (map-side combinable, order-insensitive exact integers —
    bit-deterministic on any partitioning, the decimal-sum rule executed
    as primitive longs; see the in-body note for the quantization and
    overflow bounds), then the same driver-side eigh on the assembled
    d×d matrix. The distributed path is guarded to d <= 128 (d² aggregate
    columns); beyond that, sample via `fit_on`.
    Either way the eigendecomposition is driver-side on a model-sized
    matrix, and components are sign-fixed (largest-|w| element positive)
    so the model is unique.
    """
    import numpy as np

    train = emb if fit_on is None else fit_on
    c = train.select(_as_double(F.col(vec_col)).alias("nv"))
    probe = c.first()
    if probe is None:
        raise ValueError("pca_fit: training input has no rows")
    dim = len(probe[0])
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    if local_cells is None:
        local_cells = _LOCAL_FIT_CELLS
    X = _local_fit_sample(c, "nv", max(local_cells // dim, k))
    if X is not None:
        mean = X.mean(axis=0)
        Xc = X - mean
        cov = (Xc.T @ Xc) / len(X)
    else:
        if dim > 128:
            raise ValueError(
                f"distributed pca_fit is bounded to dim <= 128 "
                f"(d^2 aggregate columns); got dim={dim} — pass fit_on= a "
                f"hash_sample under the local gate instead"
            )
        # Arrow partial-stats kernel with order-insensitive EXACT sums:
        # per Arrow batch, every per-row term x_i and x_i*x_j quantizes to
        # fixed-point int64 (floor(x*2^30 + 0.5), vectorized) and the
        # batch emits its int64 partial sums; the driver combines the
        # batch partials in Python big-ints — integer addition commutes,
        # so the fitted model is BIT-IDENTICAL on any partitioning (the
        # decimal-sum rule executed as integers). Quantization moves
        # covariance entries by <= 2^-31 absolute — far below eigh's
        # working precision. Two rejected forms, both measured: a
        # DECIMAL(38,18) d²-column aggregate (224 s / 1M rows, heap-bound
        # — BigDecimal per row per term) and a fixed-point-LONG d²-column
        # aggregate (the 2145-wide codegen'd buffer OOMs the default heap
        # at 32 concurrent tasks). The kernel is one Arrow crossing,
        # O(d²) ints per BATCH — measured 12 s / 1M rows and 24 s / 10M
        # rows x 64 dims on local[32] under the DEFAULT heap (synthetic-
        # corpus generation included; the marginal fit cost is linear).
        iu = np.triu_indices(dim)
        scale = float(1 << 30)

        def _partials(it):
            import pandas as pd

            for pdf in it:
                X = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["nv"]]
                )
                sq = np.floor(X * scale + 0.5).astype(np.int64).sum(axis=0)
                P = np.zeros(len(iu[0]), dtype=np.int64)
                for b in range(0, len(X), 512):  # bound block mem at ~8 MB
                    blk = X[b : b + 512]
                    prod = blk[:, iu[0]] * blk[:, iu[1]]
                    P += (
                        np.floor(prod * scale + 0.5)
                        .astype(np.int64)
                        .sum(axis=0)
                    )
                yield pd.DataFrame(
                    {
                        "n": [len(X)],
                        "s": [sq.tolist()],
                        "p": [P.tolist()],
                    }
                )

        parts = c.mapInPandas(
            _partials, "n long, s array<long>, p array<long>"
        ).collect()
        n = sum(r["n"] for r in parts)
        s_int = [sum(int(r["s"][i]) for r in parts) for i in range(dim)]
        p_int = [
            sum(int(r["p"][t]) for r in parts) for t in range(len(iu[0]))
        ]
        s = np.array([v / scale for v in s_int])
        S = np.zeros((dim, dim))
        for t, (i, j) in enumerate(zip(iu[0], iu[1])):
            S[i, j] = S[j, i] = p_int[t] / scale
        mean = s / n
        cov = S / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    components = _pca_sign_fix(vecs[:, order].T)
    return [float(m) for m in mean], components


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto a fitted PCA basis as a pure scalar chain:
    out_j = Σ_i x_i·w_ji − b_j with the bias b_j = Σ_i mean_i·w_ji FOLDED
    to one literal per output dim (the constant-folding rule from the PQ
    encode chain). d×k literal multiply-adds, codegen'd, no Python, no
    shuffle — a scan-side projection whatever the corpus size."""
    d = len(mean)
    exprs = []
    for w in components:
        if len(w) != d:
            raise ValueError("component length != mean length")
        bias = sum(m * wi for m, wi in zip(mean, w))
        term = F.col(vec_col)[0] * float(w[0])
        for i in range(1, d):
            term = term + F.col(vec_col)[i] * float(w[i])
        exprs.append(term - F.lit(float(bias)))
    return df.withColumn(out_col, F.array(*exprs))
