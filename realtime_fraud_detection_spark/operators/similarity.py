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
    """
    c = emb.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv"))
    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(cosine(F.col("qv"), F.col("nv")), round_digits).alias("cosine_sim"),
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
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    Recall depends on n_planes; the equi join on `bucket` replaces the cross
    join, so cost is per-bucket not corpus-wide.
    """
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


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: MLlib KMeans as the coarse quantizer.

    Corpus vectors are assigned to their nearest centroid cell once (a scan +
    broadcast of tiny centroids); each query probes its `n_probe` nearest
    cells. The expensive pairwise cosine runs only within probed cells — an
    equi join on `cell`, the same shuffle shape as the LSH variant but with
    data-adaptive buckets (better recall on clustered corpora).

    At 100 TB: centroids train on a sample, assignment is a scan-side
    projection, and the per-cell join is the only shuffle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = emb.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv"))
    with_vec = c.withColumn("fv", array_to_vector(F.col("nv")))
    km = KMeans(k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell")
    model = km.fit(with_vec)
    corpus = model.transform(with_vec).select("nid", "nv", "cell")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]

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
    q_probed = q.withColumn(
        "cell", F.explode(F.slice(F.array_sort(cells), 1, n_probe)["cell"])
    )
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
    so they quantize to code -128 and dequantize exactly."""
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
    """(nid, codes, dq_norm) — int8 codes plus the dequantized L2 norm,
    precomputed once here so pair scoring never recomputes norms (the
    hoisting rule from embedding_near_dup_pairs)."""
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    scales_arr = F.array(*[F.lit(float(s)) for s in scales])
    v = _as_double(F.col(vec_col))
    codes = F.zip_with(
        F.zip_with(v, mins_arr, lambda x, m: x - m),
        scales_arr,
        lambda x, s: F.round(x / s).cast("int") - 128,
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
) -> DataFrame:
    """Asymmetric top-k over the quantized corpus: queries stay float,
    neighbors are int8 codes — FAISS's asymmetric distance computation,
    which loses half as much precision as quantizing both sides.

    dot(q, x̂) decomposes as Σ (q_d·scale_d)·code_d + Σ q_d·(min_d +
    128·scale_d): the query side pre-scales ONCE (it is broadcast-small),
    so the per-pair work is a single codegen'd-shape zip_with over int
    codes — identical cost to the float baseline but reading a quarter
    of the bytes. Exact within quantization error; recall vs the exact
    baseline is pinned by test."""
    mins, scales = quantization_params(emb, vec_col)
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
) -> DataFrame:
    """The full coarse+fine ANN stack: IVF cell pruning (KMeans coarse
    quantizer) over an int8-quantized corpus with asymmetric fine
    scoring — FAISS's IVF,SQ8 index as DataFrame ops. The probed-cell
    equi join bounds how many pairs are scored; the int8 codes bound the
    bytes each scored pair reads. Both approximations compose: recall vs
    the exact baseline is pinned by test."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = emb.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv"))
    with_vec = c.withColumn("fv", array_to_vector(F.col("nv")))
    km = KMeans(k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell")
    model = km.fit(with_vec)
    cells_df = model.transform(with_vec).select("nid", "cell")

    mins, scales = quantization_params(emb, vec_col)
    corpus = quantize_embeddings(emb, mins, scales, id_col, vec_col).join(
        cells_df, "nid"
    )

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]

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
    q_probed = q.withColumn(
        "cell", F.explode(F.slice(F.array_sort(cells), 1, n_probe)["cell"])
    ).drop("qv")
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
