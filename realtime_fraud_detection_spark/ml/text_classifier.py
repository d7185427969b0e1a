"""fastText-style hashed n-gram linear classifier, trained IN Spark.

The staple model of LLM data pipelines (quality classifiers a la
DCLM / FineWeb-Edu, language-ID a la fastText lid.176): a bag of hashed
word uni+bigrams averaged into a fixed-width feature space, pushed through
a logistic regression. The reference repo has no trainable text model (its
"BERT analyzer" degrades to rule features, SURVEY §2.8 M7) — this is the
beyond-reference operator that makes the engine able to TRAIN the filters
it applies, not just evaluate hand-written ones.

Spark-first shape (no MLlib, no Python in the distributed path):

* Feature extraction is explode → md5-hash → hash-aggregate — identical
  machinery to the dedup family, fully codegen'd, one shuffle keyed by
  (doc, bucket).
* Training is batch gradient descent with the features held as ONE
  array<struct<bucket,x>> row per doc and the weights shipped as a dense
  array LITERAL (a single Literal node — parameter-sized, same payload a
  broadcast would carry). Margins are then a map-side `aggregate()` over
  the array — ZERO shuffle — and the per-doc error is computed inline in
  the same project, so each iteration is exactly ONE shuffle: the
  bucket-keyed gradient sum (explode → groupBy bucket). The driver only
  ever holds the MODEL (≤ n_buckets floats); this is the same
  broadcast-weights / treeAggregate-gradients topology MLlib's own
  LogisticRegression uses, minus MLlib's per-iteration doc-side shuffle.
* Multiclass one-vs-rest trains ALL K heads in the same pass: the error
  project carries K err columns and the gradient aggregate K sum columns,
  so K heads cost one shuffle per iteration total, not per head.
* Determinism: the per-doc margin is a sequential double fold over the
  CANONICALLY SORTED feature array — a fixed summation order, so the
  fold is bit-deterministic on any partitioning without decimal's
  interpreted-mode cost; the cross-row gradient sums (whose order IS
  partitioning-dependent) stay routed through DECIMAL — order-
  insensitive exact arithmetic (suite determinism rule). Retraining
  therefore yields bit-identical weights, and the NumPy full-loop
  replay test pins the whole loop to ~1e-8 of the dense X @ w replay.

At scale: the corpus is tokenized once and collapsed to doc-sized array
rows once (materialized and reused across iterations); each iteration's
only shuffle carries ≤ n_buckets × K rows out of the reduce — model-sized,
not data-sized. Nothing driver-side grows with the corpus.

Two plan-shape rules inherited from CLAUDE.md's empirical facts: the err
columns are computed in a Project BELOW the gradient explode (a Generate
re-evaluates its generator expression per OUTPUT element, but passes
child-project columns through by value — verified per-doc, not
per-element), and the weight array is bound via F.lit(list) which is a
single Literal node (no 1024-child array(...) expression tree).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint
from ..functions.text import normalized_text

# Decimal scale for order-insensitive distributed sums: products of
# x ∈ [0,1] and |w| ≤ ~100 fit DECIMAL(28,16) with 12 integer digits.
_DEC = "decimal(28,16)"

# Driver-local training gate, in feature CELLS ((doc, bucket, x) rows) and
# docs: under it the Adagrad loop runs as a seeded NumPy replay of the
# distributed iteration (same quantizer-gate idea as similarity.py's
# _LOCAL_FIT_CELLS). Rationale: each distributed iteration is ONE shuffle
# but still ~1 s of pure job-scheduling latency — 20 s for the default 20
# iterations even on a 500-doc fixture — while the local loop is
# milliseconds. The gate is the production shape, not a fixture hack:
# classifier TRAINING sets are annotator-sized (DCLM / FineWeb-Edu distill
# fastText filters from 100k–500k labeled docs) while the 100 TB side is
# SCORING, which stays fully distributed (score_logreg /
# score_one_vs_rest). Above the gate the one-shuffle-per-iteration
# distributed loop is unchanged. Local-vs-distributed weight parity is
# pinned at 1e-8 (tests/test_text_classifier.py) — the two differ only by
# the decimal per-term quantization (≤1e-16/term), np.exp vs Math.exp
# last-ulp, and float64 vs decimal gradient-sum rounding.
_LOCAL_TRAIN_CELLS = 8_000_000


def hashed_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """(doc, bucket, x) — the averaged hashed bag-of-n-grams.

    x = (occurrences of the bucket's n-grams in the doc) / (total n-grams
    in the doc), i.e. the mean of one-hot embeddings, fastText's input
    representation. Hashing uses the engine-wide portable md5 (so feature
    extraction is reproducible in any engine, and tests can replay it in
    NumPy bit-for-bit).
    """
    words = F.split(F.trim(normalized_text(F.col(text_col))), r"\s+")
    # stage the filtered word array as a bound column: expressions inside a
    # HOF lambda are re-evaluated per element (no subexpression elimination
    # under lambdas — CLAUDE.md), so the bigram transform below must read an
    # attribute, not re-run split+filter per element
    staged = df.select(
        F.col(id_col).alias("doc"),
        F.filter(words, lambda w: F.length(w) > 0).alias("ws"),
    )
    ws = F.col("ws")
    if bigrams:
        nw = F.size(ws)
        bi = F.transform(
            F.slice(ws, 1, F.greatest(nw - 1, F.lit(0))),
            lambda w, i: F.concat_ws(" ", w, F.get(ws, i + 1)),
        )
        grams = F.concat(ws, bi)
        total = nw + F.greatest(nw - 1, F.lit(0))
    else:
        grams = ws
        total = F.size(ws)
    # cheap generator expr (per-element concat over an attribute) — the
    # tolerable class of Generate re-evaluation, same as the shingle
    # transforms in operators/dedup.py. The per-doc gram total rides along
    # as a column computed BEFORE the explode, so x = c/n needs no totals
    # self-join — the whole extraction is ONE (doc, bucket) shuffle, with
    # map-side partial aggregation collapsing token occurrences to
    # distinct (doc, bucket) rows before the wire.
    toks = staged.select(
        "doc", total.alias("n"), F.explode(grams).alias("term")
    )
    return (
        toks.select(
            "doc",
            "n",
            (md5_bigint(F.col("term"), salt="feat:") % n_buckets).alias(
                "bucket"
            ),
        )
        .groupBy("doc", "bucket")
        .agg((F.count("*") / F.first("n")).alias("x"))
    )


@dataclass
class LogRegModel:
    """Driver-side model state: bucket → weight, plus the intercept.
    `g2`/`g2_bias` are the Adagrad accumulators (sum of squared gradients
    per coordinate) — kept on the model so training can resume."""

    n_buckets: int
    bias: float = 0.0
    weights: dict[int, float] = field(default_factory=dict)
    g2: dict[int, float] = field(default_factory=dict)
    g2_bias: float = 0.0

    def weights_df(self, spark: SparkSession) -> DataFrame:
        rows = [(int(b), float(w)) for b, w in sorted(self.weights.items())]
        if not rows:
            rows = [(-2, 0.0)]  # no-match placeholder; bucket -2 never occurs
        return spark.createDataFrame(rows, "bucket bigint, w double")


def _sigmoid(z: float) -> float:
    # clamped to keep exp() finite; 36.7 ≈ logit saturation for float64
    z = max(-36.7, min(36.7, z))
    return 1.0 / (1.0 + math.exp(-z))


_FA_TYPE = "array<struct<bucket:bigint,x:double>>"


def _bias_elem():
    # synthetic intercept element appended before the gradient explode:
    # x=1.0 makes the bucket=-1 gradient sum equal the bias gradient Σerr
    # (built lazily — Column construction needs a live SparkContext)
    return F.array(
        F.struct(
            F.lit(-1).cast("bigint").alias("bucket"), F.lit(1.0).alias("x")
        )
    )


def _doc_arrays(feats: DataFrame, labels: DataFrame) -> DataFrame:
    """Collapse the long (doc, bucket, x) table to one array row per
    LABELED doc: (doc, fa, <label cols>). Label docs with no features
    (empty text) get an empty array — their margin aggregates to exactly
    0, matching the old left-join-then-coalesce semantics.

    The array is sort_array'd: collect_list order is arrival order
    (partitioning-dependent), but the per-doc margin is a sequential
    DOUBLE fold over this array, so a canonical bucket order is what
    makes retraining bit-deterministic on any partitioning (buckets are
    unique within a doc — the struct sort is a total order)."""
    arrays = feats.groupBy("doc").agg(
        F.sort_array(F.collect_list(F.struct("bucket", "x"))).alias("fa")
    )
    keep = [c for c in labels.columns if c != "doc"]
    return labels.join(arrays, "doc", "left").select(
        "doc",
        F.coalesce("fa", F.array().cast(_FA_TYPE)).alias("fa"),
        *keep,
    )


def _doc_parts(n_docs: int) -> int:
    """Partition target for the training frame: ~50k array rows (~50 MB)
    per partition. The 20-iteration loop re-reads this frame 20×, so at
    fixture scale one task per stage beats session-default partition
    counts (each iteration is job-floor-bound, not compute-bound);
    at corpus scale the formula grows the count linearly — and coalesce
    can only LOWER the parent's partition count, so a large target
    degrades to keeping the shuffle's own parallelism."""
    return max(1, math.ceil(n_docs / 50_000))


def _dense_weights(model: LogRegModel) -> list[float]:
    w = [0.0] * model.n_buckets
    for b, v in model.weights.items():
        w[b] = v
    return w


def _train_heads(
    doc_df: DataFrame,
    n_docs: int,
    models: list[LogRegModel],
    iters: int,
    lr: float,
    l2: float,
    eps: float,
) -> list[LogRegModel]:
    """The shared one-shuffle-per-iteration Adagrad loop over K heads.

    `doc_df` is (doc, fa, y_0..y_{K-1}) — one MATERIALIZED row per
    training doc, `fa` in canonical bucket order. Per iteration: the K
    dense weight arrays + biases ride in as ONE broadcast single-row
    frame (crossJoin — a driver-local relation, no job), head k's margin
    is a map-side DOUBLE `aggregate()` over `fa` (zero shuffle;
    deterministic because the fold order is the canonical array order),
    err_k = σ(clamp(m_k + bias_k)) − y_k is a column in the same
    project, and one explode → groupBy(bucket) aggregate decimal-sums
    all K gradient columns in a single bucket-keyed shuffle. The collect
    is ≤ (active buckets + 1) rows × K gradients — model-sized.

    Two empirically-measured shapes here (see CLAUDE.md): the weight
    arrays bind as ATTRIBUTES, not literals — interpreted `element_at`
    on a literal array copies the whole array per element access,
    O(n_buckets) per lookup (65536-entry literal measured ~30x slower
    than the attribute form) — and binding weights as data keeps the
    generated code byte-identical across iterations, so Spark's codegen
    cache compiles the iteration exactly once.
    """
    spark = doc_df.sparkSession
    K = len(models)
    for _ in range(iters):
        wrow = spark.createDataFrame(
            [
                tuple(_dense_weights(m) for m in models)
                + tuple(float(m.bias) for m in models)
            ],
            ", ".join(
                [f"_w_{k} array<double>" for k in range(K)]
                + [f"_b_{k} double" for k in range(K)]
            ),
        )
        sel = [F.col("fa")]
        for k, m in enumerate(models):
            # bind the weight array through a factory — HOF lambdas must
            # take EXACTLY the declared arg count (a `w=warr` default
            # param reads as a 3-arg lambda and fails analysis)
            def _merge(w):
                def step(acc, f):
                    return acc + f["x"] * F.element_at(
                        w, f["bucket"].cast("int") + 1
                    )

                return step

            mg = F.aggregate(
                "fa", F.lit(0.0), _merge(F.col(f"_w_{k}"))
            )
            z = F.greatest(
                F.lit(-36.7),
                F.least(F.lit(36.7), mg + F.col(f"_b_{k}")),
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            sel.append((p - F.col(f"y_{k}")).alias(f"err_{k}"))
        staged = doc_df.crossJoin(F.broadcast(wrow)).select(*sel)
        grad_rows = (
            staged.select(
                *[F.col(f"err_{k}") for k in range(K)],
                F.explode(F.concat("fa", _bias_elem())).alias("f"),
            )
            .groupBy(F.col("f.bucket").alias("bucket"))
            .agg(
                *[
                    F.sum(
                        (F.col("f.x") * F.col(f"err_{k}")).cast(_DEC)
                    ).alias(f"g_{k}")
                    for k in range(K)
                ]
            )
            .collect()
        )
        for row in grad_rows:
            b = int(row["bucket"])
            for k, m in enumerate(models):
                g = float(row[f"g_{k}"]) / n_docs
                if b == -1:  # intercept coordinate (no l2)
                    m.g2_bias += g * g
                    m.bias -= lr * g / math.sqrt(m.g2_bias + eps)
                else:
                    w = m.weights.get(b, 0.0)
                    g += l2 * w
                    acc = m.g2.get(b, 0.0) + g * g
                    m.g2[b] = acc
                    m.weights[b] = w - lr * g / math.sqrt(acc + eps)
    return models


def _local_train_arrays(feats: DataFrame, labels: DataFrame, n_heads: int, gate: int):
    """Collect the training inputs under the local gate through Arrow,
    canonically ordered, or None (caller falls back to the distributed
    loop). Returns (doc_idx, buckets, xs, Y, n_docs): the long feature
    table sorted by (doc, bucket) — the SAME canonical order as
    `_doc_arrays`' sort_array, so the per-doc accumulation order matches
    the distributed fold — with `doc_idx` pointing into the doc-sorted
    label rows, and Y the (n_heads, n_docs) label matrix. Feature rows for
    unlabeled docs are dropped (the `_doc_arrays` left-join semantics);
    labeled docs with no features get empty segments (margin 0). The
    gate probe short-circuits the scan; non-numeric doc ids fall back to
    the distributed path (no canonical numpy order for mixed types)."""
    import numpy as np

    if gate <= 0:
        return None
    if feats.select("doc").limit(gate + 1).count() > gate:
        return None
    lt = labels.toArrow()
    docs = lt.column("doc").to_numpy(zero_copy_only=False)
    if not np.issubdtype(np.asarray(docs).dtype, np.number):
        return None
    docs = np.asarray(docs)
    order = np.argsort(docs, kind="stable")
    docs_sorted = docs[order]
    if docs_sorted.size and np.unique(docs_sorted).size != docs_sorted.size:
        # duplicate label rows: the distributed left join hands each dup
        # the full feature array, which searchsorted can't express —
        # fall back rather than silently diverge
        return None
    Y = np.stack(
        [
            np.asarray(
                lt.column(f"y_{k}").to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )[order]
            for k in range(n_heads)
        ]
    )
    ft = feats.select("doc", "bucket", "x").toArrow()
    fd = np.asarray(ft.column("doc").to_numpy(zero_copy_only=False))
    if not np.issubdtype(fd.dtype, np.number):
        # labels numeric but the FEATURE doc ids are not (mixed-type
        # inputs): searchsorted below would raise — fall back to the
        # distributed path like every other unsupported shape
        return None
    fb = np.asarray(
        ft.column("bucket").to_numpy(zero_copy_only=False), dtype=np.int64
    )
    fx = np.asarray(
        ft.column("x").to_numpy(zero_copy_only=False), dtype=np.float64
    )
    idx = np.lexsort((fb, fd))
    fd, fb, fx = fd[idx], fb[idx], fx[idx]
    if docs_sorted.size == 0:
        return None
    pos = np.searchsorted(docs_sorted, fd)
    pos_c = np.minimum(pos, docs_sorted.size - 1)
    mask = docs_sorted[pos_c] == fd
    return pos_c[mask], fb[mask], fx[mask], Y, int(docs_sorted.size)


def _train_heads_local(
    doc_idx,
    buckets,
    xs,
    Y,
    n_docs: int,
    models: list[LogRegModel],
    iters: int,
    lr: float,
    l2: float,
    eps: float,
) -> list[LogRegModel]:
    """The driver-local twin of :func:`_train_heads`: the identical
    full-batch Adagrad recurrence, vectorized in NumPy over the collected
    (doc_idx, buckets, xs) long table. Per iteration per head: margins
    are a bincount segment-sum over docs (sequential C accumulation in
    the canonical (doc, bucket) order — deterministic on any input
    partitioning, since the collect is canonically re-sorted), the
    bucket gradient a bincount over buckets, and the update touches
    exactly the buckets PRESENT in the data — the same active set the
    distributed groupBy produces, so a head trained jointly is
    bit-identical to the same head trained solo (pinned by
    tests/test_one_vs_rest.py)."""
    import numpy as np

    K = len(models)
    nb = models[0].n_buckets
    active = np.unique(buckets)
    W = np.zeros((K, nb))
    G2 = np.zeros((K, nb))
    bias = np.array([m.bias for m in models], dtype=np.float64)
    g2b = np.array([m.g2_bias for m in models], dtype=np.float64)
    for k, m in enumerate(models):
        for b, v in m.weights.items():
            W[k, b] = v
        for b, v in m.g2.items():
            G2[k, b] = v
    for _ in range(iters):
        for k in range(K):
            mg = np.bincount(
                doc_idx, weights=xs * W[k][buckets], minlength=n_docs
            )
            z = np.clip(mg + bias[k], -36.7, 36.7)
            err = 1.0 / (1.0 + np.exp(-z)) - Y[k]
            g = (
                np.bincount(
                    buckets, weights=xs * err[doc_idx], minlength=nb
                )[active]
                / n_docs
                + l2 * W[k][active]
            )
            G2[k][active] += g * g
            W[k][active] -= lr * g / np.sqrt(G2[k][active] + eps)
            bg = float(err.sum()) / n_docs
            g2b[k] += bg * bg
            bias[k] -= lr * bg / math.sqrt(g2b[k] + eps)
    for k, m in enumerate(models):
        m.bias = float(bias[k])
        m.g2_bias = float(g2b[k])
        for b in active:
            m.weights[int(b)] = float(W[k][b])
            m.g2[int(b)] = float(G2[k][b])
    return models


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    n_buckets: int,
    iters: int = 12,
    lr: float = 1.0,
    l2: float = 1e-4,
    eps: float = 1e-8,
    local_cells: int | None = None,
) -> LogRegModel:
    """Full-batch Adagrad on logistic loss:
    w ← w − lr·g/√(Σg² + ε), g = ∇ℓ/N + λw.

    Per-coordinate step scaling (Duchi et al., JMLR 2011 — the Vowpal
    Wabbit default for hashed sparse features) is what makes ONE learning
    rate work for both the intercept (gradient magnitude ~1e-1) and the
    averaged n-gram features (x ~ 1/doc_len, gradients ~1e-3): plain GD
    either stalls the weights or slams the bias to saturation.

    `feats` is the (doc, bucket, x) frame from :func:`hashed_features`;
    `labels` is (doc, y) with y ∈ {0.0, 1.0}. Internally the pair is
    collapsed once to one (doc, fa, y) ARRAY row per doc and the loop
    runs in :func:`_train_heads`: per iteration, margins are a map-side
    decimal aggregate over the array (weights bound as a dense literal),
    and the only shuffle is the bucket-keyed gradient sum. Collected per
    iteration: one row per ACTIVE bucket (≤ n_buckets) — the model,
    nothing else; the Adagrad accumulators are model-sized driver state.
    """
    model = LogRegModel(n_buckets=n_buckets)
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("empty training set")
    wide = labels.select("doc", F.col("y").cast("double").alias("y_0"))
    gate = _LOCAL_TRAIN_CELLS if local_cells is None else local_cells
    arrs = _local_train_arrays(feats, wide, 1, gate) if n_docs <= gate else None
    if arrs is not None:
        return _train_heads_local(*arrs, [model], iters, lr, l2, eps)[0]
    doc_df = (
        _doc_arrays(feats, wide)
        .coalesce(_doc_parts(n_docs))
        .localCheckpoint(eager=True)
    )
    return _train_heads(doc_df, n_docs, [model], iters, lr, l2, eps)[0]


def score_logreg(
    feats: DataFrame, model: LogRegModel, prob_col: str = "prob"
) -> DataFrame:
    """(doc, prob, pred) — broadcast the weight table, decimal-sum the
    margin per doc, sigmoid, round to 6 dp (suite transcendental rule)."""
    spark = feats.sparkSession
    wdf = model.weights_df(spark)
    margins = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy("doc")
        .agg(
            F.sum(
                (F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).cast(_DEC)
            ).alias("m")
        )
    )
    z = F.greatest(
        F.lit(-36.7),
        F.least(F.lit(36.7), F.col("m").cast("double") + F.lit(model.bias)),
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return margins.select(
        "doc",
        prob.alias(prob_col),
        (prob >= 0.5).cast("int").alias("pred"),
    )


def train_text_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    n_buckets: int = 1024,
    iters: int = 20,
    lr: float = 5.0,
    l2: float = 0.0,
    bigrams: bool = False,
    local_cells: int | None = None,
) -> tuple[LogRegModel, DataFrame]:
    """Convenience wrapper: extract features once (materialized for the
    iteration loop), train on `label_col` (numeric 0/1), return the model
    and the reusable feature frame.

    Defaults are the empirically stable full-batch profile: Adagrad's
    first step is a pure sign step of size lr per active coordinate, so
    mid-training accuracy oscillates before settling — fewer than ~15
    iterations can land on a bad swing. Bigrams are off by default: they
    add collision noise unless the corpus actually carries multi-word
    signal."""
    feats = hashed_features(
        df, text_col, id_col, n_buckets=n_buckets, bigrams=bigrams
    ).localCheckpoint(eager=True)
    labels = df.select(
        F.col(id_col).alias("doc"), F.col(label_col).cast("double").alias("y")
    )
    model = train_logreg(
        feats,
        labels,
        n_buckets=n_buckets,
        iters=iters,
        lr=lr,
        l2=l2,
        local_cells=local_cells,
    )
    return model, feats


def train_one_vs_rest(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    n_buckets: int = 1024,
    iters: int = 20,
    lr: float = 5.0,
    l2: float = 0.0,
    bigrams: bool = False,
    local_cells: int | None = None,
) -> tuple[dict[str, LogRegModel], DataFrame]:
    """Multiclass classifier as one-vs-rest binary heads — fastText's
    own reduction for small class counts. `label_col` is a string class
    column; returns {class: LogRegModel} plus the shared feature frame.

    The corpus is featurized ONCE (the shared `feats` frame — the
    tokenize-once rule) and ALL K heads train in the same
    :func:`_train_heads` loop: the per-doc project carries K err columns
    and the gradient aggregate K sum columns, so each iteration is ONE
    bucket-keyed shuffle for the whole multiclass model — not one loop
    (or even one job) per head. Each head's arithmetic is coordinate-wise
    independent and decimal-exact, so every head is bit-identical to the
    standalone binary training on the same features (pinned by
    tests/test_one_vs_rest.py). Driver state is K model-sized dicts."""
    feats = hashed_features(
        df, text_col, id_col, n_buckets=n_buckets, bigrams=bigrams
    ).localCheckpoint(eager=True)
    classes = sorted(
        r[0] for r in df.select(label_col).distinct().collect()
    )  # class-count-sized collect
    if len(classes) < 2:
        raise ValueError(f"need >= 2 classes, got {classes}")

    labels = df.select(
        F.col(id_col).alias("doc"),
        *[
            (F.col(label_col) == cls).cast("double").alias(f"y_{k}")
            for k, cls in enumerate(classes)
        ],
    )
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("empty training set")
    heads = [LogRegModel(n_buckets=n_buckets) for _ in classes]
    gate = _LOCAL_TRAIN_CELLS if local_cells is None else local_cells
    arrs = (
        _local_train_arrays(feats, labels, len(classes), gate)
        if n_docs <= gate
        else None
    )
    if arrs is not None:
        models = _train_heads_local(*arrs, heads, iters, lr, l2, eps=1e-8)
        return dict(zip(classes, models)), feats
    doc_df = (
        _doc_arrays(feats, labels)
        .coalesce(_doc_parts(n_docs))
        .localCheckpoint(eager=True)
    )
    models = _train_heads(doc_df, n_docs, heads, iters, lr, l2, eps=1e-8)
    return dict(zip(classes, models)), feats


def score_one_vs_rest(
    feats: DataFrame, models: dict[str, LogRegModel]
) -> DataFrame:
    """(doc, pred_label, pred_prob) — all K heads score in ONE pass: the
    per-class weight tables stack into a single broadcast (bucket, cls,
    w) table, one join + one (doc, cls) aggregate computes every margin,
    and the argmax is a deterministic max over (prob, cls) structs
    (ties take the lexicographically largest class; probs are rounded to
    6 dp first, the suite transcendental rule). Scoring cost is
    independent of K on the corpus side — K scales only the broadcast."""
    spark = feats.sparkSession
    classes = sorted(models)
    rows = []
    biases = {}
    for cls in classes:
        biases[cls] = models[cls].bias
        for b, w in sorted(models[cls].weights.items()):
            rows.append((cls, int(b), float(w)))
    if not rows:
        rows = [(classes[0], -2, 0.0)]  # placeholder bucket, never occurs
    wdf = spark.createDataFrame(rows, "cls string, bucket bigint, w double")
    bias_df = spark.createDataFrame(
        [(c, float(b)) for c, b in sorted(biases.items())], "cls string, bias double"
    )
    margins = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc", "cls")
        .agg(F.sum((F.col("x") * F.col("w")).cast(_DEC)).alias("m"))
    )
    # docs with no active bucket in ANY head still need K bias-only rows
    all_pairs = feats.select("doc").distinct().crossJoin(F.broadcast(bias_df))
    z = F.greatest(
        F.lit(-36.7),
        F.least(
            F.lit(36.7),
            F.coalesce(F.col("m").cast("double"), F.lit(0.0)) + F.col("bias"),
        ),
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    scored = all_pairs.join(margins, ["doc", "cls"], "left").select(
        "doc", "cls", prob.alias("prob")
    )
    best = scored.groupBy("doc").agg(
        F.max(F.struct(F.col("prob"), F.col("cls"))).alias("_b")
    )
    return best.select(
        "doc",
        F.col("_b.cls").alias("pred_label"),
        F.col("_b.prob").alias("pred_prob"),
    )
