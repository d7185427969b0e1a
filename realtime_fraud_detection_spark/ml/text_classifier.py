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
* Training is batch gradient descent with broadcast weights and
  hash-aggregated gradients: per iteration the (doc, bucket, x) table
  joins the broadcast weight table, aggregates margins per doc, joins the
  doc-sized error frame back, and aggregates gradients per bucket. The
  driver only ever holds the MODEL (≤ n_buckets floats — parameter-sized,
  not data-sized); this is the same broadcast-weights /
  treeAggregate-gradients topology MLlib's own LogisticRegression uses.
* Determinism: every distributed sum (margins, gradients) is routed
  through DECIMAL — order-insensitive exact arithmetic — so retraining on
  any partitioning yields bit-identical weights (suite determinism rule;
  double accumulation order would differ run to run).

At scale: the feature table is the corpus tokenized once (materialized and
reused across iterations), each iteration is two shuffles whose reduce
keys are doc and bucket — both well-distributed by construction (buckets
are md5-uniform). Nothing driver-side grows with the corpus.
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
        n = F.size(ws)
        bi = F.transform(
            F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
            lambda w, i: F.concat_ws(" ", w, F.get(ws, i + 1)),
        )
        grams = F.concat(ws, bi)
    else:
        grams = ws
    # cheap generator expr (per-element concat over an attribute) — the
    # tolerable class of Generate re-evaluation, same as the shingle
    # transforms in operators/dedup.py
    toks = staged.select("doc", F.explode(grams).alias("term"))
    counts = toks.groupBy("doc", "term").agg(F.count("*").alias("c"))
    feats = counts.select(
        "doc",
        (md5_bigint(F.col("term"), salt="feat:") % n_buckets).alias("bucket"),
        F.col("c"),
    ).groupBy("doc", "bucket").agg(F.sum("c").alias("c"))
    totals = feats.groupBy("doc").agg(F.sum("c").alias("n"))
    return feats.join(totals, "doc").select(
        "doc", "bucket", (F.col("c") / F.col("n")).alias("x")
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


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    n_buckets: int,
    iters: int = 12,
    lr: float = 1.0,
    l2: float = 1e-4,
    eps: float = 1e-8,
) -> LogRegModel:
    """Full-batch Adagrad on logistic loss:
    w ← w − lr·g/√(Σg² + ε), g = ∇ℓ/N + λw.

    Per-coordinate step scaling (Duchi et al., JMLR 2011 — the Vowpal
    Wabbit default for hashed sparse features) is what makes ONE learning
    rate work for both the intercept (gradient magnitude ~1e-1) and the
    averaged n-gram features (x ~ 1/doc_len, gradients ~1e-3): plain GD
    either stalls the weights or slams the bias to saturation.

    `feats` is the (doc, bucket, x) frame from :func:`hashed_features` —
    the caller should materialize it (localCheckpoint) since every
    iteration reads it twice. `labels` is (doc, y) with y ∈ {0.0, 1.0}.

    Distributed per iteration: broadcast-join current weights onto the
    feature table, decimal-sum margins per doc, compute the per-doc error
    p − y, join it back and decimal-sum per-bucket gradients. Collected:
    one row per ACTIVE bucket (≤ n_buckets) — the model, nothing else;
    the Adagrad accumulators are model-sized driver state.
    """
    spark = feats.sparkSession
    model = LogRegModel(n_buckets=n_buckets)
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("empty training set")

    # fold the INTERCEPT into the gradient aggregate: one synthetic
    # (doc, bucket=-1, x=1.0) row per doc makes the per-bucket gradient
    # sum yield the bias gradient (sum of errs) in the SAME pass — the
    # previous union-branch form evaluated the whole margin/err subtree a
    # second time per iteration. Bucket -1 never enters weights_df, so it
    # contributes exactly 0 to margins (coalesce(w, 0)), and the decimal
    # sums are order-insensitive — bit-identical weights to the old form
    # (NumPy full-loop replay test pins this).
    feats_aug = feats.unionByName(
        labels.select(
            "doc", F.lit(-1).cast("bigint").alias("bucket"), F.lit(1.0).alias("x")
        )
    ).localCheckpoint(eager=False)

    for _ in range(iters):
        wdf = model.weights_df(spark)
        margins = (
            feats_aug.join(F.broadcast(wdf), "bucket", "left")
            .groupBy("doc")
            .agg(
                F.sum(
                    (F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).cast(_DEC)
                ).alias("m")
            )
        )
        errs = (
            labels.join(margins, "doc", "left")
            .select(
                "doc",
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -F.greatest(
                                F.lit(-36.7),
                                F.least(
                                    F.lit(36.7),
                                    F.coalesce(
                                        F.col("m").cast("double"), F.lit(0.0)
                                    )
                                    + F.lit(model.bias),
                                ),
                            )
                        )
                    )
                    - F.col("y")
                ).alias("err"),
            )
        )
        # one collect for both the per-bucket gradients and the bias term:
        # the bucket=-1 rows (x=1.0) sum to the bias gradient
        grad_rows = (
            feats_aug.join(errs, "doc")
            .groupBy("bucket")
            .agg(F.sum((F.col("x") * F.col("err")).cast(_DEC)).alias("g"))
            .collect()
        )
        for row in grad_rows:
            g = float(row["g"]) / n_docs
            b = int(row["bucket"])
            if b == -1:  # intercept coordinate (no l2)
                model.g2_bias += g * g
                model.bias -= lr * g / math.sqrt(model.g2_bias + eps)
            else:
                w = model.weights.get(b, 0.0)
                g += l2 * w
                acc = model.g2.get(b, 0.0) + g * g
                model.g2[b] = acc
                model.weights[b] = w - lr * g / math.sqrt(acc + eps)
    return model


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
        feats, labels, n_buckets=n_buckets, iters=iters, lr=lr, l2=l2
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
) -> tuple[dict[str, LogRegModel], DataFrame]:
    """Multiclass classifier as one-vs-rest binary heads — fastText's
    own reduction for small class counts. `label_col` is a string class
    column; returns {class: LogRegModel} plus the shared feature frame.

    The corpus is featurized ONCE (the shared `feats` frame — the
    tokenize-once rule); the K binary trainings read it concurrently
    (thread-safe job submission, each head fully seeded/deterministic,
    same as pq_train's parallel codebook fits). Driver state is K
    model-sized dicts. Per head the cost is the usual iteration job
    floor, but the heads overlap, so wall clock is ~one head."""
    from concurrent.futures import ThreadPoolExecutor

    feats = hashed_features(
        df, text_col, id_col, n_buckets=n_buckets, bigrams=bigrams
    ).localCheckpoint(eager=True)
    classes = sorted(
        r[0] for r in df.select(label_col).distinct().collect()
    )  # class-count-sized collect
    if len(classes) < 2:
        raise ValueError(f"need >= 2 classes, got {classes}")

    def train_head(cls: str) -> LogRegModel:
        labels = df.select(
            F.col(id_col).alias("doc"),
            (F.col(label_col) == cls).cast("double").alias("y"),
        )
        return train_logreg(
            feats, labels, n_buckets=n_buckets, iters=iters, lr=lr, l2=l2
        )

    with ThreadPoolExecutor(max_workers=min(len(classes), 8)) as pool:
        models = dict(zip(classes, pool.map(train_head, classes)))
    return models, feats


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
