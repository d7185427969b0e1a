"""ML models — SURVEY §2.8 M4-M9, as in-pipeline Spark stages.

The reference serves an ensemble over REST (services/ml-models/src/main.py);
here inference is a column in the plan:

  * M4 XGBoost → MLlib GBTClassifier (Spark-native, distributed training;
    hyperparams mirror model_manager.py:157-161: depth 6, 100 trees).
  * M5 Isolation Forest → a seeded pure-NumPy implementation (sklearn is not
    in this container), fit driver-side on a sample, broadcast, scored in an
    Arrow-batched pandas_udf — the standard shape for "small model, big data".
  * M6 LSTM / M7 BERT → the reference never materializes real models (dummy
    fallbacks at model_manager.py:244-277); we gate the heavy deps behind
    import-try and fall back to the same neutral 0.5 the reference uses.
  * Training data → the synthetic generator of model_trainer.py:123-233
    (seed 42, ~5% fraud, weighted-risk-factor labels at threshold 0.7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FEATURE_COLS = [
    "amount",
    "amount_log",
    "hour_of_day",
    "is_weekend",
    "user_risk_score",
    "merchant_fraud_rate",
    "merchant_risk_score",
    "velocity_score",
    "is_new_device",
    "ip_risk_score",
    "distance_from_home",
    "payment_method_risk",
]


def synthetic_training_data(n: int = 20000, seed: int = 42) -> pd.DataFrame:
    """model_trainer.py:123-233: engineered fraud logic — weighted risk
    factors → probability → label, rebalanced to ~5% fraud."""
    rng = np.random.default_rng(seed)
    amount = np.exp(rng.normal(4, 1.2, n)).clip(1, 20000)
    df = pd.DataFrame(
        {
            "amount": amount,
            "amount_log": np.log1p(amount),
            "hour_of_day": rng.integers(0, 24, n).astype("float64"),
            "is_weekend": (rng.random(n) < 2 / 7).astype("float64"),
            "user_risk_score": rng.beta(2, 8, n),
            "merchant_fraud_rate": rng.uniform(0, 0.2, n),
            "merchant_risk_score": rng.uniform(0, 1, n),
            "velocity_score": rng.beta(1.5, 6, n),
            "is_new_device": (rng.random(n) < 0.15).astype("float64"),
            "ip_risk_score": rng.choice([0.1, 0.3, 0.8], n, p=[0.3, 0.6, 0.1]),
            "distance_from_home": np.exp(rng.normal(2, 1.5, n)),
            "payment_method_risk": rng.choice([0.1, 0.2, 0.5], n, p=[0.6, 0.3, 0.1]),
        }
    )
    risk = (
        0.25 * df["user_risk_score"]
        + 0.2 * df["velocity_score"]
        + 0.15 * df["merchant_risk_score"]
        + 0.1 * df["is_new_device"]
        + 0.1 * df["ip_risk_score"]
        + 0.1 * (df["amount"] > 2000).astype(float)
        + 0.1 * df["payment_method_risk"]
        + rng.normal(0, 0.05, n)
    )
    threshold = np.quantile(risk, 0.95)  # ~5% positives (model_trainer.py:233)
    df["is_fraud"] = (risk >= threshold).astype("int32")
    return df


def train_gbt(spark, train_pd: pd.DataFrame | None = None, seed: int = 42):
    """M4 — MLlib GBT pipeline: VectorAssembler → GBTClassifier.
    Returns (fitted PipelineModel, heldout AUC) mirroring the 80/20 split +
    AUC evaluation of model_trainer.py:64-103."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    pdf = train_pd if train_pd is not None else synthetic_training_data()
    df = spark.createDataFrame(pdf)
    train, test = df.randomSplit([0.8, 0.2], seed=seed)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="features_vec"),
            GBTClassifier(
                labelCol="is_fraud",
                featuresCol="features_vec",
                maxDepth=6,
                maxIter=30,
                stepSize=0.1,
                seed=seed,
            ),
        ]
    )
    model = pipe.fit(train)
    auc = BinaryClassificationEvaluator(
        labelCol="is_fraud", rawPredictionCol="rawPrediction"
    ).evaluate(model.transform(test))
    return model, auc


class IsolationForest:
    """M5 — seeded NumPy isolation forest (no sklearn in this container).

    Standard iForest: random trees over sub-samples, anomaly score
    2^(-E[path]/c(n)); the reference trains on the normal class with
    contamination 0.05-0.1 (model_trainer.py:235-276) and squashes the score
    through a sigmoid (model_manager.py:338-346).
    """

    def __init__(self, n_trees: int = 50, sample_size: int = 256, seed: int = 42):
        self.n_trees = n_trees
        self.sample_size = sample_size
        self.seed = seed
        self.trees: list[dict] = []

    @staticmethod
    def _c(n: float) -> float:
        if n <= 1:
            return 0.0
        return 2.0 * (np.log(n - 1) + 0.5772156649) - 2.0 * (n - 1) / n

    def _build(self, X: np.ndarray, rng: np.random.Generator, depth: int, max_depth: int):
        n = len(X)
        if depth >= max_depth or n <= 1:
            return {"leaf": True, "n": n}
        feat = int(rng.integers(0, X.shape[1]))
        lo, hi = X[:, feat].min(), X[:, feat].max()
        if lo == hi:
            return {"leaf": True, "n": n}
        split = float(rng.uniform(lo, hi))
        mask = X[:, feat] < split
        return {
            "leaf": False,
            "feat": feat,
            "split": split,
            "left": self._build(X[mask], rng, depth + 1, max_depth),
            "right": self._build(X[~mask], rng, depth + 1, max_depth),
        }

    def fit(self, X: np.ndarray) -> "IsolationForest":
        rng = np.random.default_rng(self.seed)
        max_depth = int(np.ceil(np.log2(self.sample_size)))
        self.trees = []
        for _ in range(self.n_trees):
            idx = rng.choice(len(X), min(self.sample_size, len(X)), replace=False)
            self.trees.append(self._build(X[idx], rng, 0, max_depth))
        return self

    def _path(self, tree: dict, x: np.ndarray, depth: int = 0) -> float:
        if tree["leaf"]:
            return depth + self._c(tree["n"])
        branch = tree["left"] if x[tree["feat"]] < tree["split"] else tree["right"]
        return self._path(branch, x, depth + 1)

    def score(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score in (0,1): higher = more anomalous."""
        cn = self._c(self.sample_size)
        paths = np.array([[self._path(t, x) for t in self.trees] for x in X])
        return 2.0 ** (-paths.mean(axis=1) / cn)


def isolation_forest_udf(spark, model: IsolationForest, feature_cols: list[str]):
    """Broadcast the fitted forest; score rows in Arrow batches.
    sigmoid squash per model_manager.py:338-346."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.DoubleType())
    def score(*cols: pd.Series) -> pd.Series:
        X = np.column_stack([c.to_numpy(dtype="float64") for c in cols])
        raw = bc.value.score(X)
        return pd.Series(1.0 / (1.0 + np.exp(-6.0 * (raw - 0.5))))

    return score(*[F.col(c) for c in feature_cols])


def top_feature_importances(model, n: int = 10) -> list[tuple[str, float]]:
    """The reference's top-10 feature-importance report
    (ensemble_predictor.py:426-431) from the fitted GBT pipeline."""
    gbt = model.stages[-1]
    pairs = sorted(
        zip(FEATURE_COLS, gbt.featureImportances.toArray()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return [(name, float(imp)) for name, imp in pairs[:n]]


def sequence_features(tx, n: int = 10):
    """M6 — the LSTM input assembly (utils/config.py:145-157: 10-step
    sequences per user): trailing-N amount vectors via collect_list over a
    bounded row window. The reference's LSTM itself never materializes
    (dummy fallback, model_manager.py:244-277); a trained model would consume
    these sequences through a pandas_udf like isolation_forest_udf."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "transaction_id")
        .rowsBetween(-(n - 1), 0)
    )
    return tx.withColumn("amount_sequence", F.collect_list("amount").over(w))


def text_model_score(text_col):
    """M7 fallback — the rule-based text risk the reference actually relies
    on (its DistilBERT path degrades to keyword features; transformers is
    gated behind import-try here for the same reason)."""
    try:  # pragma: no cover - heavy dep absent in this container
        import transformers  # noqa: F401
    except ImportError:
        pass
    from pyspark.sql import functions as F

    from ..functions.text import KEYWORD_FLAGS

    score = F.lit(0.1)
    for pattern in KEYWORD_FLAGS.values():
        score = score + F.when(text_col.rlike(pattern), 0.2).otherwise(F.lit(0.0))
    return F.least(score, F.lit(1.0))


def trained_text_analyzer(
    df,
    text_col: str = "description",
    id_col: str = "transaction_id",
    prob_col: str = "text_model_score",
    iters: int = 20,
    n_buckets: int = 1024,
):
    """M7 model path — the strongest text analyzer this container can
    train: distill the rule signal (:func:`text_model_score`, the
    reference's own DistilBERT fallback) into the in-engine hashed-n-gram
    logistic model and score with THAT, so the analyzer generalizes past
    the literal keyword list (a text sharing n-grams with risky texts
    scores high even when no keyword fires). This is the FineWeb-Edu /
    DCLM weak-supervision bootstrap applied to the reference's text
    channel; where the reference loads a fine-tuned transformer, the
    artifact here is the trained weight table — same topology
    (broadcast model, batch scoring), different capacity.

    Returns (scored_df, model): df plus `prob_col`, and the LogRegModel
    for persistence / reuse on later batches via
    `score_logreg(hashed_features(...), model)`.
    """
    from pyspark.sql import functions as F

    from .text_classifier import (
        hashed_features,
        score_logreg,
        train_text_classifier,
    )

    labeled = df.withColumn(
        "_rule_label",
        (text_model_score(F.col(text_col)) >= 0.3).cast("int"),
    )
    model, feats = train_text_classifier(
        labeled, text_col, id_col, "_rule_label",
        n_buckets=n_buckets, iters=iters,
    )
    scored = score_logreg(feats, model).select(
        F.col("doc").alias(id_col), F.col("prob").alias(prob_col)
    )
    return df.join(scored, id_col, "left"), model


# ---------------------------------------------------------------------------
# M9 — model manager / hot reload (model_manager.py:82-307,348-380): models
# are versioned JSON artifacts; a running stream re-reads the artifact
# between micro-batches and RE-BROADCASTS when the version stamp changes
# (streaming/sinks.reloading_scorer_writer drives this).
# ---------------------------------------------------------------------------
LINEAR_SCORER_KIND = "linear_scorer"


def save_linear_scorer(
    path: str, weights: dict[str, float], bias: float = 0.0, version: int = 1
) -> None:
    """Persist a linear scoring model as a versioned JSON artifact
    (atomic write-then-rename, same mechanics as the tokenizer/ANN
    artifacts — a reader never observes a half-written model, which is
    what makes mid-stream swap safe)."""
    from ..functions.artifacts import FORMAT, atomic_write

    atomic_write(
        path,
        {
            "format": FORMAT,
            "kind": LINEAR_SCORER_KIND,
            "version": int(version),
            "bias": float(bias),
            "weights": {k: float(v) for k, v in weights.items()},
        },
    )


def load_linear_scorer(path: str) -> dict:
    from ..functions.artifacts import FORMAT, read_artifact

    return read_artifact(path, LINEAR_SCORER_KIND, (FORMAT,))


def linear_scorer_udf(bc, feature_cols: list[str]):
    """Arrow-batched scorer against a BROADCAST model artifact — the same
    executor-distribution shape as isolation_forest_udf. score = Σ wᵢ·xᵢ + b
    folded left-to-right in the artifact's weight order (replay-
    deterministic). Swapping the broadcast between micro-batches is the
    reference's hot reload (model_manager.py:348-366)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def score(*cols: pd.Series) -> pd.Series:
        art = bc.value
        acc = None
        for (name, w), c in zip(art["weights"].items(), cols):
            t = c.to_numpy(dtype="float64") * w
            acc = t if acc is None else acc + t
        return pd.Series(acc + art["bias"])

    return score(*[F.col(c) for c in feature_cols])
