"""Trainable text-model queries — the operators that LEARN filters from
the corpus rather than evaluating hand-written ones (beyond the reference,
which has no trainable text path: its BERT/LSTM models degrade to rule
features, SURVEY §2.8 M6/M7).

Mostly rows-only by construction (iterative training has no
single-statement SQL equivalent); the learning math is pinned by
NumPy-replay parity and holdout-accuracy tests in
tests/test_text_classifier.py. The exception is model_eval (ranking
metrics are a one-pass grouped window — oracled since round 12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents", fan_out=True)


def _weak_label(col):
    """Weak-supervision seed rule (the FineWeb-Edu / DCLM bootstrap shape:
    an annotator labels a slice, a hashed-ngram linear model distills it):
    a doc is 'streaming-themed' when stream+batch mentions outnumber
    scan+sort mentions. Linearly separable in the averaged hashed
    features, so the trainer's job is to recover it through the buckets."""
    lo = F.lower(col)

    def c(w):
        return F.regexp_count(lo, F.lit(rf"\b{w}\b"))

    return (c("stream") + c("batch") > c("scan") + c("sort")).cast("int")


# ---------------------------------------------------------------------------
# fastText-style hashed n-gram classifier, trained IN Spark (broadcast
# weights / decimal-summed gradients, ml/text_classifier.py): train on the
# 80% id-hash split, score every doc. Output: per-doc label, probability,
# prediction, and holdout membership — enough to recompute the confusion
# matrix downstream.
# ---------------------------------------------------------------------------
def q_text_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.text_classifier import (
        hashed_features,
        score_logreg,
        train_logreg,
    )

    docs = _docs(spark, sf_dir)
    # tokenize-once rule: the whole corpus is featurized and weak-labeled
    # exactly ONCE; the training slice is a filter over the shared
    # checkpointed frames (hashed features are per-doc independent, so
    # filtering the feature table == featurizing the filtered corpus)
    labeled = docs.select(
        F.col("doc_id").alias("doc"), _weak_label(F.col("text")).alias("y")
    ).localCheckpoint(eager=False)
    feats_all = hashed_features(
        docs, "text", "doc_id", 1024, bigrams=False
    ).localCheckpoint(eager=False)
    model = train_logreg(
        feats_all.filter("doc % 5 < 4"),
        labeled.filter("doc % 5 < 4"),
        n_buckets=1024,
        iters=20,
        lr=5.0,
        l2=0.0,
    )
    scored = score_logreg(feats_all, model)
    # shuffle_hash: the label side is a checkpointed RDD with no stats, so
    # the planner falls back to sort-merge and sorts BOTH data-sized
    # frames; hash-building the per-doc score side drops the two sorts
    # with no broadcast cap (both sides are data-sized at scale)
    return (
        labeled.join(scored.hint("shuffle_hash"), "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            "y",
            "prob",
            "pred",
            (F.col("doc") % 5 == 4).cast("int").alias("holdout"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BPE tokenization (ACL'16): merges trained from the distributed word-
# frequency table (driver holds only the vocabulary — Heaps'-law-small),
# applied via the broadcast pandas_udf. Output keeps the per-doc token
# count, distinct-token count, and an md5 of the token stream so any
# change in training or encoding is visible in the row values.
# ---------------------------------------------------------------------------
def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bpe import apply_bpe, train_bpe, word_freq_table

    docs = _docs(spark, sf_dir)
    merges = train_bpe(word_freq_table(docs, "text"), n_merges=200)
    return (
        apply_bpe(docs, "text", "doc_id", merges)
        .select(
            F.col("doc").alias("doc_id"),
            "n_tokens",
            F.size(F.array_distinct("tokens")).alias("n_types"),
            F.md5(F.concat_ws(" ", "tokens")).alias("token_hash"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Stupid Backoff trigram LM scoring (CCNet's filtering setup): the LM is
# counted from a reference slice of the corpus (every 3rd doc — the
# "Wikipedia" stand-in), the whole corpus is scored against it, so the
# backoff and OOV branches actually fire. Rows-only: transcendental log10;
# brute-force reference parity in tests/test_ngram_lm.py.
# ---------------------------------------------------------------------------
def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import ngram_lm_logprob

    docs = _docs(spark, sf_dir)
    lm = docs.filter("doc_id % 3 = 0")
    return (
        ngram_lm_logprob(docs, lm_df=lm)
        .select(
            F.col("doc").alias("doc_id"),
            "n_scored",
            F.round("mean_sb_logprob", 6).alias("mean_sb_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece's second algorithm, Kudo ACL'18) tokenization:
# EM+prune trains driver-side on the distributed word-frequency table
# (vocabulary-sized, like BPE's merges), Viterbi encoding applies via the
# broadcast pandas_udf. Same observable columns as bpe_tokens so the two
# subword algorithms are directly comparable per document. Rows-only:
# iterative EM training has no SQL form; lattice hand-checks + roundtrip
# parity live in tests/test_unigram_lm.py.
# ---------------------------------------------------------------------------
def q_unigram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bpe import word_freq_table
    from ..functions.unigram_lm import apply_unigram, train_unigram

    docs = _docs(spark, sf_dir)
    # max_terms bounds the driver-side EM input (Heaps'-law-small; the
    # same cap discipline as BPE's merge training)
    model = train_unigram(
        word_freq_table(docs, "text", max_terms=20_000), vocab_size=300
    )
    return (
        apply_unigram(docs, "text", "doc_id", model)
        .select(
            F.col("doc").alias("doc_id"),
            "n_tokens",
            F.size(F.array_distinct("tokens")).alias("n_types"),
            F.md5(F.concat_ws(" ", "tokens")).alias("token_hash"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Stupid Backoff SERVE path (CCNet's actual production topology): the LM
# is counted ONCE from the reference slice, pruned (min_count=2, KenLM
# style) and persisted as a parquet+meta artifact; scoring loads the
# fixed model and broadcasts its count tables, so the corpus scan is the
# only non-broadcast input — the shape that scores a 100 TB shard with
# zero LM-side shuffle. Persisted per fixture CONTENT (same fingerprint
# discipline as the PQ serve index); rows-only (transcendental log10);
# roundtrip/pruning parity in tests/test_ngram_io.py.
# ---------------------------------------------------------------------------
def q_ngram_lm_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..functions import ngram_io
    from ..operators.quality import fit_ngram_lm, ngram_lm_logprob
    from .dedup_q import _fixture_fingerprint

    docs = _docs(spark, sf_dir)
    base = os.path.basename(os.path.normpath(sf_dir))
    fp = _fixture_fingerprint(
        os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    )
    idx = f"/tmp/spark_graft_ngram_lm_{base}_{fp}"
    if not os.path.exists(os.path.join(idx, "meta.json")):
        ngram_io.save_ngram_lm(
            fit_ngram_lm(docs.filter("doc_id % 3 = 0")), idx, min_count=2
        )
    lm = ngram_io.load_ngram_lm(spark, idx)
    return (
        ngram_lm_logprob(docs, lm=lm)
        .select(
            F.col("doc").alias("doc_id"),
            "n_scored",
            F.round("mean_sb_logprob", 6).alias("mean_sb_logprob"),
        )
        .orderBy("doc_id")
    )


# Isotonic score calibration (Zadrozny & Elkan KDD'02 via MLlib PAV):
# a deterministic pseudo-score with known miscalibration P(y=1|s) = s²
# (md5 coin) is calibrated on the events fixture; output is the 10-bin
# reliability table for raw vs calibrated probabilities. Rows-only
# (MLlib fit — no SQL twin); Brier improvement, monotonicity, and
# persistence are pinned in tests/test_calibration.py.
def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_bigint
    from ..ml.calibration import (
        calibrate,
        fit_isotonic_calibrator,
        reliability_table,
    )

    ev = load_table(spark, sf_dir, "events")
    score = ((F.col("event_id") * 37) % 1000) / 1000.0
    coin = (md5_bigint(F.col("event_id").cast("string"), "cal:") % 1_000_000) / 1e6
    scored = ev.select(
        "event_id",
        score.alias("score"),
        F.when(coin < score * score, 1.0).otherwise(0.0).alias("label"),
    )
    model = fit_isotonic_calibrator(scored, "score", "label")
    out = calibrate(scored, model, "score")
    # one binning (by raw score), three means per bin: the calibrated
    # column must sit near frac_pos where the raw score sits near s
    b = F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9))
    return (
        out.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("score"), 6).alias("raw_mean"),
            F.round(F.avg("calibrated"), 6).alias("cal_mean"),
            F.round(F.avg("label"), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )


# Distributed ranking-metric evaluation (ml/evaluation.py): ROC-AUC in the
# Mann-Whitney grouped-rank form (integer-exact numerator), KS statistic,
# and average precision over the deterministic miscalibrated pseudo-score
# from q_score_calibration, per event_type. ORACLED since round 12 (the
# pattern_buckets panel merge freed the slot; bit-exact DuckDB window-SQL
# parity for auc/ks had been pinned in tests/test_evaluation.py since r9).
# Cross-engine exactness notes:
#   * auc/ks: integer numerators, one IEEE division — bit-exact;
#   * ap: per-term rationals are bit-exact, but the cross-group sum is a
#     double fold — the oracle replays Spark's ascending-score fold with
#     list_reduce over an ORDER BY s list aggregate (same order, same
#     adds, bit-identical);
#   * 6-dp rounding via floor(x*1e6 + 0.5)/1e6 on BOTH sides — ratios of
#     integers CAN land on exact .xxxxxx5 decimal ties where Spark
#     (decimal HALF_UP) and DuckDB (binary round) disagree (the gap_fill
#     rule; values are non-negative so the floor form is a true round).
def q_model_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_bigint
    from ..ml.evaluation import binary_eval

    ev = load_table(spark, sf_dir, "events")
    score = ((F.col("event_id") * 37) % 1000) / 1000.0
    coin = (md5_bigint(F.col("event_id").cast("string"), "ev:") % 1_000_000) / 1e6
    scored = ev.select(
        "event_type",
        score.alias("score"),
        F.when(coin < score * score, 1).otherwise(0).alias("label"),
    )
    m = binary_eval(scored, "score", "label", by=["event_type"])

    def r6(c):  # tie-safe 6-dp round (metrics are in [0, 1], no negatives)
        return F.floor(F.col(c) * 1e6 + 0.5) / 1e6

    return m.select(
        "event_type",
        "n",
        "pos",
        r6("auc").alias("auc"),
        r6("ks").alias("ks"),
        r6("ap").alias("ap"),
    ).orderBy("event_type")


SQL_MODEL_EVAL = """
WITH scored AS (
  SELECT event_type,
         (event_id * 37) % 1000 / 1000.0 AS score,
         CASE WHEN ('0x' || substr(md5('ev:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 / 1e6
                   < ((event_id * 37) % 1000 / 1000.0) * ((event_id * 37) % 1000 / 1000.0)
              THEN 1 ELSE 0 END AS label
  FROM events
), g AS (
  SELECT event_type, score AS s,
         SUM(label)::BIGINT AS p, SUM(1 - label)::BIGINT AS n
  FROM scored GROUP BY event_type, score
), w AS (
  SELECT event_type, s, p, n,
         SUM(p) OVER (PARTITION BY event_type) AS ptot,
         SUM(n) OVER (PARTITION BY event_type) AS ntot,
         SUM(p) OVER (PARTITION BY event_type ORDER BY s
                      ROWS UNBOUNDED PRECEDING) AS cum_p,
         SUM(n) OVER (PARTITION BY event_type ORDER BY s
                      ROWS UNBOUNDED PRECEDING) AS cum_n
  FROM g
), terms AS (
  SELECT event_type, s, p, n, ptot, ntot,
         p * (2 * (cum_n - n) + n) AS auc_num,
         ABS(cum_p * ntot - cum_n * ptot) AS ks_num,
         -- same tree as Spark's _p * tp_ge / all_ge: exact-integer
         -- product, ONE IEEE division per term
         p * (ptot - cum_p + p)::DOUBLE / (ptot + ntot - cum_p - cum_n + p + n) AS ap_term
  FROM w
), agg AS (
  SELECT event_type,
         SUM(p + n)::BIGINT AS n,
         SUM(p)::BIGINT AS pos,
         ANY_VALUE(ptot)::BIGINT AS ptot,
         ANY_VALUE(ntot)::BIGINT AS ntot,
         SUM(auc_num)::DOUBLE AS auc_num,
         MAX(ks_num)::DOUBLE AS ks_max,
         -- replay Spark's ascending-score left fold exactly
         list_reduce(list_prepend(0.0::DOUBLE, list(ap_term ORDER BY s)),
                     (acc, x) -> acc + x) AS ap_sum
  FROM terms GROUP BY event_type
)
SELECT event_type, n, pos,
       CASE WHEN ptot > 0 AND ntot > 0 THEN
         FLOOR(auc_num / (2 * ptot * ntot)::DOUBLE * 1e6 + 0.5) / 1e6 END AS auc,
       CASE WHEN ptot > 0 AND ntot > 0 THEN
         FLOOR(ks_max / (ptot * ntot)::DOUBLE * 1e6 + 0.5) / 1e6 END AS ks,
       CASE WHEN ptot > 0 AND ntot > 0 THEN
         FLOOR(ap_sum / ptot * 1e6 + 0.5) / 1e6 END AS ap
FROM agg ORDER BY event_type
"""


QUERIES = {
    "text_classifier": q_text_classifier,
    "bpe_tokens": q_bpe_tokens,
    "ngram_lm": q_ngram_lm,
    "ngram_lm_serve": q_ngram_lm_serve,
    "unigram_tokens": q_unigram_tokens,
    "score_calibration": q_score_calibration,
    "model_eval": q_model_eval,
}

ORACLES: dict[str, str] = {"model_eval": SQL_MODEL_EVAL}
