"""Corpus-level vocabulary statistics — the tokenizer-training /
corpus-analysis prep step of a training-data pipeline: term frequencies,
document frequencies, and a deterministic top-k over the whole corpus.

Shape at scale: explode(words) → ONE hash-aggregate keyed by the term
(map-side partial counts absorb the per-document skew — a term appearing
1M times in one partition shuffles as a single (term, count) row), then a
single-reducer top-k only over the already-aggregated term table. The
document body never shuffles; the term table is orders of magnitude
smaller than the corpus (vocabulary grows ~O(corpus^0.5), Heaps' law).

Top-k is tie-broken by the term itself (suite determinism rule: every
top-k/limit is tie-broken by a unique key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def term_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(term, tf, df) — corpus term frequency and document frequency from
    one explode + one aggregate (count + count_distinct share the
    grouping)."""
    words = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.trim(normalized_text(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.length("term") > 0)
    return words.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.count_distinct("doc").alias("df"),
    )


def top_k_terms(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """Top-k corpus terms by frequency, ties broken by term; adds the
    frequency rank. The window is a single-reducer sort over the term
    TABLE (not the corpus) — the standard final step after pre-aggregation;
    for huge vocabularies switch to orderBy(...).limit(k), which Spark
    executes as per-partition partial top-k + merge."""
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return (
        term_table(df, text_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def vocab_summary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-row corpus summary: vocabulary size, total tokens, hapax count
    (terms occurring once — the long-tail mass a tokenizer won't merge),
    and type-token ratio."""
    t = term_table(df, text_col, id_col)
    return t.agg(
        F.count("*").alias("vocab_size"),
        F.sum("tf").alias("total_tokens"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0)).alias("hapax_terms"),
        F.round(F.count("*") / F.sum("tf"), 6).alias("type_token_ratio"),
    )
