"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin).

MinHash-LSH (operators/dedup.py) finds near-dup pairs PROBABILISTICALLY —
its banding has both false positives (filtered by the verify step) and
false negatives (tuned, never zero). This operator is the EXACT
complement: every pair with n-gram Jaccard >= t is returned, none missed,
using the prefix-filtering principle (Bayardo et al., WWW'07; Xiao et
al., WWW'08) instead of an all-pairs comparison:

  order every document's distinct shingles by ascending global document
  frequency (rarest first, ties by token); a pair with Jaccard >= t MUST
  share at least one token among the first |x| - ceil(t*|x|) + 1 tokens
  of each side. Only those prefix tokens enter the inverted index.

Scale shape (the reason this survives 100 TB where "explode and
self-join every token" does not):
  * the inverted-index join keys are the RAREST tokens of each document —
    exactly the ones with the smallest postings lists; frequent tokens
    (the skewed join keys) are never indexed unless a document is nearly
    all-frequent-tokens, and the higher the threshold the shorter the
    prefixes;
  * the verify step only materializes shingle arrays for candidate pairs
    (reusing :func:`ngram_jaccard`'s candidates-only join);
  * document frequencies come from one map-side-combined aggregation; the
    per-document prefix is computed by sorting each document's OWN token
    list (array sort — no global rank, no single-partition window).

The conservative epsilon on ceil() guards the IEEE boundary (t*|x|
landing a hair under an integer): a one-token-longer prefix only adds
candidates — completeness is never at risk, the verify step keeps
precision exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ngram_jaccard, shingle_table

_EPS = 1e-9


def prefix_filtered_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_posting_size: int | None = None,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs — a SUPERSET of all pairs with
    distinct-shingle Jaccard >= threshold.

    `max_posting_size` optionally drops prefix tokens whose postings list
    exceeds the cap — that TRADES exactness for a hard skew bound (same
    contract as LSH's max_bucket_size); leave None for the exact join.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = shingle_table(df, text_col, id_col, shingle_k, distinct=True)
    tok = sh.select("doc", F.explode("sh").alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))
    ordered = (
        tok.join(dfreq, "tok")
        .groupBy("doc")
        .agg(
            F.sort_array(F.collect_list(F.struct("tok_df", "tok"))).alias(
                "_o"
            )
        )
    )
    size = F.size("_o")
    # prefix length |x| - ceil(t*|x|) + 1; epsilon lengthens the prefix on
    # IEEE ties (safe direction)
    plen = (
        size
        - F.ceil(F.lit(threshold) * size - F.lit(_EPS)).cast("int")
        + 1
    )
    pre = ordered.select(
        "doc",
        size.alias("sz"),
        F.explode(F.slice("_o", F.lit(1), plen)).alias("_pt"),
    ).select("doc", "sz", F.col("_pt.tok").alias("tok"))
    if max_posting_size is not None:
        posting_sizes = pre.groupBy("tok").agg(
            F.count(F.lit(1)).alias("_psz")
        )
        pre = pre.join(
            F.broadcast(
                posting_sizes.filter(F.col("_psz") > max_posting_size)
            ),
            "tok",
            "left_anti",
        )
    a, b = pre.alias("a"), pre.alias("b")
    # length filter: J >= t forces t*|x| <= |y| (both directions); the
    # epsilon again errs toward keeping the candidate
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (
                F.col("b.sz").cast("double")
                >= F.lit(threshold) * F.col("a.sz") - F.lit(_EPS)
            )
            & (
                F.col("a.sz").cast("double")
                >= F.lit(threshold) * F.col("b.sz") - F.lit(_EPS)
            ),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
        .distinct()
    )


def jaccard_similarity_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_posting_size: int | None = None,
) -> DataFrame:
    """EXACT n-gram-Jaccard self-join: all (doc_a, doc_b, jaccard) with
    doc_a < doc_b and distinct-shingle Jaccard >= threshold — prefix-
    filtered candidates, then candidates-only exact verification."""
    cand = prefix_filtered_candidates(
        df, text_col, id_col, threshold, shingle_k, max_posting_size
    )
    return ngram_jaccard(df, cand, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold - _EPS
    )
