"""Exact duplicate-span detection — the substring-level dedup mode of
Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL'22, arXiv:2107.06499): find maximal token runs that occur verbatim
more than once in the corpus (within- OR cross-document, like the paper's
suffix-array repeats) and optionally cut them out of the text.

Reference behavior: the reference system deduplicates events by exact key
only (Redis SETNX per transaction id); substring-level text dedup has no
reference counterpart and follows the published training-data-pipeline
design instead.

Spark-first shape (no suffix array — that is a single-machine construction;
the distributed equivalent is hashed k-token grams, the standard
MapReduce-able approximation the paper itself notes):

1. one scan → (doc, pos, h): md5 hash of every k-token window, via the
   staged-array + posexplode idiom from :mod:`dedup` (split computed once
   per doc, grams codegen'd);
2. one map-side-combined shuffle on ``h`` → gram occurrence counts;
3. one equi-join on ``h`` keeps only duplicated gram positions (the join
   input is already pruned to duplicated hashes — at corpus scale the
   overwhelming majority of grams are unique and never shuffle twice);
4. one per-doc sort → gaps-and-islands merge of overlapping gram windows
   into maximal spans.

Every step is linear scans + equi-shuffles on small derived keys; nothing
is all-pairs and nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint
from ..functions.text import normalized_text
from .dedup import _materialize


def _gram_hash_array(words: Column, k: int) -> Column:
    """Array of md5-derived 60-bit hashes, one per k-token gram; EMPTY for
    docs shorter than k tokens (no whole-text fallback here, unlike
    shingling — a short doc duplicated verbatim is
    :func:`dedup.exact_dedup`'s job; a span operator must not report a span
    longer than the document). Hashing INSIDE the array keeps the
    materialized column at 8 bytes per gram instead of k tokens of text."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), n - k)
    return F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: md5_bigint(
                F.concat_ws(
                    " ",
                    *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)],
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def gram_position_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    materialize: str = "local_checkpoint",
    materialize_path: str | None = None,
) -> DataFrame:
    """(doc, pos, h) — md5-derived 60-bit hash of the k-token gram starting
    at 0-based token position ``pos`` of the normalized text.

    The hash array is MATERIALIZED before the posexplode (strategies as in
    :func:`dedup._materialize`): Generate re-evaluates its generator
    expression per OUTPUT element, so exploding the k-wide gram transform
    directly is O(n²·k) per document — measured 11.8 s vs 1.3 s at sf0.001.
    Materializing also computes the scan once for the two consumers in
    :func:`duplicate_spans` (the count aggregate and the position join).
    The word split is staged as a bound column in its own select (multiple
    references through size/sequence/transform keep CollapseProject from
    re-inlining it) — the same O(n) staging rule as
    :func:`dedup.shingle_table`.
    """
    staged = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(normalized_text(F.col(text_col))), r"\s+").alias("_w"),
    )
    arr = staged.select("doc", _gram_hash_array(F.col("_w"), k).alias("_g"))
    arr = _materialize(arr, materialize, materialize_path)
    return arr.select("doc", F.posexplode(F.col("_g")).alias("pos", "h"))


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_count: int = 2,
    materialize: str = "local_checkpoint",
    materialize_path: str | None = None,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A k-gram is *duplicated* when its hash occurs >= ``min_count`` times in
    the whole corpus — total occurrences, so a phrase repeated inside one
    document counts, matching the suffix-array semantics of Lee et al.
    (their repeats include within-document ones). Overlapping duplicated
    gram windows merge into one span (positions p1 < p2 merge iff
    p2 - p1 < k, i.e. their k-token coverages share at least one token;
    merely abutting coverages stay separate spans).

    Returns (doc, span_start, span_end, span_tokens, n_dup_grams) with
    token positions 0-based inclusive over the normalized-text word array.

    Scale: the groupBy and the join both shuffle on the gram hash with
    map-side partial aggregation; the islands window and the span groupBy
    run over only the duplicated positions (a tiny fraction of the corpus).
    """
    grams = gram_position_table(
        df, text_col, id_col, k, materialize=materialize, materialize_path=materialize_path
    )
    dup_h = (
        grams.groupBy("h")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h")
    )
    marked = grams.join(dup_h, "h").select("doc", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    # gaps-and-islands: a new span starts where the previous duplicated
    # gram's coverage [lag, lag+k-1] no longer overlaps [pos, pos+k-1]
    new_span = (
        F.when(F.col("pos") - F.lag("pos", 1).over(w) >= k, 1)
        .otherwise(0)
        .cast("int")
    )
    islands = marked.select(
        "doc",
        "pos",
        F.sum(F.coalesce(new_span, F.lit(0))).over(w).alias("_span"),
    )
    return (
        islands.groupBy("doc", "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count("*").alias("n_dup_grams"),
        )
        .select(
            "doc",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_dup_grams",
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = "stripped_text",
) -> DataFrame:
    """Cut every duplicated span's tokens out of each document, rebuilding
    the text from the surviving tokens of the NORMALIZED word array (the
    positions in ``spans`` index that array, so original whitespace and
    punctuation inside removed regions do not survive — same contract as
    the paper's byte-range cuts, expressed over tokens).

    The span list joins in aggregated per doc (a few (start, end) structs —
    tiny next to the text column) and the token filter is a higher-order
    `filter(..., (w, i) -> ...)` with an `exists` over the doc's spans:
    O(tokens x spans-per-doc) interpreted work, acceptable because
    spans-per-doc is small by construction; documents without spans skip
    the lambda entirely via the null check.
    """
    agg = spans.groupBy(F.col("doc").alias(id_col)).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = df.join(agg, id_col, "left")
    words = F.split(F.trim(normalized_text(F.col(text_col))), r"\s+")
    kept = F.filter(
        words,
        lambda w, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    out = F.when(F.col("_spans").isNull(), F.trim(normalized_text(F.col(text_col)))).otherwise(
        F.concat_ws(" ", kept)
    )
    return joined.withColumn(out_col, out).drop("_spans")
