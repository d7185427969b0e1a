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

# Token-row gate for the self-join's big-corpus path (see
# prefix_filtered_candidates): dfreq/index sides built from more rows
# than this deserialize far past the heap's broadcast budget, and the
# candidate volume needs an explicitly-sized dedup.
_BIG_TOKEN_ROWS = 10_000_000

_EPS = 1e-9


def _tok_table(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int
) -> DataFrame:
    # exploded=True: the explode is applied DIRECTLY over the staged
    # word-array frame. Exploding the array through an intermediate
    # single-reference select (the old form here) collapses the alias
    # into the Generate and re-evaluates the whole normalize→split→
    # shingle→distinct chain per OUTPUT element — measured 20.5 s vs
    # 1.4 s for this table at sf0.1 (the shingle_table docstring's
    # 7× trap, round 11 edition).
    return shingle_table(
        df, text_col, id_col, shingle_k, distinct=True, exploded=True
    ).withColumnRenamed("s", "tok")


def _prefix_postings(
    tok: DataFrame, dfreq: DataFrame, threshold: float
) -> DataFrame:
    """(doc, sz, tok) inverted-index rows holding only each document's
    rarest-first prefix under the (tok_df, tok) total order. Tokens
    missing from `dfreq` order as df=0 (rarest) — in the incremental form
    a token the corpus has never seen can't match any corpus posting, so
    placing it early only spends prefix slots, never loses a pair."""
    ordered = (
        tok.join(dfreq, "tok", "left")
        .select(
            "doc", "tok", F.coalesce("tok_df", F.lit(0)).alias("tok_df")
        )
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
    return ordered.select(
        "doc",
        size.alias("sz"),
        F.explode(F.slice("_o", F.lit(1), plen)).alias("_pt"),
    ).select("doc", "sz", F.col("_pt.tok").alias("tok"))


def _cap_postings(pre: DataFrame, max_posting_size: int) -> DataFrame:
    posting_sizes = pre.groupBy("tok").agg(F.count(F.lit(1)).alias("_psz"))
    return pre.join(
        F.broadcast(posting_sizes.filter(F.col("_psz") > max_posting_size)),
        "tok",
        "left_anti",
    )


def _length_compatible(a_sz, b_sz, threshold: float):
    return (
        b_sz.cast("double") >= F.lit(threshold) * a_sz - F.lit(_EPS)
    ) & (a_sz.cast("double") >= F.lit(threshold) * b_sz - F.lit(_EPS))


def token_df_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """(tok, tok_df) document frequencies — the global token order the
    prefix filter ranks by. Persist alongside :func:`prefix_index` for
    the incremental form."""
    return (
        _tok_table(df, text_col, id_col, shingle_k)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tok_df"))
    )


def prefix_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    dfreq: DataFrame | None = None,
) -> DataFrame:
    """The corpus-side prefix inverted index (doc, sz, tok) — persist it
    (plus :func:`token_df_table`) and each ingest probes the INDEX, never
    the corpus text. Pass the persisted `dfreq` when extending an
    existing index so old and new entries rank under the SAME order (the
    prefix-filter completeness theorem needs one consistent total order,
    not a fresh one per ingest)."""
    if dfreq is None:
        dfreq = token_df_table(df, text_col, id_col, shingle_k)
    return _prefix_postings(
        _tok_table(df, text_col, id_col, shingle_k), dfreq, threshold
    )


def prefix_filtered_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_posting_size: int | None = None,
    shingles: DataFrame | None = None,
    n_token_rows: int | None = None,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs — a SUPERSET of all pairs with
    distinct-shingle Jaccard >= threshold.

    `max_posting_size` optionally drops prefix tokens whose postings list
    exceeds the cap — that TRADES exactness for a hard skew bound (same
    contract as LSH's max_bucket_size); leave None for the exact join.

    `shingles` optionally supplies a prebuilt (doc, sh: array) distinct-
    shingle table (the quality.word_table sharing pattern): the df-count
    and postings passes then read the SAME frame instead of re-running
    the normalize→split→shingle chain once each — pass a checkpointed
    frame so both consumers read materialized blocks.

    `n_token_rows` optionally supplies an already-computed token-row
    count for the big-path gate (a caller that also verifies — see
    jaccard_similarity_join — computes it once and shares it), skipping
    the gate job entirely.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if shingles is None:
        tok = _tok_table(df, text_col, id_col, shingle_k)
    else:
        tok = shingles.select("doc", F.explode("sh").alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))

    def _postings(dfreq_side: DataFrame) -> DataFrame:
        pre = _prefix_postings(tok, dfreq_side, threshold)
        if max_posting_size is not None:
            pre = _cap_postings(pre, max_posting_size)
        return pre

    def _cand(pre: DataFrame, hint: str | None) -> DataFrame:
        if hint:
            pre = pre.hint(hint)
        a, b = pre.alias("a"), pre.alias("b")
        # length filter: J >= t forces t*|x| <= |y| (both directions);
        # the epsilon again errs toward keeping the candidate
        return a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc") < F.col("b.doc"))
            & _length_compatible(F.col("a.sz"), F.col("b.sz"), threshold),
        ).select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))

    # Size the plan BEFORE running any join (the 100x probe lesson, r12):
    # one cheap count picks the path. When the caller supplied a
    # (checkpointed) shingle table, the token-row count is Σ size(sh) over
    # its materialized blocks — no re-run of the normalize→shingle chain
    # (ADVICE r12: the bare tok.count() gate re-tokenized the corpus on
    # every call, including the small path). Past ~10M token rows two OOM
    # classes fire together (both hit in the probe):
    #  * AQE converts a sort-merge join to broadcast off COMPRESSED
    #    shuffle stats; the deserialized hash relation of a multi-M-row
    #    dfreq/index side is 10-50x the estimate → heap OOM ("not enough
    #    memory to build and broadcast"). Merge hints survive AQE
    #    replanning, so the big path pins every join to shuffle —
    #    including the dfreq join inside the postings build, which
    #    otherwise OOMs before the self-join is even planned.
    #  * a bare distinct's partial hash agg is sized by the join's
    #    AQE-coalesced fat partitions → dedup_edges with explicit width,
    #    sized from the exact pre-verify bound Σ_tok C(posting,2) (one
    #    map-side-combined agg over the index — linear, and the skew
    #    diagnostic a production run wants printed anyway).
    # Below the gate the r11 plan is kept UNCHANGED (AQE broadcasting
    # the small dfreq table is right there, and no extra estimate job).
    # On the big path the postings table is localCheckpoint'd so the
    # candidate-bound estimate and the self-join share ONE index build
    # (ADVICE r12: it was computed twice at exactly the scale where it
    # is most expensive).
    import math

    from .scaling import dedup_edges

    if n_token_rows is not None:
        n_tok = n_token_rows
    elif shingles is not None:
        n_tok = shingles.agg(F.sum(F.size("sh"))).first()[0] or 0
    else:
        n_tok = tok.count()
    if n_tok <= _BIG_TOKEN_ROWS:
        return _cand(_postings(dfreq), None).distinct()
    pre = _postings(dfreq.hint("merge")).localCheckpoint(eager=False)
    est_row = (
        pre.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("est"))
        .first()
    )
    est = int(est_row["est"] or 0)
    parts = max(1, math.ceil(est / 1_000_000))
    return dedup_edges(
        _cand(pre, "merge"), ["doc_a", "doc_b"], parts, est
    )


def prefix_filtered_candidates_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_posting_size: int | None = None,
    corpus_index: DataFrame | None = None,
    corpus_dfreq: DataFrame | None = None,
) -> DataFrame:
    """EXACT-Jaccard candidates between a NEW batch and the EXISTING
    corpus — the incremental twin of
    :func:`dedup.minhash_lsh_candidates_incremental`, with the exactness
    guarantee LSH gives up: every (new, corpus) pair with Jaccard >=
    threshold appears in the output.

    Returns (new_doc, corpus_doc). Pairs WITHIN the new batch are
    :func:`prefix_filtered_candidates` on the batch alone — compose both
    for a full ingest check.

    Scale shape: the batch's prefix postings BROADCAST into the probe of
    the corpus index, so the corpus never reshuffles; pass the persisted
    ``corpus_index`` + ``corpus_dfreq`` (the production pattern — build
    once with :func:`prefix_index` / :func:`token_df_table`, append each
    accepted batch's postings) and the per-ingest cost is one scan of the
    INDEX, not the corpus text. The batch ranks its tokens under the
    corpus's (possibly stale) document-frequency order — completeness
    only needs ONE consistent total order across both sides, and tokens
    the corpus has never seen rank as df=0: they enter the batch prefix
    early but match no corpus posting, so they cost prefix slots, never
    pairs. As the true frequencies drift the prefixes stay CORRECT, just
    gradually less selective — refresh dfreq (and rebuild the index) on
    the compaction cadence, the same lifecycle as the LSH band store.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if corpus_index is None or corpus_dfreq is None:
        if corpus_df is None:
            raise ValueError(
                "pass corpus_df or (corpus_index, corpus_dfreq)"
            )
        if corpus_dfreq is None:
            corpus_dfreq = token_df_table(
                corpus_df, text_col, id_col, shingle_k
            )
        if corpus_index is None:
            corpus_index = prefix_index(
                corpus_df, text_col, id_col, threshold, shingle_k,
                dfreq=corpus_dfreq,
            )
    if max_posting_size is not None:
        corpus_index = _cap_postings(corpus_index, max_posting_size)
    new_pre = _prefix_postings(
        _tok_table(new_df, text_col, id_col, shingle_k),
        corpus_dfreq,
        threshold,
    )
    c, n = corpus_index.alias("c"), new_pre.alias("n")
    return (
        c.join(
            F.broadcast(n),
            (F.col("c.tok") == F.col("n.tok"))
            & _length_compatible(F.col("n.sz"), F.col("c.sz"), threshold),
        )
        .select(
            F.col("n.doc").alias("new_doc"),
            F.col("c.doc").alias("corpus_doc"),
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
    filtered candidates, then candidates-only exact verification.

    The distinct-shingle table is computed ONCE and checkpointed; the
    df-count, postings, and both verify sides read the materialized
    blocks (four shingle-chain evaluations otherwise — measured 8.2 s →
    5.3 s at sf0.1 after the r11 staging, on top of the 22 s → 8.2 s
    _tok_table explode fix). The token-row gate is computed once here
    and shared with the candidate generator; above the gate the VERIFY
    joins are pinned .hint("shuffle_hash") on the shingle side — AQE
    otherwise converts the candidates ⋈ shingle-table SMJ to broadcast
    off the checkpointed table's compressed stats, and the deserialized
    array-heavy hash relation is the r12 10-50x class ("not enough
    memory to build and broadcast", reproduced solo at 100x in r13 on
    exactly this join). shuffle_hash, not merge: a merge hint makes the
    SECOND verify join SORT the 31M-row array-carrying stream from the
    first (executor heap OOM in the sort read-ahead, also reproduced);
    the shuffle-hash build side is the per-partition slice of the
    corpus-sized shingle table — thousands of rows — while the fat
    candidate stream is only shuffled, never sorted."""
    sh = shingle_table(
        df, text_col, id_col, shingle_k, distinct=True
    ).localCheckpoint(eager=False)
    n_tok = int(sh.agg(F.sum(F.size("sh"))).first()[0] or 0)
    cand = prefix_filtered_candidates(
        df, text_col, id_col, threshold, shingle_k, max_posting_size,
        shingles=sh, n_token_rows=n_tok,
    )
    verify_sh = sh.hint("shuffle_hash") if n_tok > _BIG_TOKEN_ROWS else sh
    return ngram_jaccard(
        df, cand, text_col, id_col, shingle_k, shingles=verify_sh
    ).filter(F.col("jaccard") >= threshold - _EPS)
