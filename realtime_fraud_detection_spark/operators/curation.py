"""The composed corpus-curation pipeline — the one-call form of the gate
stack the example wires by hand, for users who want "the standard clean"
rather than individual operators:

    raw → heuristic quality gate (C4/Gopher-style score)
        → Gopher repetition gate
        → C4 page rules
        → exact dedup (content-fingerprint survivors)
        → [optional] near-dup dedup (SimHash Hamming pairs → CC survivors)
        → [optional] cross-doc boilerplate line stripping

Every stage is one of this repo's tested operators; this module only
sequences them and counts what each gate removed (driver state = a few
scalars — the funnel report). Under `report=True` every stage boundary
is a LAZY localCheckpoint that the funnel count materializes (the
iterative-loop discipline: one action per stage, no plan growth), and
stage k−1's blocks are freed once stage k lands — without this, each
count replayed the ENTIRE upstream gate chain from the scan (the
round-8 composed-funnel probe measured the replay at ~6× the useful
work before any data even got large). Pass `report=False` to build the
plan fully lazily instead (one action total downstream, no intermediate
counts, no checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, quality_score
from . import quality as Q
from .scaling import RollingCheckpoint


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    gopher: bool = True,
    c4: bool = True,
    near_dup: bool = False,
    max_hamming: int = 4,
    max_bucket_size: int | None = None,
    strip_boilerplate: bool = False,
    boilerplate_min_docs: int = 2,
    report: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """(clean_docs, funnel) — `funnel` maps stage name → surviving doc
    count (empty when `report=False`). Survivor choice is deterministic
    everywhere (min id per fingerprint / component).

    `max_bucket_size` caps the simhash band buckets of the near-dup
    stage (passed through to
    :func:`dedup.simhash_near_dup_pairs`) — None keeps the exhaustive
    Hamming-ball guarantee; at corpus scale a hot band value (e.g. the
    all-zero band of very short docs) makes pair generation quadratic in
    that bucket, so production sets a cap and accepts the deterministic
    candidate drop (the SCALE.md hot-key rule)."""
    funnel: dict[str, int] = {}
    chain = RollingCheckpoint(docs.sparkSession)

    def note(stage: str, df: DataFrame) -> DataFrame:
        if report:
            # lazy checkpoint materialized by the funnel count; older
            # stages freed once this one lands (the returned frame is
            # always the NEWEST generation, so it stays valid)
            df = chain.roll(df)
            funnel[stage] = df.count()
            chain.free_prev()
        return df

    # the input count alone never justifies checkpointing the full raw
    # corpus — a re-scan is cheaper than doubling the biggest table's
    # block residency
    if report:
        funnel["input"] = docs.count()
    out = docs

    out = note(
        "quality_gate",
        out.filter(quality_score(F.col(text_col)) >= min_quality),
    )

    if gopher:
        # one tokenize for chars + all three gram subtrees (quality_filters
        # one-tokenize rule; repetition_stats would otherwise normalize 4x)
        words = Q.word_table(out, text_col, id_col).localCheckpoint(eager=False)
        rep = Q.repetition_stats(out, text_col, id_col, words=words)
        keep = rep.filter(Q.gopher_repetition_pass(rep)).select(id_col)
        out = note("gopher_gate", out.join(keep, id_col, "left_semi"))

    if c4:
        stats = Q.c4_line_stats(out, text_col, id_col)
        keep = stats.filter(Q.c4_page_pass(stats)).select(
            F.col("doc").alias(id_col)
        )
        out = note("c4_gate", out.join(keep, id_col, "left_semi"))

    # exact dedup: keep the minimum id per content fingerprint
    fp = out.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
    )
    survivors = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    out = note("exact_dedup", out.join(survivors, id_col, "left_semi"))

    if near_dup:
        from . import clustering as C
        from . import dedup as D

        pairs = D.simhash_near_dup_pairs(
            out,
            text_col,
            id_col,
            max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
        )
        comp = C.connected_components(
            pairs, vertices=out.select(id_col), vertex_col=id_col
        )
        keep = comp.groupBy("cluster").agg(F.min("doc").alias(id_col)).select(id_col)
        out = note("near_dup", out.join(keep, id_col, "left_semi"))

    if strip_boilerplate:
        stripped = Q.strip_boilerplate_lines(
            out, text_col, id_col, min_docs=boilerplate_min_docs
        )
        out = note(
            "boilerplate_strip",
            out.drop(text_col).join(
                stripped.select(
                    F.col("doc").alias(id_col),
                    F.col("stripped_text").alias(text_col),
                ),
                id_col,
            ),
        )

    return out, funnel


def leakage_free_splits(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    clusters: DataFrame | None = None,
    seed: str = "split:",
    max_hamming: int = 4,
    max_bucket_size: int | None = 2000,
) -> dict[str, DataFrame]:
    """Train/val/test splits that near-duplicates cannot straddle.

    `sampling.split_by_hash` on the doc id sends two near-identical
    documents to independent splits with probability 1 − Σ w² — at corpus
    scale that reliably plants near-copies of held-out documents in the
    training split (the train/test leakage Lee et al. ACL'22 §6.2 measure
    on C4). The fix is to split on the near-dup CLUSTER id: every member
    of a cluster shares one hash draw, so a cluster lands whole in exactly
    one split, while singleton documents (their own cluster) split exactly
    as the plain doc-id split would — same weights law, same determinism
    guarantees, disjoint and exhaustive.

    `clusters` is a (doc, cluster) frame — pass the one a prior
    `clean_corpus`/`dedup_clusters` run already computed, or leave None to
    derive it here (SimHash Hamming pairs → connected components, the
    clean_corpus stage). Docs absent from `clusters` fall back to their
    own id as the split key.

    Scale shape: clustering is the capped SimHash + CC machinery with its
    measured 100× bounds; the split adds ONE equi join on the id to tag
    each doc with its cluster, then pure range filters per split — no
    further shuffle.
    """
    from . import clustering as C
    from . import dedup as D
    from .sampling import split_by_hash

    if clusters is None:
        pairs = D.simhash_near_dup_pairs(
            df, text_col, id_col,
            max_hamming=max_hamming, max_bucket_size=max_bucket_size,
        )
        clusters = C.connected_components(
            pairs, vertices=df.select(id_col), vertex_col=id_col
        )
    tagged = (
        df.join(
            clusters.select(F.col("doc").alias(id_col), "cluster"),
            id_col,
            "left",
        )
        .withColumn("_split_key", F.coalesce(F.col("cluster"), F.col(id_col)))
        .drop("cluster")
    )
    return {
        name: part.drop("_split_key")
        for name, part in split_by_hash(
            tagged, "_split_key", weights, seed=seed
        ).items()
    }


def cell_balanced_sample(
    docs: DataFrame,
    emb: DataFrame,
    total_tokens: int,
    n_cells: int = 16,
    id_col: str = "doc_id",
    token_col: str = "n_chars",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Topic-balanced token budgeting: split a total token budget evenly
    across embedding-space cells (IVF coarse quantizer — the SemDeDup
    cell structure reused for MIXTURE SHAPING instead of dedup) and
    materialize each cell's budget as its minimal hash-ordered doc
    prefix. The anti-majority-topic dual of per-language budgets: a
    corpus dominated by one topic cluster cannot spend more than
    total/n_cells tokens on it, and small clusters are kept whole.

    Returns docs' rows (plus `cell`) for the selected prefix. Shapes:
    the quantizer fit is model-sized (driver-local under the fit gate,
    MLlib above), cell assignment is one Arrow scan, the budget
    realization is sampling.token_budget_sample's bucket-offset exact
    prefix sum — nothing here scans more than the corpus once.
    """
    from .sampling import token_budget_sample
    from .similarity import fit_coarse_quantizer

    if total_tokens <= 0 or n_cells <= 0:
        raise ValueError(
            f"need positive budget/cells, got {total_tokens}/{n_cells}"
        )
    _, cells = fit_coarse_quantizer(emb, n_cells, id_col=vec_id_col)
    tagged = docs.join(
        cells.select(F.col("nid").alias(id_col), "cell"), id_col
    )
    per_cell = total_tokens // n_cells
    budgets = {c: per_cell for c in range(n_cells)}
    return token_budget_sample(
        tagged, budgets, group_col="cell", token_col=token_col, id_col=id_col
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    smoothing: float = 0.5,
    normalize: bool = True,
) -> DataFrame:
    """Per-document importance log-weights for Data Selection via
    Importance Resampling (Xie et al., NeurIPS'23): estimate target and
    raw distributions over HASHED word uni+bi-gram buckets and score
    every raw document by the log-likelihood ratio of its grams,
    log w(x) = Σ_g [log p̂_target(b(g)) − log p̂_raw(b(g))] — documents
    that look like the target domain get high weight, generic ones get
    low. Returns (id_col, dsir_logw, n_grams).

    `normalize=True` scores the per-gram MEAN ratio instead of the sum:
    the paper chunks documents to fixed length before weighing; on
    variable-length corpora the raw sum makes length the dominant term,
    so the mean is the analogous length-controlled form (set False to
    reproduce the paper's sum on pre-chunked input).

    Shapes at 100 TB: both distribution estimates are one
    explode→md5-bucket→count aggregate (map-side combined, output
    n_buckets rows); the bucket log-ratio table is model-sized and
    BROADCASTS into the per-doc scoring join; per-doc weights are one
    more map-side-combined sum keyed by doc. Nothing shuffles
    event-granular rows twice, and the target sample is typically tiny
    (it is "what I wish my corpus looked like").

    Determinism: md5 bucketing + exact integer counts; the only floats
    are the final log-ratios, identical on any partitioning.
    """
    from ..functions.hashing import md5_bigint
    from ..functions.text import normalized_text

    def grams(df: DataFrame, doc: object = None) -> DataFrame:
        # target samples need no ids — bucket counts ignore `doc`
        staged = df.select(
            (F.col(id_col) if doc is None else doc).alias("doc"),
            F.filter(
                F.split(F.trim(normalized_text(F.col(text_col))), r"\s+"),
                lambda w: F.length(w) > 0,
            ).alias("ws"),
        )
        ws = F.col("ws")
        bi = F.transform(
            F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
            lambda w, i: F.concat_ws(" ", w, F.element_at(ws, i + 2)),
        )
        return staged.select(
            "doc", F.explode(F.concat(ws, bi)).alias("g")
        ).select(
            "doc",
            F.pmod(md5_bigint(F.col("g"), salt="dsir:"), F.lit(n_buckets)).alias(
                "b"
            ),
        )

    def bucket_logp(df: DataFrame, name: str) -> DataFrame:
        cnt = grams(df, doc=F.lit(0)).groupBy("b").agg(
            F.count(F.lit(1)).alias("c")
        )
        tot = cnt.agg(F.sum("c").alias("_n"))
        return cnt.join(F.broadcast(tot)).select(
            "b",
            F.log(
                (F.col("c") + F.lit(smoothing))
                / (F.col("_n") + F.lit(smoothing * n_buckets))
            ).alias(name),
        )

    # unseen buckets fall back to the smoothed floor log(a / (N + a*B)):
    # join misses are filled with each side's floor constant
    import math

    t_logp = bucket_logp(target, "_lt")
    r_logp = bucket_logp(raw, "_lr")
    ratios = t_logp.join(r_logp, "b", "full_outer")
    doc_b = grams(raw)
    t_tot = grams(target, doc=F.lit(0)).count()
    r_tot = doc_b.count()

    t_floor = math.log(smoothing / (t_tot + smoothing * n_buckets))
    r_floor = math.log(smoothing / (r_tot + smoothing * n_buckets))
    ratio = ratios.select(
        "b",
        (
            F.coalesce(F.col("_lt"), F.lit(t_floor))
            - F.coalesce(F.col("_lr"), F.lit(r_floor))
        ).alias("_lratio"),
    )
    per_doc = (
        doc_b.join(F.broadcast(ratio), "b", "left")
        .groupBy("doc")
        .agg(
            F.sum(F.coalesce(F.col("_lratio"), F.lit(t_floor - r_floor))).alias(
                "_s"
            ),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    logw = (
        (F.col("_s") / F.col("n_grams")) if normalize else F.col("_s")
    ).alias("dsir_logw")
    return per_doc.select(F.col("doc").alias(id_col), logw, "n_grams")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    seed: str = "dsir:",
    temperature: float = 1.0,
) -> DataFrame:
    """DSIR selection: k raw documents sampled without replacement with
    probability ∝ exp(dsir_logw / temperature) — the Gumbel-top-k
    realization (key = logw/T − log(−log u), u a deterministic md5 draw),
    which is exactly weighted sampling without replacement in LOG space
    (never exponentiates the weights, so extreme log-ratios cannot
    overflow). temperature→0 approaches deterministic top-k by weight;
    1.0 is the paper's sampled selection. Output: raw's rows + dsir_logw.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from ..functions.hashing import md5_bigint

    w = dsir_weights(
        raw, target, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    h = md5_bigint(F.col(id_col).cast("string"), salt=seed)
    u = (h.cast("double") + 1.0) / float((1 << 60) + 1)
    key = F.col("dsir_logw") / F.lit(temperature) - F.log(-F.log(u))
    return (
        raw.join(w.select(id_col, "dsir_logw"), id_col)
        .withColumn("_gk", key)
        .orderBy(F.desc("_gk"), F.asc(id_col))
        .limit(k)
        .drop("_gk")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Release-to-release corpus delta: what the next training run will
    actually see changed. Returns ``(summary, per_doc)``:

      per_doc: (doc_id, status, tokens_old, tokens_new) with status in
               {added, removed, changed, unchanged} — content identity is
               the md5 normalization fingerprint (functions/text.py), so
               whitespace/punct/case edits do NOT count as changes;
      summary: per status — n_docs, tokens (the release the docs live in:
               new for added/changed/unchanged, old for removed) and the
               net token_delta.

    One fingerprint+token projection per side, one full outer join on the
    id, one small aggregate — no text ever crosses the join (fingerprints
    and counts do), so the shuffle rows are ~50 bytes each at any corpus
    size. Pairs with :func:`corpus_report`: the report describes one
    release, the diff explains the step between two.
    """
    from ..functions.text import fingerprint, token_count_whitespace

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"),
            fingerprint(F.col(text_col)).alias(f"_fp_{tag}"),
            token_count_whitespace(F.col(text_col)).alias(f"tokens_{tag}"),
        )

    j = side(old, "old").join(side(new, "new"), "doc_id", "full")
    status = (
        F.when(F.col("_fp_old").isNull(), "added")
        .when(F.col("_fp_new").isNull(), "removed")
        .when(F.col("_fp_old") == F.col("_fp_new"), "unchanged")
        .otherwise("changed")
    )
    per_doc = j.select(
        "doc_id",
        status.alias("status"),
        F.coalesce("tokens_old", F.lit(0)).alias("tokens_old"),
        F.coalesce("tokens_new", F.lit(0)).alias("tokens_new"),
    )
    summary = (
        per_doc.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("status") == "removed", F.col("tokens_old")
                ).otherwise(F.col("tokens_new"))
            ).alias("tokens"),
            F.sum(F.col("tokens_new") - F.col("tokens_old")).alias(
                "token_delta"
            ),
        )
        .orderBy("status")
    )
    return summary, per_doc


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> tuple[dict, DataFrame | None]:
    """The data-card summary a curated corpus ships with: one scan's worth
    of aggregate statistics as a plain dict (driver state = scalars), plus
    a per-language breakdown frame when `lang_col` exists.

        n_docs, total_tokens, total_chars,
        tokens_p50/p95 (approximate, per doc),
        quality_p10/p50/p90 (the heuristic gate score),
        exact_dup_rate (1 − distinct content fingerprints / docs)

    Shapes: ONE pass computes every per-doc statistic (tokens, chars,
    quality, fingerprint) as projections; the summary is a single
    aggregate over them (approx percentiles — no single reducer holds the
    corpus) plus one count-distinct on the fingerprint (the exact_dedup
    aggregate). The breakdown is the same aggregate keyed by language.
    Nothing here is a second tokenization — token counts reuse the
    engine's whitespace counter.
    """
    from ..functions.text import fingerprint, token_count_whitespace

    per_doc = docs.select(
        F.col(id_col),
        *( [F.col(lang_col)] if lang_col and lang_col in docs.columns else [] ),
        token_count_whitespace(F.col(text_col)).alias("_toks"),
        F.length(F.col(text_col)).alias("_chars"),
        quality_score(F.col(text_col)).alias("_q"),
        fingerprint(F.col(text_col)).alias("_fp"),
    )
    row = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").alias("total_tokens"),
        F.sum("_chars").alias("total_chars"),
        F.percentile_approx("_toks", [0.5, 0.95]).alias("tok_p"),
        F.percentile_approx("_q", [0.1, 0.5, 0.9]).alias("q_p"),
        F.count_distinct("_fp").alias("n_fps"),
    ).collect()[0]
    report = {
        "n_docs": row["n_docs"],
        "total_tokens": row["total_tokens"],
        "total_chars": row["total_chars"],
        "tokens_p50": row["tok_p"][0],
        "tokens_p95": row["tok_p"][1],
        "quality_p10": round(row["q_p"][0], 6),
        "quality_p50": round(row["q_p"][1], 6),
        "quality_p90": round(row["q_p"][2], 6),
        "exact_dup_rate": (
            round(1.0 - row["n_fps"] / row["n_docs"], 6) if row["n_docs"] else 0.0
        ),
    }
    breakdown = None
    if lang_col and lang_col in docs.columns:
        breakdown = per_doc.groupBy(lang_col).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_toks").alias("total_tokens"),
            F.count_distinct("_fp").alias("n_fps"),
        ).select(
            lang_col,
            "n_docs",
            "total_tokens",
            F.round(1.0 - F.col("n_fps") / F.col("n_docs"), 6).alias(
                "exact_dup_rate"
            ),
        )
    return report, breakdown
