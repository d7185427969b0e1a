"""Corpus sampling and sequence packing for training-data pipelines.

- :func:`hash_sample` — reproducible Bernoulli sampling keyed on a
  deterministic hash of the row id (not `df.sample`, whose output depends
  on partitioning and Spark version): the same (seed, fraction) always
  selects the same rows, on any cluster layout, in any engine. This is how
  corpora are downsampled reproducibly across reruns and engines.

- :func:`pack_sequences` — concat-and-chunk assignment of documents to
  fixed token-budget training sequences: documents are laid out in
  deterministic id order and a document belongs to the sequence where its
  first token lands (seq = floor(starting_offset / budget)). One window
  cumsum — at scale a range-partitioned sort, the same shape as any global
  ordering. An optional stratum column packs per group (e.g. per language)
  with an independent offset space per stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint

# hash buckets for the sampling decision: fraction is quantized to 1e-6
SAMPLE_BUCKETS = 1_000_000


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: str = "sample:",
) -> DataFrame:
    """Keep rows whose salted 60-bit md5 of the id falls below
    fraction × 1e6 of the bucket space. Pure filter — pushes down past
    column pruning, no shuffle, no state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bucket = md5_bigint(F.col(id_col).cast("string"), salt=seed) % SAMPLE_BUCKETS
    return df.filter(bucket < int(round(fraction * SAMPLE_BUCKETS)))


def hash_sample_sql(
    id_expr: str, fraction: float, seed: str = "sample:"
) -> str:
    """DuckDB rendering of the :func:`hash_sample` predicate."""
    from ..functions.hashing import md5_bigint_sql

    h = md5_bigint_sql(f"CAST({id_expr} AS VARCHAR)", salt=seed)
    return f"({h} % {SAMPLE_BUCKETS}) < {int(round(fraction * SAMPLE_BUCKETS))}"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: str = "sample:",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling — the mixture-weighting
    step of a corpus pipeline (e.g. upweight low-resource languages by
    keeping a larger fraction of them). Same salted-bucket mechanism as
    :func:`hash_sample`, but the threshold is looked up per stratum, so the
    selection stays reproducible AND nested per stratum (a stratum's 10%
    sample is a subset of its 30% sample). Strata absent from `fractions`
    keep `default`. Pure filter: no shuffle, no state, prunes to the id and
    stratum columns only."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    bucket = md5_bigint(F.col(id_col).cast("string"), salt=seed) % SAMPLE_BUCKETS
    threshold = F.lit(int(round(default * SAMPLE_BUCKETS)))
    for k, v in sorted(fractions.items()):
        threshold = F.when(
            F.col(stratum_col) == k, F.lit(int(round(v * SAMPLE_BUCKETS)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def stratified_sample_sql(
    id_expr: str,
    stratum_expr: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: str = "sample:",
) -> str:
    """DuckDB rendering of the :func:`stratified_sample` predicate."""
    from ..functions.hashing import md5_bigint_sql

    h = md5_bigint_sql(f"CAST({id_expr} AS VARCHAR)", salt=seed)
    branches = "".join(
        f"WHEN {stratum_expr} = '{k}' THEN {int(round(v * SAMPLE_BUCKETS))} "
        for k, v in sorted(fractions.items())
    )
    thr = f"CASE {branches}ELSE {int(round(default * SAMPLE_BUCKETS))} END"
    return f"({h} % {SAMPLE_BUCKETS}) < ({thr})"


def shuffle_rank(id_col: str, epoch: int = 0, seed: str = "shuffle:") -> Column:
    """Deterministic pseudo-random training order: the salted md5 of
    (epoch, id). Sorting by it is a reproducible global shuffle — same
    order on any cluster layout, any rerun — and changing `epoch` redraws
    the permutation, which is exactly per-epoch corpus reshuffling.
    Ties (2^-60 odds) fall back to the id via the caller's sort."""
    return md5_bigint(
        F.concat(F.lit(f"{seed}{epoch}:"), F.col(id_col).cast("string"))
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str,
    token_col: str,
    id_col: str,
    default_budget: int = 0,
    seed: str = "mix:",
    n_buckets: int = 256,
) -> DataFrame:
    """Materialize a token-budget mixture: per group (domain / language /
    source), keep documents in a deterministic pseudo-random order until the
    group's token budget is reached — how a pretraining mixture spec
    ("300B tokens web, 30B code, ...") is actually realized over a corpus.

    A document is kept iff the exact token count of the documents BEFORE it
    in the group's salted-md5 order is still under the budget — so the
    selection is the minimal prefix reaching >= budget (the whole group if
    it has fewer tokens), it is integer-exact and engine-independent, and
    it is nested: a smaller budget's selection is a prefix (subset) of a
    larger one's, the same reproducibility law as `stratified_sample`.

    Scale shape — exact prefix sums WITHOUT a per-group single-reducer
    sort: the order key is a 60-bit md5, so its top bits split every group
    into `n_buckets` hash-ordered sub-ranges. One map-side-combined
    aggregate computes (group, bucket) token totals (a groups×buckets-row
    table), a broadcast-sized window turns them into exclusive bucket
    offsets, and the running sum inside each (group, bucket) window adds
    the offset — the widest sort is a group's 1/n_buckets slice, not the
    group. A hot domain at 100 TB therefore spreads over `n_buckets`
    tasks; raise `n_buckets` (any power of two up to 2^60) to spread it
    thinner.
    """
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 60 - n_buckets.bit_length() + 1
    for k, v in budgets.items():
        if v < 0:
            raise ValueError(f"budget for {k!r} must be >= 0, got {v}")
    if default_budget < 0:
        raise ValueError(f"default_budget must be >= 0, got {default_budget}")
    h = md5_bigint(F.col(id_col).cast("string"), salt=seed)
    base = df.withColumn("_h", h).withColumn(
        "_bucket", F.shiftright(F.col("_h"), shift)
    )
    totals = base.groupBy(group_col, "_bucket").agg(
        F.sum(token_col).alias("_btok")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        group_col,
        "_bucket",
        F.coalesce(F.sum("_btok").over(w_off), F.lit(0)).alias("_offset"),
    )
    budget = F.lit(int(default_budget))
    for k, v in sorted(budgets.items()):
        budget = F.when(F.col(group_col) == k, F.lit(int(v))).otherwise(budget)
    w_run = (
        Window.partitionBy(group_col, "_bucket")
        .orderBy(F.asc("_h"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.col("_offset") + F.coalesce(
        F.sum(token_col).over(w_run), F.lit(0)
    )
    return (
        base.join(F.broadcast(offsets), [group_col, "_bucket"])
        .withColumn("_prev", prev)
        .filter(F.col("_prev") < budget)
        .drop("_h", "_bucket", "_offset", "_prev")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    stratum_col: str | None = None,
    order_col: str | Column | None = None,
) -> DataFrame:
    """Assign each document a training-sequence id under a token budget.

    Documents are ordered by id (deterministic) — or by `order_col`
    (e.g. :func:`shuffle_rank` for a reproducible shuffled training
    order; the id is always the tie-break); `offset` is the cumulative
    token count before the document, and `seq_id = floor(offset / budget)`
    — the sequence in which the document's first token lands under
    concat-and-chunk packing. Documents longer than the budget still get
    exactly one seq_id (where they start); a downstream chunker splits
    them. Adds (offset, seq_id) columns.

    Scale: the window is a global sort on (stratum, order) — a range-
    partitioned sort-shuffle, the unavoidable cost of a globally ordered
    layout. With `stratum_col` the sort key is (stratum, order) and each
    stratum packs its own sequence space, so skewed strata parallelize
    across their range partitions.
    """
    part = [stratum_col] if stratum_col else []
    order = [order_col, id_col] if order_col is not None else [id_col]
    w = (
        Window.partitionBy(*part).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return df.withColumn("offset", offset).withColumn(
        "seq_id", F.floor(F.col("offset") / F.lit(budget)).cast("bigint")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into fixed-size context-window chunks of
    `chunk_tokens` whitespace tokens, with optional overlap
    (`stride` < `chunk_tokens`; default no overlap). The training-data
    step between cleaning and packing: models consume bounded windows,
    and retrieval indexes chunk before embedding.

    One pass: the token array is STAGED as a bound column (HOF-lambda
    re-evaluation rule — see shingle_table), chunk starts come from
    `sequence(0, n-1, stride)`, and the generator expression is a cheap
    slice+join per OUTPUT chunk, safe under Generate's per-element
    re-evaluation. Rows out = ceil(tokens/stride) per doc — linear in
    corpus token count, shuffle-free (narrow explode).

    Returns (id, chunk_id, n_chunks, chunk_text, chunk_tokens) where
    chunk_id is 0-based document order; the final chunk may be short.
    Empty/whitespace docs yield one empty chunk (chunk_tokens = 0).
    """
    if stride is None:
        stride = chunk_tokens
    if not 0 < stride <= chunk_tokens:
        raise ValueError(f"stride {stride} must be in (0, {chunk_tokens}]")
    trimmed = F.trim(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.when(F.length(trimmed) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(trimmed, r"\s+"))
        .alias("_w"),
    )
    w = F.col("_w")
    n = F.size(w)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    staged = staged.select(id_col, "_w", F.size(w).alias("_n"), starts.alias("_st"))
    out = staged.select(
        id_col,
        "_w",
        F.posexplode("_st").alias("chunk_id", "_start"),
        F.size("_st").alias("n_chunks"),
    )
    piece = F.slice(F.col("_w"), F.col("_start") + 1, chunk_tokens)
    return out.select(
        id_col,
        "chunk_id",
        "n_chunks",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("chunk_tokens"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    stratum_col: str | None = None,
    seq_col: str = "seq_id",
    order_cols: tuple[str, ...] = ("offset",),
    seqs_per_shard: int = 64,
    fmt: str = "parquet",
) -> None:
    """Export a packed corpus (:func:`pack_sequences` output) as training
    shards with the layout guarantees a data-loader needs:

    1. every row of one training sequence lands in the SAME shard file
       (a sequence split across files cannot be assembled by a
       sequential reader);
    2. rows within a shard are contiguous and ordered by
       (seq, *order_cols);
    3. strata get their own directories (``partitionBy``) so a
       mixture-aware loader samples per-language shards directly.

    Shard assignment is ``floor(seq_id / seqs_per_shard)`` —
    deterministic and hash-free, so re-runs produce byte-identical shard
    membership on any cluster layout. One ``repartition`` on
    (stratum, shard) puts each shard's rows in exactly one task, and the
    directory-partitioned writer therefore emits exactly ONE data file
    per shard directory; ``sortWithinPartitions`` gives the in-file
    order. ``fmt``: ``parquet`` or ``json`` (JSONL — the common LLM
    training-dump format).

    Scale: the repartition is the only shuffle, keyed by (stratum,
    shard) — thousands of shards spread evenly; pick ``seqs_per_shard``
    so a shard (~seqs x budget tokens) lands near your target file size
    (e.g. 256 MB).
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unknown shard format: {fmt!r}")
    out = df.withColumn(
        "shard_id", F.floor(F.col(seq_col) / F.lit(seqs_per_shard)).cast("bigint")
    )
    keys = ([stratum_col] if stratum_col else []) + ["shard_id"]
    sort_cols = keys + [seq_col] + list(order_cols)
    writer = (
        out.repartition(*[F.col(k) for k in keys])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*keys)
    )
    getattr(writer, fmt)(path)


def split_by_hash(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: str = "split:",
) -> dict[str, DataFrame]:
    """Deterministic train/val/test split: each row lands in exactly one
    named split by where its salted id-hash bucket falls in the
    cumulative weight ranges. Same guarantees as :func:`hash_sample` —
    reproducible on any partitioning, any engine, any rerun; disjoint
    and exhaustive by construction (ranges partition the bucket space).
    Weights must sum to 1 (within 1e-9).

    Pure pushed-down filters — no shuffle, no state; each returned frame
    re-reads the scan with its own range predicate, so downstream
    consumers prune independently."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = md5_bigint(F.col(id_col).cast("string"), salt=seed) % SAMPLE_BUCKETS
    out: dict[str, DataFrame] = {}
    edge = 0
    names = list(weights)
    for i, name in enumerate(names):
        lo = edge
        # last split absorbs rounding residue so the ranges are exhaustive
        hi = SAMPLE_BUCKETS if i == len(names) - 1 else edge + int(
            round(weights[name] * SAMPLE_BUCKETS)
        )
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        edge = hi
    return out


def temperature_fractions(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.3,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Temperature-based mixture weights (the multilingual α-sampling of
    mBERT/XLM-R, Conneau et al. ACL'20 §3): sampling probability per
    stratum ∝ p_s^α, flattening the natural distribution so small strata
    (low-resource languages, rare domains) are upweighted. Returns
    per-stratum KEEP FRACTIONS for :func:`stratified_sample`, scaled so
    the expected output is `target_rows` (default: the input size — pure
    rebalancing) and capped at 1.0 (sampling cannot invent rows; if the
    cap binds, the realized mixture is as close to the α-mixture as
    keep-only sampling allows).

    One count aggregate (stratum-sized result) drives a driver-side
    closed form — the model-sized-state rule again."""
    counts = {
        r[stratum_col]: r["n"]
        for r in df.groupBy(stratum_col).agg(F.count("*").alias("n")).collect()
    }
    return temperature_fractions_from_counts(counts, alpha, target_rows)


def temperature_fractions_from_counts(
    counts: dict[str, int],
    alpha: float = 0.3,
    target_rows: int | None = None,
) -> dict[str, float]:
    """The pure closed form behind :func:`temperature_fractions`
    (property-tested in isolation): fraction_s ∝ n_s^(α−1) — for α<1
    smaller strata always get the larger keep fraction."""
    total = sum(counts.values())
    if total == 0:
        return {}
    if target_rows is None:
        target_rows = total
    probs = {s: (n / total) ** alpha for s, n in counts.items()}
    z = sum(probs.values())
    return {
        s: min(1.0, (probs[s] / z) * target_rows / counts[s]) for s in counts
    }


def upsample_by_factor(
    df: DataFrame,
    factors: dict[str, float],
    group_col: str,
    id_col: str,
    default: float = 1.0,
    seed: str = "upsample:",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic fractional repetition — the upsampling half of a
    mixture spec ("repeat Wikipedia 2.4x, books 1.5x", the LLaMA /
    DoReMi-style domain weighting that `stratified_sample`'s keep-only
    fractions cannot express). Each row of group s appears
    floor(f_s) times, plus one more iff its salted md5 falls below
    frac(f_s) of the bucket space — so the realized group size is exactly
    n_s*floor(f_s) + |{rows: h < frac}|, within quantization of the
    expectation n_s*f_s, reproducible on any layout/engine, and monotone:
    raising f_s only ever adds copies (same law as nested fractions in
    `stratified_sample`; f_s < 1 degenerates to plain downsampling).

    Output rows carry `epoch_col` (0..copies-1) distinguishing the copies,
    feeding :func:`shuffle_rank`'s per-epoch reshuffle so repeated docs
    spread across the training order instead of clumping.

    Scale shape: a pure projection + `explode` of a row-local sequence —
    no shuffle, no state; the generator expression is O(copies) per output
    row (the cheap-generator case of the Generate rule).
    """
    for k, v in factors.items():
        if v < 0:
            raise ValueError(f"factor for {k!r} must be >= 0, got {v}")
    if default < 0:
        raise ValueError(f"default must be >= 0, got {default}")

    def _branches(value_of):
        out = F.lit(value_of(default))
        for k, v in sorted(factors.items()):
            out = F.when(F.col(group_col) == k, F.lit(value_of(v))).otherwise(out)
        return out

    whole = _branches(lambda f: int(f))
    extra_thr = _branches(lambda f: int(round((f - int(f)) * SAMPLE_BUCKETS)))
    h = md5_bigint(F.col(id_col).cast("string"), salt=seed) % SAMPLE_BUCKETS
    copies = whole + (h < extra_thr).cast("int")
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)),
        )
        .drop("_copies")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: str = "wsample:",
    group_col: str | None = None,
) -> DataFrame:
    """Distributed weighted sampling WITHOUT replacement — Efraimidis &
    Spirakis (IPL 2006) A-ES: give every row the key u^(1/w) with
    u ~ Uniform(0,1) and keep the n largest keys. The result is exactly a
    weighted sample without replacement (inclusion intuition: heavier w
    pulls u^(1/w) toward 1), computed as a plain top-n — per-partition
    partial top-n then a single merge, the same shuffle-free-until-the-
    tiny-final-step shape as every top-k in this repo. With `group_col`,
    the top-n is per group (one window, n rows out per group) — the
    mixture-sampling form ("n docs from every domain, weighted by
    quality").

    u derives from the salted md5 of the id (deterministic: same corpus,
    same seed → same sample on any partitioning or engine — replayed
    bit-for-bit in pure Python by the test). Keys compare as
    ln(u)/w — the monotone log form of u^(1/w), which avoids underflow
    for tiny weights; ties are impossible for distinct ids (u is a
    60-bit hash) and broken by id anyway for total determinism.
    Zero/negative weights never sample (filtered: their u^(1/w) → 0).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = md5_bigint(F.col(id_col).cast("string"), salt=seed)
    # u in (0, 1): (h + 1) / (2^60 + 1) — h is 60-bit non-negative
    u = (h.cast("double") + 1.0) / float((1 << 60) + 1)
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w  # maximize  <=>  maximize u^(1/w)
    keyed = df.filter(w > 0).withColumn("_ws_key", key)
    if group_col is None:
        out = keyed.orderBy(F.desc("_ws_key"), F.asc(id_col)).limit(n)
    else:
        win = Window.partitionBy(group_col).orderBy(
            F.desc("_ws_key"), F.asc(id_col)
        )
        out = (
            keyed.withColumn("_ws_rank", F.row_number().over(win))
            .filter(F.col("_ws_rank") <= n)
            .drop("_ws_rank")
        )
    return out.drop("_ws_key")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    order_col: Column | None = None,
) -> DataFrame:
    """Keep at most `n` rows per group — the per-domain cap every web
    corpus applies after URL canonicalization (one template-heavy site
    must not dominate the mixture). Deterministic survivor choice:
    `order_col` ascending (default: the salted md5 of the id, i.e. a
    reproducible random draw — NOT the id itself, which would bias
    toward early crawls), ties broken by id. One window, no shuffle
    beyond the group partitioning."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    # a caller-supplied order may already be a SortOrder (e.g. .desc()) —
    # use it verbatim; only the default hash draw gets an explicit .asc()
    order = (
        order_col
        if order_col is not None
        else md5_bigint(F.col(id_col).cast("string"), salt="cap:").asc()
    )
    win = Window.partitionBy(group_col).orderBy(order, F.col(id_col).asc())
    return (
        df.withColumn("_cap_rank", F.row_number().over(win))
        .filter(F.col("_cap_rank") <= n)
        .drop("_cap_rank")
    )


def kfold_splits(
    df: DataFrame, id_col: str, k: int = 5, seed: str = "fold:"
) -> list[tuple[DataFrame, DataFrame]]:
    """K (train, test) pairs for cross-validation: fold membership is the
    salted md5 of the id mod k — deterministic, partition-independent,
    and consistent with split_by_hash's guarantees (disjoint, exhaustive,
    reproducible; a row's fold never changes as the corpus grows). Each
    pair is a pure FILTER over the input (k lazy views, no
    materialization — the optimizer pushes the predicate to the scan)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    fold = md5_bigint(F.col(id_col).cast("string"), salt=seed) % k
    return [
        (df.filter(fold != i), df.filter(fold == i)) for i in range(k)
    ]


def negative_samples(
    positives: DataFrame,
    corpus: DataFrame,
    query_col: str = "q_id",
    pos_col: str = "doc",
    id_col: str = "doc_id",
    k: int = 4,
    margin: int = 2,
    n_buckets: int | None = None,
    seed: str = "neg:",
) -> DataFrame:
    """Deterministic random negatives for contrastive training pairs:
    for every query in `positives`, up to `k` corpus documents that are
    NOT among that query's positives, drawn reproducibly (salted md5 —
    same inputs, same negatives, on any partitioning, any session).

    The scale problem this shape avoids: "pick k random docs per query"
    naively needs either a global dense index (a full sort) or a
    per-query scan of the corpus (|Q|×N). Instead the corpus is hashed
    once into `n_buckets` buckets (default ≈ N/16, so ~16 docs each,
    computed from a cheap count), and each (query, attempt i) probe
    equi-joins its pseudo-random bucket h(seed, q, i) mod n_buckets and
    keeps that bucket's min-hash doc under a per-probe draw — k·margin
    probes per query, join fan-out ≈ probes × 16 rows, never the corpus.
    Collisions with positives / duplicate picks are dropped afterwards
    and the first k survivors (in attempt order) are kept — `margin`
    oversamples attempts so k survive with high probability (guaranteed
    short only when the corpus itself is nearly exhausted by positives;
    callers needing exactly-k raise `margin`).

    Output: (query_col, id_col, neg_rank) with neg_rank in 1..k.
    """
    if k <= 0 or margin < 1:
        raise ValueError(f"need k > 0 and margin >= 1, got k={k} margin={margin}")
    if n_buckets is None:
        n_buckets = max(int(corpus.count()) // 16, 1)
    q = F.col(query_col).cast("string")
    buckets = corpus.select(
        F.col(id_col),
        (md5_bigint(F.col(id_col).cast("string"), salt=seed + "b:") % n_buckets).alias(
            "_b"
        ),
    )
    attempts = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k * margin - 1)),
            lambda i: F.struct(
                i.alias("_i"),
                F.pmod(
                    md5_bigint(F.concat(q, F.lit("#"), i.cast("string")), salt=seed),
                    F.lit(n_buckets),
                ).alias("_b"),
            ),
        )
    )
    probes = (
        positives.select(query_col).distinct().select(query_col, attempts.alias("_a"))
        .select(query_col, F.col("_a._i").alias("_i"), F.col("_a._b").alias("_b"))
    )
    # within each probed bucket: one deterministic draw per (query, attempt)
    draw = md5_bigint(
        F.concat(q, F.lit("#"), F.col("_i").cast("string"), F.lit("#"),
                 F.col(id_col).cast("string")),
        salt=seed + "d:",
    )
    cand = (
        probes.join(buckets, "_b")
        .withColumn("_d", draw)
        .withColumn(
            "_pick",
            F.row_number().over(
                Window.partitionBy(query_col, "_i").orderBy(
                    F.col("_d").asc(), F.col(id_col).asc()
                )
            ),
        )
        .filter(F.col("_pick") == 1)
        .select(query_col, "_i", id_col)
    )
    # drop positives and duplicate picks, keep the first k by attempt order
    not_pos = cand.join(
        positives.select(
            F.col(query_col), F.col(pos_col).alias(id_col)
        ).distinct(),
        [query_col, id_col],
        "left_anti",
    )
    dedup = (
        not_pos.withColumn(
            "_first",
            F.row_number().over(
                Window.partitionBy(query_col, id_col).orderBy(F.col("_i").asc())
            ),
        )
        .filter(F.col("_first") == 1)
        .drop("_first")
    )
    ranked = dedup.withColumn(
        "neg_rank",
        F.row_number().over(
            Window.partitionBy(query_col).orderBy(F.col("_i").asc())
        ),
    )
    return ranked.filter(F.col("neg_rank") <= k).select(
        query_col, id_col, "neg_rank"
    )
