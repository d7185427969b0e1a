"""Repetition-based document quality statistics — the Gopher/C4 filter
family (Rae et al. 2021 "Scaling Language Models" appendix A1.1; Raffel et
al. 2020 C4): repetitious documents (boilerplate, scraper loops, SEO spam)
are removed from LLM training corpora by measuring how much of a document
is duplicated lines or dominated by a few n-grams.

Signals (all per document, all JVM-side explode + hash-aggregate — the
same scan-once scale shape as minhash_signatures):

- duplicate_line_frac       — fraction of non-empty lines that are repeats
                              of an earlier-seen line (n_lines − n_distinct)
                              / n_lines.
- duplicate_line_char_frac  — fraction of line characters inside lines
                              occurring more than once.
- top{n}gram_char_frac      — fraction of normalized-text characters
                              covered by the single most dominant word
                              n-gram: max over n-grams of
                              count × length(gram) ÷ chars. Computing the
                              max of the product (not the product of the
                              most frequent gram) keeps it deterministic
                              without tie-breaking.
- dup{n}gram_char_frac      — fraction of n-gram character mass in grams
                              occurring more than once: sum(count × len)
                              over grams with count > 1 ÷ sum over all.
                              (The paper counts non-overlapping character
                              spans; the mass ratio is the standard
                              shuffle-friendly proxy and is deterministic.)

The companion `gopher_repetition_pass` applies the published thresholds.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text
from .dedup import _shingles_from_words, shingle_table


def word_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, chars, ws) — the corpus tokenized ONCE.

    Tokenization (lowercase + strip-non-alnum + split) is the dominant
    per-byte CPU cost of the quality-signal family; a query that derives
    several signals from the same corpus should build this frame once,
    `localCheckpoint(eager=False)` it, and pass it to
    :func:`repetition_stats` / :func:`token_frequency_stats` /
    :func:`contamination_stats` via their ``words=`` parameter instead of
    letting each subtree re-tokenize. ``ws`` is byte-identical to the
    staged array inside :func:`~..operators.dedup.shingle_table`
    (same trim+normalize+split expression), so derived grams match the
    per-operator forms exactly. ``chars`` is the normalized-text length
    used by the Gopher char-fraction denominators.

    The normalized text is staged as its own bound column with two
    references (length + split) so CollapseProject cannot re-inline the
    regexp into both consumers (CLAUDE.md staging rule).
    """
    staged = df.select(
        F.col(id_col).alias("doc"),
        F.trim(normalized_text(F.col(text_col))).alias("_norm"),
    )
    return staged.select(
        "doc",
        F.length("_norm").alias("chars"),
        F.split(F.col("_norm"), r"\s+").alias("ws"),
    )


def grams_from_words(words: DataFrame, k: int) -> DataFrame:
    """(doc, s) exploded word k-grams from a :func:`word_table` frame —
    the shared-tokenization twin of ``shingle_table(..., exploded=True)``
    (identical output; the word split is read from ``ws`` instead of
    recomputed). The generator expression is the cheap shingle transform
    over a bound array column, which is the tolerable Generate shape
    (CLAUDE.md: cost = per-element-cost x array-length)."""
    sh = _shingles_from_words(F.col("ws"), k)
    return words.select("doc", F.explode(sh).alias("s"))


def line_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, line) — trimmed non-empty lines, split ONCE. Pass to
    :func:`c4_line_stats` / :func:`boilerplate_line_stats` via ``lines=``
    when both run over the same corpus."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), "\n")).alias("line"),
        )
        .withColumn("line", F.trim(F.col("line")))
        .filter(F.length("line") > 0)
    )

# Gopher table A1 thresholds (duplicate-line fraction; top-n-gram and
# duplicate-n-gram character fractions)
GOPHER_DUP_LINE_FRAC = 0.30
GOPHER_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_CHAR_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _line_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lines: DataFrame | None = None,
) -> DataFrame:
    """Per-doc duplicate-line stats via explode(lines) → count per distinct
    line → one aggregate. Shuffles (doc, line-hash) — never the document."""
    if lines is None:
        lines = line_table(df, text_col, id_col)
    per_line = lines.groupBy("doc", "line").agg(F.count("*").alias("cnt"))
    return per_line.groupBy("doc").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct_lines"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(0)
        ).alias("dup_line_chars"),
    )


def _ngram_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    words: DataFrame | None = None,
) -> DataFrame:
    """Per-doc n-gram dominance: explode word n-grams (shingle_table — the
    staged, codegen-friendly form, or the shared :func:`word_table` when
    given) → count per distinct gram → aggregate max/dup character mass."""
    if words is not None:
        grams = grams_from_words(words, n)
    else:
        grams = shingle_table(df, text_col, id_col, k=n, exploded=True)
    per_gram = grams.groupBy("doc", "s").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("doc").agg(
        F.max(F.col("cnt") * F.length("s")).alias(f"top{n}_mass"),
        F.sum(F.col("cnt") * F.length("s")).alias(f"all{n}_mass"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("s")).otherwise(0)
        ).alias(f"dup{n}_mass"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
    words: DataFrame | None = None,
    lines: DataFrame | None = None,
) -> DataFrame:
    """Gopher-style repetition signals, one row per document.

    ``words`` / ``lines``: optional pre-tokenized :func:`word_table` /
    :func:`line_table` frames shared across signal subtrees — without
    them every n in ``top_ns + dup_ns`` re-tokenizes the corpus.

    Fractions are rounded to 6 dp (cross-engine transcendental rule does
    not apply — these are ratios of exact integer masses — but rounding
    pins double formatting on both engines)."""
    if words is not None:
        chars = words.select("doc", "chars")
    else:
        chars = df.select(
            F.col(id_col).alias("doc"),
            F.length(F.trim(normalized_text(F.col(text_col)))).alias("chars"),
        )
    out = chars.join(_line_stats(df, text_col, id_col, lines=lines), "doc", "left")
    for n in top_ns + tuple(d for d in dup_ns if d not in top_ns):
        out = out.join(
            _ngram_stats(df, text_col, id_col, n, words=words), "doc", "left"
        )

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0), 6
        )

    cols = [
        F.col("doc").alias(id_col),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        frac(
            F.coalesce(F.col("n_lines") - F.col("n_distinct_lines"), F.lit(0)),
            F.coalesce("n_lines", F.lit(0)),
        ).alias("dup_line_frac"),
        frac(
            F.coalesce("dup_line_chars", F.lit(0)), F.coalesce("line_chars", F.lit(0))
        ).alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        cols.append(
            frac(F.coalesce(f"top{n}_mass", F.lit(0)), F.col("chars")).alias(
                f"top{n}gram_char_frac"
            )
        )
    for n in dup_ns:
        cols.append(
            frac(
                F.coalesce(f"dup{n}_mass", F.lit(0)), F.coalesce(f"all{n}_mass", F.lit(0))
            ).alias(f"dup{n}gram_char_frac")
        )
    return out.select(*cols)


# C4 (Raffel et al. 2020, §2.2) line/page heuristics
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_KEPT_LINES = 3


def c4_line_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lines: DataFrame | None = None,
) -> DataFrame:
    """Per-doc C4 cleaning signals: explode(lines) → per-line flags →
    one aggregate (same shuffle shape as :func:`_line_stats`).

    C4 keeps a line when it ends in terminal punctuation (. ! ? "), has at
    least 5 words, and does not mention javascript; a page survives when it
    has >= 3 kept lines, no "lorem ipsum", and no '{'. The doc-level
    substring flags are pure projections computed here alongside the line
    aggregate so the caller gets one frame. ``lines``: optional shared
    :func:`line_table` frame (skips the line split).
    """
    if lines is None:
        lines = line_table(df, text_col, id_col)
    terminal = F.col("line").rlike('[.!?"]$')
    words = F.size(F.split(F.col("line"), r"\s+"))
    js = F.lower(F.col("line")).contains("javascript")
    kept = terminal & (words >= C4_MIN_WORDS_PER_LINE) & ~js
    agg = lines.groupBy("doc").agg(
        F.count("*").alias("n_rich_lines"),
        F.sum(kept.cast("int")).alias("n_kept_lines"),
        F.round(F.avg(terminal.cast("double")), 6).alias("terminal_line_frac"),
        F.round(
            F.avg((words < C4_MIN_WORDS_PER_LINE).cast("double")), 6
        ).alias("short_line_frac"),
    )
    flags = df.select(
        F.col(id_col).alias("doc"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("has_lorem_ipsum"),
        F.col(text_col).contains("{").alias("has_curly_brace"),
    )
    return flags.join(agg, "doc", "left").select(
        "doc",
        F.coalesce("n_rich_lines", F.lit(0)).alias("n_rich_lines"),
        F.coalesce("n_kept_lines", F.lit(0)).alias("n_kept_lines"),
        F.coalesce("terminal_line_frac", F.lit(0.0)).alias("terminal_line_frac"),
        F.coalesce("short_line_frac", F.lit(0.0)).alias("short_line_frac"),
        "has_lorem_ipsum",
        "has_curly_brace",
    )


def boilerplate_line_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    lines: DataFrame | None = None,
) -> DataFrame:
    """Cross-document boilerplate detection — C4's corpus-level span dedup
    at line granularity: a line occurring in >= `min_docs` DISTINCT
    documents is boilerplate (headers, footers, nav text, templated
    sentences), and the per-doc fraction of such lines is the removal
    signal.

    Two shuffles, both on (line-sized) small keys: explode(lines) →
    count_distinct(doc) per line → join the tiny per-line df back to the
    exploded table → per-doc aggregate. The corpus-wide line table is the
    only global state and it is vocabulary-sized, not corpus-sized; at
    real scale hash the line (`md5`) before the groupBy so the shuffle
    carries a fixed-width key instead of the line text. ``lines``:
    optional shared :func:`line_table` frame (skips the line split).
    """
    if lines is None:
        lines = line_table(df, text_col, id_col)
    line_df = lines.groupBy("line").agg(F.count_distinct("doc").alias("line_df"))
    return (
        lines.join(line_df, "line")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_boiler_checked"),
            F.sum((F.col("line_df") >= min_docs).cast("int")).alias("n_boiler_lines"),
        )
        .select(
            "doc",
            "n_boiler_lines",
            F.round(
                F.col("n_boiler_lines").cast("double")
                / F.col("n_boiler_checked").cast("double"),
                6,
            ).alias("boiler_line_frac"),
        )
    )


def c4_page_pass(stats: DataFrame) -> Column:
    """Boolean page-survival column applying the C4 thresholds to a
    :func:`c4_line_stats` frame."""
    return (
        (F.col("n_kept_lines") >= C4_MIN_KEPT_LINES)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_curly_brace")
    )


def contamination_stats(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    words: DataFrame | None = None,
    bench_words: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination — flag training documents that contain
    word n-grams from an evaluation set (the standard n-gram overlap
    check; n=8..13 in published pipelines).

    Scale shape: the benchmark gram set is tiny relative to the corpus, so
    it BROADCASTS — the corpus explodes its n-grams once and probes the
    broadcast hash set map-side; no shuffle of corpus data at all. Returns
    (doc, n_contaminated_grams, contaminated) per document — filter on
    `contaminated` (any hit) or threshold the count for fuzzy overlap.
    ``words`` / ``bench_words``: optional shared :func:`word_table`
    frames for the corpus / benchmark side.
    """
    if bench_words is not None:
        bench_grams = grams_from_words(bench_words, n).select("s").distinct()
    else:
        bench_grams = (
            shingle_table(benchmark, bench_text_col, id_col, k=n, exploded=True)
            .select("s")
            .distinct()
        )
    if words is not None:
        doc_grams = grams_from_words(words, n)
    else:
        doc_grams = shingle_table(df, text_col, id_col, k=n, exploded=True)
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "s", "left_semi")
        .groupBy("doc")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_contaminated_grams", F.lit(0)).alias(
                "n_contaminated_grams"
            ),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_stats_bloom(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    fpp: float = 0.01,
    expected_grams: int | None = None,
    words: DataFrame | None = None,
    bench_words: DataFrame | None = None,
) -> DataFrame:
    """:func:`contamination_stats` with the eval-gram set compressed into
    a Bloom filter (functions/bloom.py) instead of broadcast exactly —
    the form that survives eval sets too large for an exact broadcast
    (the sketch is m/8 bytes chosen up front from `expected_grams` and
    `fpp`, independent of the actual gram count).

    Direction of error: a Bloom filter has NO false negatives, so every
    truly contaminated doc is flagged; false positives (rate `fpp` per
    distinct gram) can only over-flag — the safe direction for
    decontamination. Output columns match :func:`contamination_stats`
    so the two forms are drop-in interchangeable; counts here are upper
    bounds on the exact counts (superset law pinned by test).

    `expected_grams`: sizes the sketch; defaults to counting the distinct
    bench grams first (one extra tiny job). At scale pass the known eval
    set size to skip that job.

    Choosing `fpp`: false positives compound across a document's grams —
    a doc probing G distinct grams is over-FLAGGED with probability
    ~1-(1-fpp)^G ≈ G·fpp. Size fpp to the acceptable per-DOC over-flag
    rate divided by typical grams-per-doc (e.g. docs of ~1000 grams with
    a 1% doc budget → fpp=1e-5, still only ~24 bits/key); the default
    0.01 is a per-GRAM rate suited to counting contaminated-gram mass,
    not to the boolean flag.
    """
    from ..functions.bloom import bloom_build, bloom_might_contain, bloom_parameters

    if bench_words is not None:
        bench_grams = grams_from_words(bench_words, n).select("s").distinct()
    else:
        bench_grams = (
            shingle_table(benchmark, bench_text_col, id_col, k=n, exploded=True)
            .select("s")
            .distinct()
        )
    if expected_grams is None:
        bench_grams = bench_grams.localCheckpoint(eager=False)
        expected_grams = bench_grams.count()
    m_bits, k = bloom_parameters(expected_grams, fpp)
    bitmap = bloom_build(bench_grams, "s", m_bits, k)

    if words is not None:
        doc_grams = grams_from_words(words, n)
    else:
        doc_grams = shingle_table(df, text_col, id_col, k=n, exploded=True)
    hits = (
        doc_grams.filter(bloom_might_contain(bitmap, F.col("s"), k))
        .groupBy("doc")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_contaminated_grams", F.lit(0)).alias(
                "n_contaminated_grams"
            ),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _round6(x: Column) -> Column:
    """6-dp rounding as floor(x*1e6 + 0.5)/1e6 — bit-deterministic given
    identical input on both engines (Spark's decimal HALF_UP `round` and
    DuckDB's binary rounding diverge on exact .xxxxxx5 ties, which integer
    ratios CAN hit; CLAUDE.md tie rule)."""
    return F.floor(x * 1e6 + 0.5) / 1e6


def token_frequency_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_tf: int = 2,
    words: DataFrame | None = None,
) -> DataFrame:
    """Corpus-relative token-frequency quality signals — the exact-integer
    core of CCNet's LM filtering (Wenzek et al., "CCNet: Extracting High
    Quality Monolingual Datasets from Web Crawl Data", LREC'20): pages
    dominated by corpus-rare tokens are noise (OCR junk, gibberish,
    boilerplate IDs). Per document:

    - ``n_tokens`` / ``n_distinct_tokens``
    - ``mean_token_tf`` — mean corpus frequency of the doc's token
      occurrences (high = stopword-heavy, very low = gibberish)
    - ``hapax_frac`` — fraction of occurrences whose term appears exactly
      once corpus-wide
    - ``rare_frac`` — fraction with term tf <= ``rare_max_tf``

    Everything is integer counting + one final exact-ratio division, so
    the DuckDB oracle matches bit-for-bit (the true log-probability score
    is :func:`unigram_logprob` — transcendental, tolerance-tested).

    Scale shape: token text shuffles ONCE (doc-term counts); the term
    table aggregate and the doc-terms x tf join shuffle on the term with
    map-side combine; the final aggregate shuffles (doc, 5 numbers).
    ``words``: optional shared :func:`word_table` frame.
    """
    if words is not None:
        toks = grams_from_words(words, 1)
    else:
        toks = shingle_table(df, text_col, id_col, k=1, exploded=True)
    dt = toks.groupBy("doc", "s").agg(F.count("*").alias("_c"))
    tf = dt.groupBy("s").agg(F.sum("_c").alias("_tf"))
    per_doc = (
        dt.join(tf, "s")
        .groupBy("doc")
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.count("*").alias("n_distinct_tokens"),
            # decimal: exact and association-order-insensitive (suite rule)
            F.sum(F.col("_c").cast("decimal(19,0)") * F.col("_tf")).alias("_sum_ct"),
            F.sum(F.when(F.col("_tf") == 1, F.col("_c")).otherwise(0)).alias("_hapax"),
            F.sum(
                F.when(F.col("_tf") <= rare_max_tf, F.col("_c")).otherwise(0)
            ).alias("_rare"),
        )
    )
    n = F.col("n_tokens").cast("double")
    return per_doc.select(
        "doc",
        "n_tokens",
        "n_distinct_tokens",
        _round6(F.col("_sum_ct").cast("double") / n).alias("mean_token_tf"),
        _round6(F.col("_hapax").cast("double") / n).alias("hapax_frac"),
        _round6(F.col("_rare").cast("double") / n).alias("rare_frac"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean unigram log10-probability per document — the corpus itself as
    the language model (CCNet scores against a Wikipedia LM; the
    self-corpus form needs no external model and ranks documents the same
    way: low mean logprob = rare-token-dominated = likely junk).

        logprob(doc) = mean over occurrences of log10(tf(w)) - log10(N)

    log10 is transcendental, so this is NOT in the bit-exact oracle
    surface (engines' libm may differ in the last ulp) — verified against
    DuckDB with tolerance in tests/test_quality.py. Same shuffle shape as
    :func:`token_frequency_stats`; the corpus total N joins in as a
    broadcast scalar (no driver action).
    """
    toks = shingle_table(df, text_col, id_col, k=1, exploded=True)
    dt = toks.groupBy("doc", "s").agg(F.count("*").alias("_c"))
    tf = dt.groupBy("s").agg(F.sum("_c").alias("_tf"))
    total = tf.agg(F.sum("_tf").alias("_n"))
    per_doc = (
        dt.join(tf, "s")
        .groupBy("doc")
        .agg(
            F.sum("_c").alias("_toks"),
            F.sum(F.col("_c") * F.log10(F.col("_tf"))).alias("_sum_log"),
        )
    )
    return per_doc.join(F.broadcast(total)).select(
        "doc",
        (
            F.col("_sum_log") / F.col("_toks") - F.log10(F.col("_n"))
        ).alias("mean_unigram_logprob"),
    )


def gopher_repetition_pass(
    stats: DataFrame,
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> Column:
    """Boolean pass/fail column applying the Gopher repetition thresholds
    to a :func:`repetition_stats` frame."""
    cond = (F.col("dup_line_frac") <= GOPHER_DUP_LINE_FRAC) & (
        F.col("dup_line_char_frac") <= GOPHER_DUP_LINE_CHAR_FRAC
    )
    for n in top_ns:
        cond = cond & (
            F.col(f"top{n}gram_char_frac") <= GOPHER_TOP_NGRAM_CHAR_FRAC[n]
        )
    for n in dup_ns:
        cond = cond & (
            F.col(f"dup{n}gram_char_frac") <= GOPHER_DUP_NGRAM_CHAR_FRAC[n]
        )
    return cond


def _position_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, w, w1, w2) — every token position with its 1- and 2-back
    contexts, built from one array-staged transform (no shuffle; the
    staged `ws` attribute keeps the HOF lambda from re-running
    split+filter per element, CLAUDE.md rule)."""
    words = F.split(F.trim(normalized_text(F.col(text_col))), r"\s+")
    staged = df.select(
        F.col(id_col).alias("doc"),
        F.filter(words, lambda w: F.length(w) > 0).alias("ws"),
    )
    ws = F.col("ws")
    pos = F.transform(
        ws,
        lambda w, i: F.struct(
            w.alias("w"),
            F.when(i >= 1, F.get(ws, i - 1)).alias("w1"),
            F.when(i >= 2, F.get(ws, i - 2)).alias("w2"),
        ),
    )
    return staged.select("doc", F.explode(pos).alias("t")).select(
        "doc", "t.w", "t.w1", "t.w2"
    )


class NgramLM(NamedTuple):
    """A fitted Stupid Backoff trigram model: the three count tables
    (ordinary DataFrames — vocabulary-sized, so broadcastable once the
    model is FIXED rather than corpus-derived) plus the unpruned corpus
    token total. Produced by :func:`fit_ngram_lm`, persisted/reloaded by
    functions/ngram_io.py, consumed by ``ngram_lm_logprob(lm=...)``."""

    uni: DataFrame  # (w, c1w)
    bi: DataFrame  # (w1, w, c2)
    tri: DataFrame  # (w2, w1, w, c3)
    n_corpus: float  # total token count (unpruned)


def fit_ngram_lm(
    lm_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> NgramLM:
    """Count the Stupid Backoff trigram model from a reference corpus —
    the build half of CCNet's setup (count Wikipedia once, score every
    CommonCrawl shard against the fixed model). Three map-side-combined
    aggregates over one array-staged position table; the only driver
    action is the single-row token total (model-metadata-sized)."""
    lm_toks = _position_table(lm_df, text_col, id_col).localCheckpoint(
        eager=False
    )
    uni = lm_toks.groupBy("w").agg(F.count("*").alias("c1w"))
    bi = (
        lm_toks.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w")
        .agg(F.count("*").alias("c2"))
    )
    tri = (
        lm_toks.filter(F.col("w2").isNotNull())
        .groupBy("w2", "w1", "w")
        .agg(F.count("*").alias("c3"))
    )
    n = uni.agg(F.sum("c1w")).first()[0]
    return NgramLM(uni=uni, bi=bi, tri=tri, n_corpus=float(n or 0))


def prune_ngram_lm(lm: NgramLM, min_count: int) -> NgramLM:
    """KenLM-style count pruning with ONE threshold across all orders.
    Count monotonicity (every (w2,w1,w) occurrence is also a (w2,w1),
    (w1,w), and (w1) occurrence) means a surviving trigram's backoff
    contexts always survive too, so the scorer's branch invariants —
    c2ctx non-null wherever c3 is, scores ≤ 1 — hold on the pruned
    model. A pruned gram backs off exactly like an unseen one (Brants
    EMNLP'07 §3: quality degrades gracefully under pruning). n_corpus
    stays the UNPRUNED token total: it is the corpus size, and keeping
    it makes pruned singletons score identically to OOV words."""
    if min_count <= 1:
        return lm
    t = F.lit(min_count)
    return NgramLM(
        uni=lm.uni.filter(F.col("c1w") >= t),
        bi=lm.bi.filter(F.col("c2") >= t),
        tri=lm.tri.filter(F.col("c3") >= t),
        n_corpus=lm.n_corpus,
    )


def ngram_lm_logprob(
    df: DataFrame,
    lm_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    lm: NgramLM | None = None,
) -> DataFrame:
    """Per-document mean log10 Stupid Backoff trigram score (Brants et
    al., "Large Language Models in Machine Translation", EMNLP 2007) —
    the n-gram upgrade of :func:`unigram_logprob`. This is CCNet's
    filtering setup: `lm_df` is the reference corpus the model is counted
    from (CCNet uses a Wikipedia KenLM); `df` is the corpus being scored.
    `lm_df=None` scores the corpus against itself (ranking junk without
    an external model — note the backoff branches can then never fire,
    since every observed n-gram is in its own table). Per token position,
    scored at the highest order its context allows:

        S(w | w2 w1) = c3/c2(w2,w1)            if the LM saw the trigram
                     = α · c2(w1,w)/c1(w1)     else if it saw the bigram
                     = α² · c1(w)/N            else  (OOV words score as
                                                      count-1 singletons)
    (positions 0/1 start at the order their context allows, unpenalized.)

    Scale shape: the position table comes from one array-staged transform
    (no shuffle); the per-doc distinct-triple table then LEFT-joins the
    LM trigram/bigram/unigram count tables — all map-side-combined
    aggregates of the LM's position table. This join fan is the honest
    cost of corpus-sized LMs. A FIXED external model — `lm=`, a
    :class:`NgramLM` from :func:`fit_ngram_lm` or
    functions/ngram_io.load_ngram_lm — is broadcast instead: every count
    join becomes a BroadcastHashJoin and scoring is map-side (CCNet's
    production shape: one pruned KenLM scores every incoming shard;
    plan-pinned shuffle-free in tests/test_ngram_io.py).

    Scores are ≤ 1 by construction (each numerator counts a refinement of
    its denominator, and OOV singletons are ≤ N), so the mean log10 is
    ≤ 0. Transcendental → not in the bit-exact oracle surface;
    brute-force reference parity in tests/test_ngram_lm.py.
    """
    if lm is not None and lm_df is not None:
        raise ValueError("pass lm= (fitted model) or lm_df= (corpus), not both")
    toks = _position_table(df, text_col, id_col)
    if lm is not None:
        uni, bi, tri = lm.uni, lm.bi, lm.tri
        total = None
        wrap = F.broadcast  # fixed model: every count join map-side
    else:
        if lm_df is None:
            toks = toks.localCheckpoint(eager=False)  # five consumers below
            lm_toks = toks
        else:
            lm_toks = _position_table(
                lm_df, text_col, id_col
            ).localCheckpoint(eager=False)

        # uni feeds THREE consumers (the w join, the re-keyed w1-context
        # join, and the corpus total) and bi TWO (the (w1,w) join and the
        # re-keyed (w2,w1)-context join) — without materialization each
        # reference re-runs its whole count aggregate over the position
        # table (r14, guide §2.4: a DAG has no sharing across join
        # inputs). Both tables are vocabulary-sized (Heaps' law), so the
        # checkpoints are model-sized; 6 count passes become 3.
        uni = lm_toks.groupBy("w").agg(F.count("*").alias("c1w")).localCheckpoint(
            eager=False
        )
        bi = (
            lm_toks.filter(F.col("w1").isNotNull())
            .groupBy("w1", "w")
            .agg(F.count("*").alias("c2"))
            .localCheckpoint(eager=False)
        )
        tri = (
            lm_toks.filter(F.col("w2").isNotNull())
            .groupBy("w2", "w1", "w")
            .agg(F.count("*").alias("c3"))
        )
        total = uni.agg(F.sum("c1w").cast("double").alias("n_corpus"))

        def wrap(t):  # corpus-sized tables: let the planner pick
            return t

    dt = toks.groupBy("doc", "w", "w1", "w2").agg(F.count("*").alias("_c"))
    scored = (
        dt.join(wrap(tri), ["w2", "w1", "w"], "left")
        .join(wrap(bi), ["w1", "w"], "left")
        .join(
            wrap(
                bi.select(
                    F.col("w1").alias("w2"),
                    F.col("w").alias("w1"),
                    F.col("c2").alias("c2ctx"),
                )
            ),
            ["w2", "w1"],
            "left",
        )
        .join(
            wrap(
                uni.select(
                    F.col("w").alias("w1"), F.col("c1w").alias("c1ctx")
                )
            ),
            ["w1"],
            "left",
        )
        .join(wrap(uni), ["w"], "left")
    )
    if total is None:
        scored = scored.withColumn("n_corpus", F.lit(float(lm.n_corpus)))
    else:
        scored = scored.join(F.broadcast(total))
    a = F.lit(alpha)
    c1w = F.coalesce(F.col("c1w"), F.lit(1))  # OOV → count-1 singleton
    score = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c2ctx"))
        .when(
            F.col("w2").isNotNull() & F.col("c2").isNotNull(),
            a * F.col("c2") / F.col("c1ctx"),
        )
        .when(F.col("w2").isNotNull(), a * a * c1w / F.col("n_corpus"))
        .when(
            F.col("w1").isNotNull() & F.col("c2").isNotNull(),
            F.col("c2") / F.col("c1ctx"),
        )
        .when(F.col("w1").isNotNull(), a * c1w / F.col("n_corpus"))
        .otherwise(c1w / F.col("n_corpus"))
    )
    return scored.groupBy("doc").agg(
        F.sum("_c").alias("n_scored"),
        (F.sum(F.col("_c") * F.log10(score)) / F.sum("_c")).alias(
            "mean_sb_logprob"
        ),
    )


def perplexity_buckets(
    scores: DataFrame,
    score_col: str = "mean_sb_logprob",
    doc_col: str = "doc",
    fractions: tuple[float, float] = (1 / 3.0, 2 / 3.0),
    exact: bool = True,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. LREC'20 §4.3): rank
    documents by LM score and cut the corpus at the given quantiles —
    head = best-scoring (most reference-like), tail = worst. Downstream,
    mixtures sample the buckets at different rates (CCNet keeps head+
    middle; `sampling.stratified_sample` takes `bucket` as the stratum).

    The two cut points come from one percentile aggregate (a single
    skinny row) broadcast back over the scores — no sort of the corpus,
    no driver round-trip. Ties sit in the lower bucket on both engines
    (percentile is interpolated; comparison is strict >).

    `exact=True` (default, deterministic) buffers every score in ONE
    aggregation buffer — correct up to ~10^8 docs, wrong at corpus scale.
    Past that, `exact=False` switches to percentile_approx (a mergeable
    KLL-style sketch, constant memory per task, map-side combined): cuts
    move by at most the sketch error, which only reassigns docs whose
    score sits within that band of a boundary — the CCNet mixture is
    insensitive to that (the same velocity_sliding exact→approx flip
    documented in SCALE.md)."""
    lo, hi = fractions
    fn = "percentile" if exact else "percentile_approx"
    cuts = scores.agg(
        F.expr(f"{fn}({score_col}, {1.0 - lo})").alias("_head_cut"),
        F.expr(f"{fn}({score_col}, {1.0 - hi})").alias("_mid_cut"),
    )
    return scores.join(F.broadcast(cuts)).select(
        F.col(doc_col),
        F.col(score_col),
        F.when(F.col(score_col) > F.col("_head_cut"), "head")
        .when(F.col(score_col) > F.col("_mid_cut"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """The removal transform that :func:`boilerplate_line_stats` is the
    signal for: rebuild each document with its cross-document boilerplate
    lines (lines occurring in >= `min_docs` DISTINCT docs) cut out.

    Output: (doc, stripped_text, n_lines_removed) — empty docs survive
    with empty text (the caller decides whether to drop them; removal
    must never silently lose rows). Surviving lines are reassembled
    BYTE-IDENTICAL to the original document: boilerplate identity keys
    on md5(trim(line)) but blank lines and per-line leading/trailing
    whitespace are preserved, so a doc with zero boilerplate round-trips
    unchanged (no silent normalization — blank-only lines are never
    boilerplate candidates regardless of how many docs contain them).

    Shape: posexplode keeps line order; the corpus line table (hashed —
    the shuffle key is a fixed-width md5, not the line text, per the
    stats function's scale note) LEFT-joins the boilerplate subset to
    flag removals; reassembly is one per-doc sort-aggregate of the
    surviving original lines — array_agg over (pos, line) structs,
    sorted, joined. One extra shuffle over the stats pass, keyed by doc.
    """
    lines = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.trim(F.col("line"))))
    boiler = (
        lines.filter(F.length(F.trim(F.col("line"))) > 0)
        .groupBy("lh")
        .agg(F.count_distinct("doc").alias("line_df"))
        .filter(F.col("line_df") >= min_docs)
        .select("lh", F.lit(True).alias("_boiler"))
    )
    flagged = lines.join(boiler, "lh", "left")
    rebuilt = flagged.groupBy("doc").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_boiler").isNull(),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("stripped_text"),
        F.sum(F.when(F.col("_boiler"), 1).otherwise(0)).alias("n_lines_removed"),
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(rebuilt, "doc", "left")
        .select(
            "doc",
            F.coalesce("stripped_text", F.lit("")).alias("stripped_text"),
            F.coalesce("n_lines_removed", F.lit(0)).alias("n_lines_removed"),
        )
    )
