"""Deduplication operators for large-scale training-data pipelines.

Exact dedup, MinHash+LSH, SimHash, and n-gram Jaccard — each expressed so the
expensive part is a hash-partitioned shuffle on a small key (fingerprint /
band bucket), never an all-pairs comparison. At 100 TB the candidate
generation is linear scans + one shuffle per band; only bucket-mates are
compared pairwise.

All hashes derive from md5 (functions/hashing.py) so results are reproducible
across engines and across Spark versions — xxhash64 seeds are fine in
production, but determinism here is worth the few extra cycles, and md5 is
still evaluated JVM-side inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bigint, md5_bigint64
from ..functions.text import normalized_text


def _shingles_from_words(words: Column, k: int) -> Column:
    """k-shingles from a word array. Documents with fewer than k words fall
    back to the WHOLE normalized text as a single shingle, so short docs
    keep content-dependent signatures (a constant fallback would make every
    short doc a false near-duplicate of every other). The DuckDB oracle
    (_SQL_SHINGLES, suite/dedup_q.py) mirrors this CASE exactly."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles of the normalized text as an array<string>.

    Column-level form for ad-hoc use. In scan-heavy operators prefer
    :func:`shingle_table`: here the word array feeds a transform LAMBDA, and
    expressions referenced under a higher-order-function lambda are
    re-evaluated per element (no subexpression elimination under lambdas),
    so the split+regexp runs once per shingle position — measured 3× slower
    than the staged form at sf0.1.
    """
    return _shingles_from_words(F.split(F.trim(normalized_text(text)), r"\s+"), k)


def shingle_table(df: DataFrame, text_col: str, id_col: str, k: int = 3,
                  distinct: bool = False, exploded: bool = False) -> DataFrame:
    """Shingles with the word array STAGED as a bound column before the
    shingling lambda — the O(n) form (see :func:`word_shingles`). The
    multiple references to the staged alias keep CollapseProject from
    re-inlining the split into the lambda.

    `exploded=True` returns (doc, s: one shingle per row) with the explode
    applied DIRECTLY over the staged frame. Do not wrap the array in an
    intermediate single-reference alias and explode that one level up: the
    alias collapses into the Generate and drags the word-split back under
    the lambda — measured 7× slower at sf0.1 (19.7 s vs 2.7 s minhash).
    `exploded=False` returns (doc, sh: array<string>).
    """
    staged = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(normalized_text(F.col(text_col))), r"\s+").alias("_w"),
    )
    sh = _shingles_from_words(F.col("_w"), k)
    if distinct:
        sh = F.array_distinct(sh)
    if exploded:
        return staged.select("doc", F.explode(sh).alias("s"))
    return staged.select("doc", sh.alias("sh"))


def minhash(shingles: Column, num_perm: int = 4) -> list[Column]:
    """MinHash signature: one min-over-salted-hashes per permutation.

    Expression form (higher-order functions, interpreted). For the scan-heavy
    path prefer :func:`minhash_signatures` — explode + hash-aggregate stays
    inside whole-stage codegen and computes the shingling once.
    """
    return [
        F.array_min(F.transform(shingles, lambda s: md5_bigint(s, salt=f"perm{p}:")))
        for p in range(num_perm)
    ]


def _minhash_sigs_arrow(
    df: DataFrame, text_col: str, id_col: str, num_perm: int, shingle_k: int
) -> DataFrame:
    """Arrow kernel form of :func:`minhash_signatures` (round 13, guide
    §4.2 — the `_simhash_sigs_arrow` / `_winnow_fps_arrow` precedent): a
    MinHash signature is a purely per-document quantity, so one
    mapInPandas replays the whole normalize → split → k-shingle (with the
    short-doc whole-text fallback) → salted-md5 → min-per-permutation
    chain locally — no explode, no groupBy exchange. Mins over integer
    hashes are order-free and md5 is md5 on every engine, so output is
    BIT-IDENTICAL to the expression form — pinned by
    tests/test_minhash_kernel.py incl. null / empty / short-doc /
    non-ASCII edges. NULL-text docs are KEPT and hash like the empty doc
    (unlike simhash's explode-drop): in the expression chain
    concat_ws(" ", NULL_word_array) is "", so the short-doc fallback
    emits the empty shingle — the kernel replays that exactly."""
    import re as _re

    from pyspark.sql.types import LongType, StructField, StructType

    id_field = df.schema[id_col]
    schema = StructType(
        [StructField("doc", id_field.dataType, id_field.nullable)]
        + [StructField(f"mh{p}", LongType(), True) for p in range(num_perm)]
    )
    sel = df.select(id_col, text_col)
    norm = _re.compile(r"[^a-z0-9]+")
    salts = [f"perm{p}:".encode() for p in range(num_perm)]

    def kernel(batches):
        import hashlib

        import pandas as pd

        md5 = hashlib.md5
        k = shingle_k

        def mins_for(t):
            tt = norm.sub(" ", t.lower()).strip()
            # JVM split("", "\\s+") yields [""] — short docs fall back to
            # the whole normalized text as ONE shingle (concat_ws of the
            # word array), exactly like _shingles_from_words
            words = _re.split(r"\s+", tt)
            n = len(words)
            if n < k:
                shingles = {" ".join(words)}
            else:
                shingles = {" ".join(words[i : i + k]) for i in range(n - k + 1)}
            out = []
            for salt in salts:
                out.append(
                    min(
                        int(md5(salt + s.encode()).hexdigest()[:15], 16)
                        for s in shingles
                    )
                )
            return out

        for pdf in batches:
            rows = {"doc": [], **{f"mh{p}": [] for p in range(num_perm)}}
            for i, txt in enumerate(pdf[text_col]):
                if txt is None or not isinstance(txt, str):
                    txt = ""  # NULL text hashes like the empty doc (see above)
                ms = mins_for(txt)
                rows["doc"].append(pdf[id_col].iloc[i])
                for p, v in enumerate(ms):
                    rows[f"mh{p}"].append(v)
            yield pd.DataFrame(rows)

    return sel.mapInPandas(kernel, schema)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 4,
    shingle_k: int = 3,
    use_arrow: bool = True,
) -> DataFrame:
    """MinHash signatures via explode → groupBy(id).agg(min(hash_p)).

    Shingles materialize once per document; the per-shingle md5s and the min
    aggregation are codegen'd with map-side partial aggregation, so the
    shuffle carries only (id, num_perm mins) — the scale shape of the
    expression form.

    `use_arrow=True` (the default since round 13) routes through
    :func:`_minhash_sigs_arrow` — bit-identical output, shuffle-FREE (the
    signature is per-document, so the kernel needs no explode and no
    groupBy exchange) and without the md5-chain's multi-second per-session
    codegen cost. The expression form remains for plan comparison and as
    the no-Python-boundary fallback.
    """
    if use_arrow:
        return _minhash_sigs_arrow(df, text_col, id_col, num_perm, shingle_k)
    exploded = shingle_table(df, text_col, id_col, shingle_k, exploded=True)
    return exploded.groupBy("doc").agg(
        *[
            F.min(md5_bigint(F.col("s"), salt=f"perm{p}:")).alias(f"mh{p}")
            for p in range(num_perm)
        ]
    )


def _winnow_fps_arrow(df: DataFrame, text_col: str, id_col: str,
                      k: int, w: int) -> DataFrame:
    """Arrow kernel form of :func:`winnow_fingerprint_table` (round 13,
    guide §4.2): the expression form hashes every character position of
    every document through an INTERPRETED higher-order-function chain
    (HOF lambdas never enter codegen — repo-wide empirical fact), which
    was the single largest per-row cost left in the dedup family
    (~1.5 s warm at sf0.1 for ~1.4 M md5 evaluations). One mapInPandas
    kernel computes the identical normalize → k-gram md5 → window-min →
    sorted-distinct chain per partition; everything is integer/string
    arithmetic (no IEEE concerns) and md5 is md5 on every engine, so the
    output is BIT-IDENTICAL to the expression form — pinned by
    tests/test_winnow_kernel.py, which also pins non-ASCII inputs (the
    normalization regex maps everything outside [a-z0-9] to space, so
    JVM/Python substring semantics agree after it)."""
    import re as _re
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    id_field = df.schema[id_col]
    schema = StructType([
        StructField(id_col, id_field.dataType, id_field.nullable),
        StructField("fps", ArrayType(LongType()), False),
    ])
    sel = df.select(id_col, text_col)
    norm = _re.compile(r"[^a-z0-9]+")

    def kernel(batches):
        import hashlib

        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            fps_out = []
            for t in pdf[text_col]:
                if t is None or not isinstance(t, str):
                    # expression-form NULL propagation: every gram hash is
                    # null, so the fingerprint set collapses to [null]
                    fps_out.append([None])
                    continue
                t = norm.sub(" ", t.lower()).strip()
                n_grams = max(len(t) - k + 1, 1)
                hs = [
                    int(md5(b"winnow:" + t[i : i + k].encode()).hexdigest()[:15], 16)
                    for i in range(n_grams)
                ]
                n_wins = max(len(hs) - w + 1, 1)
                fps_out.append(sorted({min(hs[i : i + w]) for i in range(n_wins)}))
            yield pd.DataFrame({id_col: pdf[id_col], "fps": fps_out})

    return sel.mapInPandas(kernel, schema)


def winnow_fingerprint_table(df: DataFrame, text_col: str, id_col: str,
                             k: int = 5, w: int = 4,
                             use_arrow: bool = True) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
    hash every character k-gram of the normalized text, then keep the
    minimum hash of each sliding window of w consecutive k-gram hashes.
    Guarantees any shared substring of length >= k + w - 1 contributes at
    least one shared fingerprint — the rolling-hash dedup primitive the
    md5-whole-text fingerprint can't provide.

    Returns (id, fps: sorted distinct array<long>). Pure expression (no
    UDF), staged as one projection per array so every lambda operates on a
    BOUND column: an expression referenced inside a higher-order-function
    lambda is re-evaluated per element (Spark's subexpression elimination
    does not reach under lambdas), so inlining text→grams→hashes→minima in
    one expression is O(n²) per document — measured 25× slower at sf0.001.
    Multiple references to each staged alias also stop CollapseProject from
    re-inlining them. Docs shorter than k characters degenerate to one
    whole-text fingerprint via the greatest(..., 1) bounds (substr past the
    end truncates identically on Spark and DuckDB — no oracle special
    case).

    `use_arrow=True` (the default since round 13) routes through
    :func:`_winnow_fps_arrow` — bit-identical output, ~5x cheaper per row
    (the HOF chain is interpreted; the kernel is one Arrow crossing).
    The expression form remains for plan-comparison and as the
    no-Python-boundary fallback."""
    if use_arrow:
        return _winnow_fps_arrow(df, text_col, id_col, k, w)
    t = F.trim(normalized_text(F.col(text_col)))
    staged = df.select(F.col(id_col).alias("_id"), t.alias("_t"))
    tt = F.col("_t")
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(tt) - k + 1, F.lit(1))),
        lambda i: md5_bigint(F.substr(tt, i, F.lit(k)), salt="winnow:"),
    )
    staged = staged.select("_id", hashes.alias("_hs"))
    hs = F.col("_hs")
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(hs) - w + 1, F.lit(1))),
        lambda i: F.array_min(F.slice(hs, i, w)),
    )
    return staged.select(
        F.col("_id").alias(id_col),
        F.array_sort(F.array_distinct(wins)).alias("fps"),
    )


def winnow_digest(df: DataFrame, text_col: str, id_col: str,
                  k: int = 5, w: int = 4) -> DataFrame:
    """Per-document winnowing summary: fingerprint count + an md5 digest of
    the sorted fingerprint set (1 row/doc, bounded output)."""
    fp = winnow_fingerprint_table(df, text_col, id_col, k, w)
    return fp.select(
        id_col,
        F.size("fps").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.transform(F.col("fps"), lambda x: x.cast("string")))).alias(
            "fp_digest"
        ),
    )


def winnow_candidate_pairs(df: DataFrame, text_col: str, id_col: str,
                           k: int = 5, w: int = 4,
                           min_shared: int = 2,
                           max_doc_freq: int | None = 100,
                           materialize: str = "local_checkpoint",
                           materialize_path: str | None = None) -> DataFrame:
    """Near-dup candidates via shared winnowing fingerprints: explode each
    doc's fingerprint set and equi-join on the fingerprint — the same
    linear-scan + small-key-shuffle shape as LSH banding (never all-pairs).
    Returns (doc_a, doc_b, shared_fingerprints) for pairs sharing at least
    `min_shared` fingerprints.

    `max_doc_freq` drops fingerprints present in more than that many
    documents before the self-join (the IDF-style pruning every
    fingerprint-overlap system needs): a character k-gram window shared by
    D documents contributes D² join rows while carrying no near-dup signal
    — on a common-vocabulary corpus the unpruned join is quadratic in
    practice (observed: 500 fixture docs → minutes). The frequency count
    runs on the small (doc, fp) table, not the corpus.

    The fingerprint table is materialized (see :func:`_materialize`) BEFORE
    the explode, for two reasons: (1) both the hot-fp count and the
    self-join reuse it; (2) `explode` over a computed array expression is
    O(n²) per document — Spark's Generate re-evaluates the generator
    expression per OUTPUT element, not per input row (measured: explode
    over the winnowing expression 100×+ slower than explode over the same
    array as a materialized column at sf0.001)."""
    fp = _materialize(
        winnow_fingerprint_table(df, text_col, id_col, k, w),
        materialize, materialize_path,
    ).select(F.col(id_col).alias("doc"), F.explode("fps").alias("fp"))
    if max_doc_freq is not None:
        hot = fp.groupBy("fp").agg(F.count("*").alias("_df")).filter(
            F.col("_df") > max_doc_freq
        )
        fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    # Materialize the PRUNED exploded table before the self-join (r14,
    # guide §2.4): each alias below is a separate subtree, so without this
    # both sides re-run the explode AND the whole hot-frequency anti-join
    # (4 Generates + 2 count shuffles in the before-plan; 1 + 1 after).
    # Only for the re-materializable strategies — `table` would need a
    # second path and `none` opted out of materialization entirely.
    if materialize in ("local_checkpoint", "checkpoint"):
        fp = _materialize(fp, materialize, None)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


def exact_dedup(df: DataFrame, fingerprint: Column, id_col: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint, keep the lowest
    id as survivor. One shuffle on the fingerprint."""
    return (
        df.withColumn("fp", fingerprint)
        .groupBy("fp")
        .agg(F.min(id_col).alias("survivor_id"), F.count("*").alias("dup_count"))
    )


def _materialize(df: DataFrame, strategy: str, path: str | None) -> DataFrame:
    """Materialization strategies for a subtree both sides of a self-join
    share (a DAG has no sharing across join inputs, so an unmaterialized
    subtree computes twice):

    - ``local_checkpoint`` — executor-local storage; fastest, but lineage is
      broken and blocks are lost with the executor (fine on a static
      cluster / local mode).
    - ``checkpoint`` — reliable checkpoint to ``spark.sparkContext
      .setCheckpointDir`` storage; survives executor loss, the right choice
      with dynamic allocation or spot instances.
    - ``table`` — explicit parquet write-read via ``path``; the result is
      inspectable and reusable across jobs (the band table is tiny:
      (id, band, bucket-hash) per doc per band, regardless of corpus size).
    - ``none`` — no materialization (the subtree computes once per join
      side; only sensible when the upstream is itself a cheap scan).
    """
    if strategy == "local_checkpoint":
        return df.localCheckpoint(eager=False)
    if strategy == "checkpoint":
        return df.checkpoint(eager=False)
    if strategy == "table":
        if path is None:
            raise ValueError("materialize='table' requires materialize_path")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    if strategy == "none":
        return df
    raise ValueError(f"unknown materialize strategy: {strategy!r}")


def band_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 4,
    band_size: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc, band, bucket) — the LSH band index of a corpus: each document
    appears once per band, bucketed by the md5 of that band's minhash rows.

    Bands come from ONE explode, not a Union of per-band selects: a Union
    replans (and rescans) the whole signature subtree once per band —
    observed 4× signature computation for 2 bands in the self-join plan.
    In production this table is the thing to persist (write it once per
    ingest via ``materialize='table'`` in the candidate functions, or
    store it as a real table): incremental batches then probe it without
    touching corpus text at all.
    """
    sig = minhash_signatures(df, text_col, id_col, num_perm, shingle_k)
    n_bands = num_perm // band_size
    band_structs = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * band_size + r}") for r in range(band_size)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("_", F.lit(str(b)), *[c.cast("string") for c in cols])).alias(
                    "bucket"
                ),
            )
        )
    return sig.select(
        "doc", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 4,
    band_size: int = 2,
    shingle_k: int = 3,
    materialize: str = "local_checkpoint",
    materialize_path: str | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding: shingle → minhash → band buckets → self-join
    per bucket. Returns candidate pairs (id_a < id_b) with their band.

    Scale shape: the self-join shuffles on the band key only; bucket sizes
    are the skew risk — one bucket of B docs yields B² candidate pairs, and
    at corpus scale boilerplate (empty pages, license headers, templated
    text) lands thousands of docs in one bucket. `max_bucket_size` caps
    that: buckets above the cap are dropped from candidate generation
    entirely (their members are template-duplicates better handled by
    EXACT dedup on the fingerprint, which is O(B), not O(B²)) — the
    standard guard in production near-dup pipelines. The cap decision is a
    count over the tiny band table, not the corpus. `materialize` picks how
    the band table is pinned before the self-join — see
    :func:`_materialize`; the default executor-local form is right for
    local mode, `checkpoint`/`table` for clusters that lose executors.
    """
    tagged = band_table(df, text_col, id_col, num_perm, band_size, shingle_k)
    tagged = _materialize(tagged, materialize, materialize_path)
    if max_bucket_size is not None:
        sizes = tagged.groupBy("band", "bucket").agg(F.count("*").alias("_bsz"))
        tagged = (
            tagged.join(
                F.broadcast(sizes.filter(F.col("_bsz") > max_bucket_size)),
                ["band", "bucket"],
                "left_anti",
            )
        )
    left = tagged.alias("l")
    right = tagged.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_candidates_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 4,
    band_size: int = 2,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
    corpus_bands: DataFrame | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates between a NEW batch and the EXISTING corpus —
    the incremental form a continuously-growing corpus needs: each fresh
    crawl is checked against everything already ingested WITHOUT
    re-pairing the corpus with itself (the self-join form is O(corpus)
    per ingest; this is O(batch) + one corpus probe).

    Returns (new_doc, corpus_doc) candidate pairs. Docs duplicated WITHIN
    the new batch are :func:`minhash_lsh_candidates`'s job on the batch
    alone — compose both for a full ingest check.

    Scale shape: the new batch's band table is tiny next to the corpus and
    BROADCASTS into the equi-join, so corpus band rows are probed map-side
    and the corpus never shuffles. Pass ``corpus_bands`` (a persisted
    :func:`band_table` — the production pattern) to skip recomputing the
    corpus index per ingest; then the per-ingest cost is one scan of the
    band INDEX, not the corpus text. ``max_bucket_size`` drops corpus
    boilerplate buckets exactly like the self-join form (the cap count
    runs over the band index, not the corpus).
    """
    if corpus_bands is None:
        corpus_bands = band_table(
            corpus_df, text_col, id_col, num_perm, band_size, shingle_k
        )
    if max_bucket_size is not None:
        sizes = corpus_bands.groupBy("band", "bucket").agg(
            F.count("*").alias("_bsz")
        )
        corpus_bands = corpus_bands.join(
            F.broadcast(sizes.filter(F.col("_bsz") > max_bucket_size)),
            ["band", "bucket"],
            "left_anti",
        )
    if new_bands is None:
        new_bands = band_table(
            new_df, text_col, id_col, num_perm, band_size, shingle_k
        )
    return (
        corpus_bands.alias("c")
        .join(
            F.broadcast(new_bands.alias("n")),
            (F.col("c.band") == F.col("n.band"))
            & (F.col("c.bucket") == F.col("n.bucket")),
        )
        .select(
            F.col("n.doc").alias("new_doc"), F.col("c.doc").alias("corpus_doc")
        )
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Joins the (small) candidate-pair set back to the corpus twice — both are
    equi joins on the doc id; the shingle arrays only materialize for
    candidates, not the whole corpus. Pass a prebuilt (checkpointed)
    `shingles` (doc, sh) table to share one shingle computation with the
    candidate generator (setsim.jaccard_similarity_join does) — the a/b
    join sides then read the same materialized blocks instead of running
    the shingle chain once each.
    """
    sh = shingles
    if sh is None:
        sh = shingle_table(df, text_col, id_col, shingle_k, distinct=True)
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        pairs.join(a, pairs.doc_a == F.col("a.doc"))
        .join(b, pairs.doc_b == F.col("b.doc"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size(F.array_union("a.sh", "b.sh")).cast("double")
            ).alias("jaccard"),
        )
    )


def _bit_value(j: int) -> int:
    """Bit j as a signed 64-bit literal (bit 63 is the sign bit — 1 << 63
    overflows LongType, so it is represented as Long.MIN_VALUE)."""
    return (1 << j) if j < 63 else -(1 << 63)


def _simhash_word_hash(w: Column, bits: int) -> Column:
    """Word hash feeding the SimHash votes: the 60-bit md5 truncation for
    signatures up to 60 bits; the full 64-bit two's-complement hash when all
    64 bit positions must be able to vote (bits 60-63 of the truncated form
    are always 0, which would silently degrade a "64-bit" signature to 60)."""
    fn = md5_bigint64 if bits > 60 else md5_bigint
    return fn(w, salt="simhash:")


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash signature over word hashes: for each bit position, sum +1/-1
    votes across word hashes, set the bit when the vote is positive.

    Pure higher-order-function expression (no UDF): transform over bit
    positions, aggregate over words.
    """
    words = F.array_distinct(F.split(F.trim(normalized_text(text)), r"\s+"))
    hashes = F.transform(words, lambda w: _simhash_word_hash(w, bits))
    def bit_vote(j: int) -> Column:
        mask = F.lit(_bit_value(j)).cast("long")
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(bit_vote(j) > 0, F.lit(_bit_value(j)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def _simhash_sigs_arrow(
    df: DataFrame, text_col: str, id_col: str, widths: tuple[int, ...]
) -> DataFrame:
    """Arrow kernel form of :func:`simhash_signatures` (round 13, guide
    §4.2, the `_winnow_fps_arrow` precedent): a SimHash signature is a
    purely per-document quantity, so one mapInPandas computes the whole
    normalize → distinct-words → salted-md5 → integer bit votes → sign
    chain locally — no explode, no groupBy, ZERO exchanges where the
    expression form shuffles (doc, 80 partial sums). Bit votes are
    integer sums (order-free) and md5 is md5 on every engine, so output
    is BIT-IDENTICAL to the expression form — pinned by
    tests/test_simhash_kernel.py incl. null/empty/non-ASCII edges.
    NULL-text docs are DROPPED, replaying explode(NULL array) exactly."""
    import re as _re

    from pyspark.sql.types import LongType, StructField, StructType

    id_field = df.schema[id_col]
    schema = StructType(
        [StructField("doc", id_field.dataType, id_field.nullable)]
        + [StructField(f"simhash{b}", LongType(), True) for b in widths]
    )
    sel = df.select(id_col, text_col)
    norm = _re.compile(r"[^a-z0-9]+")

    def kernel(batches):
        import hashlib

        import pandas as pd

        md5 = hashlib.md5

        def sig_for(t):
            tt = norm.sub(" ", t.lower()).strip()
            # JVM split("", "\\s+") yields [""] — the empty word still
            # votes, exactly like the expression form
            words = set(_re.split(r"\s+", tt))
            # one digest per word: every width truncates the SAME md5
            # (15 hex vs 16 hex two's-complement), so hash once and
            # derive both values from it (ADVICE r13)
            digests = [md5(b"simhash:" + w.encode()).hexdigest() for w in words]
            sigs = []
            for b in widths:
                if b > 60:
                    hs = []
                    for d in digests:
                        v = int(d[:16], 16)
                        if v >= 1 << 63:
                            v -= 1 << 64  # md5_bigint64 two's complement
                        hs.append(v)
                else:
                    hs = [int(d[:15], 16) for d in digests]
                sig = 0
                nw = len(hs)
                for j in range(b):
                    mask = 1 << j
                    ones = sum(1 for h in hs if h & mask)
                    if 2 * ones - nw > 0:  # vote_j = ones - (nw - ones)
                        sig |= mask
                if sig >= 1 << 63:
                    sig -= 1 << 64
                sigs.append(sig)
            return sigs

        for pdf in batches:
            rows = {"doc": [], **{f"simhash{b}": [] for b in widths}}
            for i, txt in enumerate(pdf[text_col]):
                if txt is None or not isinstance(txt, str):
                    continue
                s = sig_for(txt)
                rows["doc"].append(pdf[id_col].iloc[i])
                for b, v in zip(widths, s):
                    rows[f"simhash{b}"].append(v)
            yield pd.DataFrame(rows)

    return sel.mapInPandas(kernel, schema)


def simhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int | tuple[int, ...] = 16,
    use_arrow: bool = True,
) -> DataFrame:
    """SimHash via explode(distinct words) → one hash per word → groupBy(id)
    with `bits` codegen'd vote sums — the scan-once aggregate form of
    :func:`simhash` (same output). `bits` may be a tuple of widths (e.g.
    ``(16, 64)``): all signatures come out of the SAME scan + shuffle, one
    `simhash{b}` column per width.

    `use_arrow=True` (the default since round 13) routes through
    :func:`_simhash_sigs_arrow` — bit-identical output, ~2× cheaper warm
    and shuffle-free (the signature is per-document, so the kernel needs
    no explode and no groupBy exchange). The expression form remains for
    plan comparison and as the no-Python-boundary fallback."""
    widths = (bits,) if isinstance(bits, int) else tuple(bits)
    if use_arrow:
        return _simhash_sigs_arrow(df, text_col, id_col, widths)
    words = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.split(F.trim(normalized_text(F.col(text_col))), r"\s+"))
        ).alias("w"),
    )
    for b in widths:
        words = words.withColumn(f"h{b}", _simhash_word_hash(F.col("w"), b))
    votes = words.groupBy("doc").agg(
        *[
            F.sum(
                F.when(
                    F.col(f"h{b}").bitwiseAND(F.lit(_bit_value(j)).cast("long")) != 0, 1
                ).otherwise(-1)
            ).alias(f"v{b}_{j}")
            for b in widths
            for j in range(b)
        ]
    )
    sigs = []
    for b in widths:
        sig = F.lit(0).cast("long")
        for j in range(b):
            sig = sig + F.when(
                F.col(f"v{b}_{j}") > 0, F.lit(_bit_value(j)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        sigs.append(sig.alias(f"simhash{b}"))
    return votes.select("doc", *sigs)


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 64,
    max_hamming: int = 3,
    n_bands: int | None = None,
    materialize: str = "local_checkpoint",
    materialize_path: str | None = None,
    max_bucket_size: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs: Hamming distance <= `max_hamming` over
    `bits`-bit signatures, found without an all-pairs comparison.

    `sigs` short-circuits the signature computation with a precomputed
    (doc, simhash{bits}) frame — the tokenize-once rule applied to
    signatures (signatures are deterministic md5 votes, so reuse is
    value-identical; pinned in tests). Production persists the signature
    table once and every downstream consumer — pair generation,
    clustering, incremental dedup — reads it instead of re-hashing the
    corpus.

    Pigeonhole blocking (Manku et al., WWW'07 near-dup detection): split
    the signature into `n_bands` contiguous bit bands; two signatures
    within Hamming distance d differ in at most d bands, so with
    n_bands >= d + 1 they agree EXACTLY on at least one band. Equi-join on
    (band, band_bits) generates candidates (linear scan + small-key
    shuffle, same shape as MinHash LSH banding), then the exact
    `bit_count(xor)` filter keeps true near-dups — no recall loss, unlike
    MinHash LSH: the band guarantee is exhaustive for the distance bound.

    `max_bucket_size` drops degenerate bands (e.g. all-zero high bits on
    short docs) exactly as in :func:`minhash_lsh_candidates` — members of
    an over-full bucket are template-near-identical and belong to exact
    dedup's O(B) path, not a B² pair join.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b.
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} must exceed max_hamming={max_hamming} for the "
            "pigeonhole band guarantee to hold"
        )
    sig = sigs if sigs is not None else simhash_signatures(df, text_col, id_col, bits)
    sig_col = f"simhash{bits}"
    # band b covers bit positions [lo, lo+width): unsigned shift then mask,
    # so bit 63 (the sign bit) lands in the top band without overflow.
    widths = [bits // n_bands + (1 if b < bits % n_bands else 0) for b in range(n_bands)]
    band_structs, lo = [], 0
    for b, w in enumerate(widths):
        band_bits = F.shiftrightunsigned(F.col(sig_col), lo).bitwiseAND(
            F.lit((1 << w) - 1).cast("long")
        )
        band_structs.append(F.struct(F.lit(b).alias("band"), band_bits.alias("bb")))
        lo += w
    tagged = sig.select(
        "doc", F.col(sig_col).alias("sig"), F.explode(F.array(*band_structs)).alias("s")
    ).select("doc", "sig", F.col("s.band").alias("band"), F.col("s.bb").alias("bb"))
    tagged = _materialize(tagged, materialize, materialize_path)
    if max_bucket_size is not None:
        sizes = tagged.groupBy("band", "bb").agg(F.count("*").alias("_bsz"))
        tagged = tagged.join(
            F.broadcast(sizes.filter(F.col("_bsz") > max_bucket_size)),
            ["band", "bb"],
            "left_anti",
        )
    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bb") == F.col("b.bb"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = "label",
    threshold: float = 0.9,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by a bucket column so
    the pairwise comparison is per-bucket, not corpus-wide. With no natural
    bucket, plug an LSH bucket (similarity.hyperplane_bucket) in instead.

    The fixed-dim vector is unpacked into scalar columns before the pair
    join: the dot product becomes a chained multiply-add that whole-stage
    codegen compiles, where an array higher-order function is interpreted
    per element (measured 2.4× on the sf0.1 fixture; the summation order is
    identical, so results match the HOF form bit-for-bit). Norms are
    computed once per vector, not once per pair.
    """
    unpacked = [
        F.element_at(F.col(vec_col), i + 1).cast("double").alias(f"e{i}") for i in range(dim)
    ]
    v = emb.select(
        F.col(id_col).alias("vid"),
        *( [F.col(bucket_col).alias("bkt")] if bucket_col else [F.lit(0).alias("bkt")] ),
        *unpacked,
    )
    norm_sq = None
    for i in range(dim):
        t = F.col(f"e{i}") * F.col(f"e{i}")
        norm_sq = t if norm_sq is None else norm_sq + t
    v = v.withColumn("norm", F.sqrt(norm_sq))
    a, b = v.alias("a"), v.alias("b")
    dot = None
    for i in range(dim):
        t = F.col(f"a.e{i}") * F.col(f"b.e{i}")
        dot = t if dot is None else dot + t
    return (
        a.join(b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = 42,
    fit_fraction: float | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the embedding
    space, treat cosine >= `threshold` WITHIN a cell as semantic duplicates,
    and keep one representative per duplicate group.

    Deterministic variant of the paper's greedy per-cluster pruning: the
    within-cell pairs above threshold feed connected components and the
    minimum id per component survives — seed-stable and order-insensitive,
    where greedy pruning depends on iteration order.

    Scale: k-means is the IVF coarse-quantizer pattern (similarity.ivf_topk)
    — at 100 TB fit the model on `fit_fraction` of the data (assignment is
    still a full scan-side projection; centroids broadcast), and the
    pairwise cosine runs only within cells via the codegen'd unpacked-dot
    join of :func:`embedding_near_dup_pairs`. Cell sizes are data-adaptive;
    a degenerate mega-cell should be re-clustered or capped the same way as
    LSH buckets (`max_bucket_size` there).

    Returns (id, cell, dup_group, is_survivor).
    """
    from .clustering import connected_components
    from .similarity import assign_cells, fit_kmeans

    fit_on = (
        emb.sample(fraction=fit_fraction, seed=seed)
        if fit_fraction is not None
        else emb
    )
    centroids = fit_kmeans(fit_on, n_cells, vec_col, seed)
    if centroids is not None:
        # scan-side projection, no join: every emb column rides the
        # Arrow batch and `cell` is appended per row
        cells = assign_cells(
            emb, centroids, id_col, vec_col, passthrough=True
        )
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        with_vec = emb.withColumn(
            "_fv", array_to_vector(F.col(vec_col).cast("array<double>"))
        )
        wv_fit = (
            with_vec.sample(fraction=fit_fraction, seed=seed)
            if fit_fraction is not None
            else with_vec
        )
        km = KMeans(
            k=n_cells, seed=seed, featuresCol="_fv", predictionCol="cell"
        )
        cells = km.fit(wv_fit).transform(with_vec).drop("_fv")
    pairs = embedding_near_dup_pairs(
        cells, id_col, vec_col, bucket_col="cell", threshold=threshold, dim=dim
    )
    comp = connected_components(
        pairs,
        "vec_a",
        "vec_b",
        vertices=cells.select(id_col),
        vertex_col=id_col,
    )
    return (
        cells.select(id_col, "cell")
        .join(comp.withColumnRenamed("doc", id_col), id_col)
        .select(
            id_col,
            "cell",
            F.col("cluster").alias("dup_group"),
            (F.col(id_col) == F.col("cluster")).alias("is_survivor"),
        )
    )


def lsh_collision_prob(s: float, bands: int, rows: int) -> float:
    """P(two docs with MinHash similarity s share >= 1 LSH band) —
    the S-curve 1 - (1 - s^rows)^bands (Leskovec/Rajaraman/Ullman,
    Mining of Massive Datasets ch. 3)."""
    return 1.0 - (1.0 - s**rows) ** bands


def lsh_plan(
    threshold: float, num_perm: int
) -> tuple[int, int, float]:
    """Pick (bands, rows) for `minhash_lsh_candidates` from a target
    Jaccard threshold: among the factorizations bands*rows = num_perm,
    choose the one whose S-curve midpoint (1/bands)^(1/rows) — the
    similarity at ~50% collision probability — lands closest to the
    target. Returns (bands, rows, midpoint).

    This replaces the folklore guesswork with the MMDS closed form: more
    rows per band → higher midpoint (precision config, misses borderline
    pairs deterministically); more bands → lower midpoint (recall
    config, more candidate verification). The choice changes CANDIDATE
    cost only — verification filters exactly either way.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_perm < 1:
        raise ValueError(f"num_perm must be >= 1, got {num_perm}")
    best = None
    for rows in range(1, num_perm + 1):
        if num_perm % rows:
            continue
        bands = num_perm // rows
        mid = (1.0 / bands) ** (1.0 / rows) if bands > 1 else 1.0
        cand = (abs(mid - threshold), rows, bands, mid)
        if best is None or cand < best:
            best = cand
    _, rows, bands, mid = best
    return bands, rows, mid
