"""Training-data-pipeline queries: text analysis, deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), and similarity
search (brute-force + LSH-bucketed ANN) over the documents/embeddings
fixtures.

Every hash is md5-derived so the DuckDB oracle reproduces signatures
bit-for-bit; similarity scores are rounded to 6 dp before any threshold or
ranking so comparisons are deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.hashing import md5_bigint64_sql, md5_bigint_sql
from ..operators import dedup as D
from ..operators import similarity as SIM
from ..sources.testdata import load_table

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, fanned out to the session's parallelism — the dedup ops
    are CPU-bound per-row expression stages (md5 per shingle), so on the
    one-file fixture this is the difference between 1 core and all of them
    (see sources/testdata.load_table)."""
    return load_table(spark, sf_dir, "documents", fan_out=True)


# Shared oracle-SQL building blocks -----------------------------------------
_SQL_WORDS = r"string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')"
# <3-word docs: whole normalized text as the single shingle (mirrors
# operators/dedup.word_shingles — content-dependent signatures for short docs)
_SQL_SHINGLES = (
    "CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')] "
    "ELSE list_transform(range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' ')) END"
)


def _sql_minhash(p: int) -> str:
    h = md5_bigint_sql("s", salt=f"perm{p}:")
    return f"list_min(list_transform(sh, s -> {h}))"


_SQL_SIG = f"""
sig AS (
  SELECT doc_id,
         {_sql_minhash(0)} AS mh0, {_sql_minhash(1)} AS mh1,
         {_sql_minhash(2)} AS mh2, {_sql_minhash(3)} AS mh3
  FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh
        FROM (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents))
)
"""


# ---------------------------------------------------------------------------
# Text analysis — one frame covering the rule-based feature family
# (bert_text_analyzer.py:283-399) AND quality scoring / language ID / token
# counting, merged into a single driver correctness row (50-query window).
# ---------------------------------------------------------------------------
def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    feats = TX.text_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["text_length"].alias("text_length"),
        feats["word_count"].alias("word_count"),
        feats["digit_count"].alias("digit_count"),
        feats["special_char_count"].alias("special_char_count"),
        feats["has_crypto_keyword"].alias("has_crypto_keyword"),
        feats["has_urgent_keyword"].alias("has_urgent_keyword"),
        "lang",
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
        TX.language_id(F.col("text")).alias("detected_lang"),
        TX.token_count_whitespace(F.col("text")).alias("tokens_ws"),
        TX.token_count_bpe_ish(F.col("text")).alias("tokens_bpe"),
    )


_EN = r"\b(the|and|of|to|in|is|that|for|with|was)\b"
_DE = r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b"
_FR = r"\b(le|la|les|et|est|une|des|dans|pour|que)\b"
_ES = r"\b(el|la|los|las|es|una|del|para|por|que)\b"

SQL_TEXT_FEATURES = rf"""
WITH base AS (
  SELECT doc_id, lang, text,
    length(text)::DOUBLE AS chlen,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS wc,
    len(regexp_extract_all(lower(text), '{_EN}'))::DOUBLE AS h_en,
    len(regexp_extract_all(lower(text), '{_DE}'))::DOUBLE AS h_de,
    len(regexp_extract_all(lower(text), '{_FR}'))::DOUBLE AS h_fr,
    len(regexp_extract_all(lower(text), '{_ES}'))::DOUBLE AS h_es,
    len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))::DOUBLE AS specials,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS tokens_bpe
  FROM documents)
SELECT doc_id,
  length(text) AS text_length,
  wc AS word_count,
  len(regexp_extract_all(text, '[0-9]')) AS digit_count,
  CAST(specials AS BIGINT) AS special_char_count,
  regexp_matches(text, '(?i)(bitcoin|crypto|btc|ethereum|coin)') AS has_crypto_keyword,
  regexp_matches(text, '(?i)(urgent|immediately|act now|limited time)') AS has_urgent_keyword,
  lang,
  ROUND(
      0.3 * LEAST(chlen / 500.0, 1.0)
    + 0.3 * LEAST(COALESCE(h_en / NULLIF(wc::DOUBLE, 0.0), 0.0) * 4.0, 1.0)
    + 0.2 * GREATEST(0.0, 1.0 - COALESCE(specials / NULLIF(chlen, 0.0), 0.0) * 5.0)
    + 0.2 * (CASE WHEN chlen / NULLIF(wc::DOUBLE, 0.0) >= 3
                   AND chlen / NULLIF(wc::DOUBLE, 0.0) <= 10 THEN 1.0 ELSE 0.5 END),
  6) AS quality,
  CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
       WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
       WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
       WHEN h_en >= h_de THEN 'en'
       ELSE 'de' END AS detected_lang,
  wc AS tokens_ws,
  tokens_bpe
FROM base
"""


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash) document fingerprints — k-gram hashes, window
# minima (operators/dedup.winnow_fingerprints; SIGMOD'03). Output is the
# per-doc fingerprint count + md5 digest of the sorted set, so the oracle
# verifies every fingerprint without an exploded row blow-up.
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# Document fingerprint + exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, TX.fingerprint(F.col("text")), "doc_id")


SQL_EXACT_DEDUP = """
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
       MIN(doc_id) AS survivor_id, COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Per-doc signature panel: MinHash (shingle → salted-md5 min per
# permutation) joined with the 16+64-bit SimHash signatures AND the
# winnowing fingerprint digest on doc_id — one driver row verifies all
# three signature families (former minhash_signature + simhash queries
# merged r9; doc_fingerprint absorbed r10 — every signature column is
# still hash-checked per doc; the freed slot promoted `triangles`).
# ---------------------------------------------------------------------------
def q_doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    mh = D.minhash_signatures(docs, "text", "doc_id", num_perm=4).withColumnRenamed(
        "doc", "doc_id"
    )
    sh = _simhash_sigs(spark, sf_dir).withColumnRenamed("doc", "doc_id")
    wd = D.winnow_digest(docs, "text", "doc_id", k=5, w=4)
    return mh.join(sh, "doc_id").join(wd, "doc_id")


# ---------------------------------------------------------------------------
# SimHash oracle building blocks — 16-bit (compact oracle form) AND full
# 64-bit production form from ONE scan + shuffle (simhash_signatures with a
# width tuple). The 64-bit form uses full two's-complement word hashes so
# bits 60-63 actually vote; bit 63 is handled without shift masks on both
# engines: h < 0 tests the sign bit, and setting it adds Long.MIN_VALUE
# (1 << 63 overflows BIGINT in DuckDB and LongType in Spark alike).
# ---------------------------------------------------------------------------
_SIMHASH_H = md5_bigint_sql("w", salt="simhash:")
_SIMHASH_H64 = md5_bigint64_sql("w", salt="simhash:")
# the 64-bit signature expression over a word-hash list column `hs`
# (shared by the signature query and the Hamming-pair query)
_SQL_SIMHASH64_SIG = """CAST(list_sum(list_transform(range(0, 63), j ->
    CASE WHEN list_sum(list_transform(hs, h ->
           CASE WHEN (h & (1::BIGINT << j)) <> 0 THEN 1 ELSE -1 END)) > 0
         THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT)
  + CASE WHEN list_sum(list_transform(hs, h ->
           CASE WHEN h < 0 THEN 1 ELSE -1 END)) > 0
         THEN (-9223372036854775807 - 1) ELSE 0 END"""
# DuckDB twin of the merged signature panel: the MinHash CTE joined with
# the 16+64-bit SimHash vote sums on doc_id.
_WINNOW_H = md5_bigint_sql("substr(t, CAST(i AS INTEGER), 5)", salt="winnow:")
_SQL_WINNOW_DIGEST = rf"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
  FROM documents
), hashed AS (
  SELECT doc_id,
    list_transform(range(1, greatest(length(t) - 5 + 1, 1) + 1), i -> {_WINNOW_H}) AS hs
  FROM norm
), winnowed AS (
  SELECT doc_id,
    list_sort(list_distinct(
      list_transform(range(1, greatest(len(hs) - 4 + 1, 1) + 1),
                     i -> list_min(hs[CAST(i AS INTEGER):CAST(i AS INTEGER)+3])))) AS fps
  FROM hashed
)
SELECT doc_id,
  len(fps) AS n_fingerprints,
  md5(array_to_string(list_transform(fps, x -> x::VARCHAR), ',')) AS fp_digest
FROM winnowed
"""


SQL_DOC_SIGNATURES = rf"""
WITH {_SQL_SIG},
hw AS (
  SELECT doc_id,
         list_transform(list_distinct({_SQL_WORDS}), w -> {_SIMHASH_H}) AS hs16,
         list_transform(list_distinct({_SQL_WORDS}), w -> {_SIMHASH_H64}) AS hs
  FROM documents
),
simsig AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(0, 16), j ->
      CASE WHEN list_sum(list_transform(hs16, h ->
             CASE WHEN (h & (1::BIGINT << j)) <> 0 THEN 1 ELSE -1 END)) > 0
           THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS simhash16,
    {_SQL_SIMHASH64_SIG} AS simhash64
  FROM hw
)
SELECT sig.doc_id, mh0, mh1, mh2, mh3, simhash16, simhash64,
       wd.n_fingerprints, wd.fp_digest
FROM sig JOIN simsig USING (doc_id)
JOIN ({_SQL_WINNOW_DIGEST}) wd USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Near-dup candidate pairs, both banding families in one driver row (former
# lsh_near_dups + simhash_pairs queries, merged to keep the oracle window
# dense — pairs, methods, and scores all still hash-checked):
#   * MinHash-LSH band buckets → candidate self-join → exact n-gram Jaccard
#     filter (score = jaccard, 6 dp);
#   * SimHash pigeonhole bit-banding, exhaustive for the Hamming bound
#     (score = hamming distance) — so the all-pairs DuckDB oracle must
#     match EXACTLY, pairs and distances both.
# ---------------------------------------------------------------------------
def q_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.setsim import _BIG_TOKEN_ROWS

    docs = _docs(spark, sf_dir)
    cands = D.minhash_lsh_candidates(docs, "text", "doc_id", num_perm=4, band_size=2)
    # ONE checkpointed distinct-shingle table for both Jaccard verify
    # sides (r14 — the jaccard_pairs discipline): the before-plan ran the
    # normalize→split→shingle chain TWICE and broadcast the corpus-sized
    # result twice. Above the setsim token gate the verify joins pin
    # shuffle_hash — a corpus-sized broadcast is the r12/r13
    # deserialized-relation OOM class; below it the planner's broadcast
    # of the materialized blocks is fine (and fastest locally).
    sh = D.shingle_table(docs, "text", "doc_id", 3, distinct=True).localCheckpoint(
        eager=False
    )
    n_tok = int(sh.agg(F.sum(F.size("sh"))).first()[0] or 0)
    verify_sh = sh.hint("shuffle_hash") if n_tok > _BIG_TOKEN_ROWS else sh
    lsh = (
        D.ngram_jaccard(docs, cands, "text", "doc_id", 3, shingles=verify_sh)
        .select(
            F.lit("lsh_jaccard").alias("method"),
            "doc_a",
            "doc_b",
            F.round("jaccard", 6).alias("score"),
        )
        .filter(F.col("score") >= 0.8)
    )
    sh = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", bits=64, max_hamming=4,
        sigs=_simhash_sigs(spark, sf_dir).select("doc", "simhash64"),
    ).select(
        F.lit("simhash_hamming").alias("method"),
        "doc_a",
        "doc_b",
        F.col("hamming").cast("double").alias("score"),
    )
    # winnowing fingerprint overlap — absorbed r11 (former winnow_pairs
    # slot, freed for the promoted jaccard_pairs); score = shared
    # fingerprint count, integer-exact
    wn = D.winnow_candidate_pairs(
        docs, "text", "doc_id", min_shared=20, max_doc_freq=100
    ).select(
        F.lit("winnow_shared").alias("method"),
        "doc_a",
        "doc_b",
        F.col("shared_fingerprints").cast("double").alias("score"),
    )
    return lsh.unionByName(sh).unionByName(wn)


SQL_NEAR_DUP_PAIRS = rf"""
WITH {_SQL_SIG},
bands AS (
  SELECT doc_id, 0 AS band, md5('0' || '_' || mh0 || '_' || mh1) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5('1' || '_' || mh2 || '_' || mh3) AS bucket FROM sig
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
shingled AS (
  SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS s
  FROM (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents)
),
hw AS (
  SELECT doc_id, list_transform(list_distinct({_SQL_WORDS}), w -> {_SIMHASH_H64}) AS hs
  FROM documents
), sigs AS (
  SELECT doc_id, {_SQL_SIMHASH64_SIG} AS sig FROM hw
),
wnorm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
  FROM documents
), whashed AS (
  SELECT doc_id,
    list_transform(range(1, greatest(length(t) - 5 + 1, 1) + 1), i -> {_WINNOW_H}) AS hs
  FROM wnorm
), wwinnowed AS (
  SELECT doc_id,
    list_sort(list_distinct(
      list_transform(range(1, greatest(len(hs) - 4 + 1, 1) + 1),
                     i -> list_min(hs[CAST(i AS INTEGER):CAST(i AS INTEGER)+3])))) AS fps
  FROM whashed
), wfp AS (
  SELECT doc_id AS doc, unnest(fps) AS fp FROM wwinnowed
), whot AS (
  SELECT fp FROM wfp GROUP BY fp HAVING COUNT(*) > 100
), wkept AS (
  SELECT doc, fp FROM wfp ANTI JOIN whot USING (fp)
)
SELECT 'lsh_jaccard' AS method, doc_a, doc_b,
       ROUND(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE, 6) AS score
FROM cand JOIN shingled a ON cand.doc_a = a.doc_id JOIN shingled b ON cand.doc_b = b.doc_id
WHERE ROUND(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE, 6) >= 0.8
UNION ALL
SELECT 'simhash_hamming' AS method, a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS DOUBLE) AS score
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 4
UNION ALL
SELECT 'winnow_shared' AS method, a.doc AS doc_a, b.doc AS doc_b,
       CAST(COUNT(*) AS DOUBLE) AS score
FROM wkept a JOIN wkept b ON a.fp = b.fp AND a.doc < b.doc
GROUP BY 1, 2, 3
HAVING COUNT(*) >= 20
"""


# ---------------------------------------------------------------------------
# Document quality filters, one per-doc frame covering three families:
#   * Gopher repetition stats (duplicate-line fractions + n-gram dominance,
#     operators/quality.repetition_stats) with the published thresholds;
#   * C4 line/page heuristics (terminal punctuation, min words per line,
#     javascript/lorem-ipsum/brace rules, operators/quality.c4_line_stats);
#   * PII counts + redaction (functions/pii) — verified bit-exactly via the
#     md5 of the redacted text.
# The fixture documents are single-line word bags, so the C4/PII signals
# run on a deterministic "rich" variant derived from the keys (same pattern
# as the derived IPs in geo_device_features) — both engines build the
# identical string, so every regex fires on real structure.
# ---------------------------------------------------------------------------
def _rich_text() -> object:
    d = F.col("doc_id")
    nl = F.lit("\n")
    return F.concat(
        F.col("text"),
        nl,
        F.lit("Contact user"),
        (d % 50).cast("string"),
        F.lit("@example.com for more details."),
        nl,
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("Call 555-123-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
                F.lit(" today!"),
            ),
        ).otherwise(F.lit("Here is another quality sentence.")),
        nl,
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("Server 10.0."),
                (d % 256).cast("string"),
                F.lit(".1 runs javascript widgets."),
            ),
        ).otherwise(F.lit("This closing sentence has six words.")),
        F.when(
            d % 17 == 0,
            F.concat(
                nl,
                F.lit("Card 4111-1111-1111-1111 with SSN 987-65-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
                F.lit("."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 0, F.concat(nl, F.lit("Totally lorem ipsum filler here."))
        ).otherwise(F.lit("")),
        F.when(
            d % 13 == 0, F.concat(nl, F.lit("var f = function() { return 1; };"))
        ).otherwise(F.lit("")),
    )


def q_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import pii as P
    from ..operators import quality as Q

    # seven per-doc aggregate subtrees (repetition lines/2-3-5-grams, C4
    # lines, PII, boilerplate) each re-scan their input — materialize the
    # fanned-out docs once so the single-file scan + repartition runs once
    docs = _docs(spark, sf_dir).localCheckpoint(eager=False)
    # tokenize the corpus ONCE (quality.word_table) — the 1/2/3/5/8-gram
    # subtrees all derive from this one checkpointed (doc, chars, ws)
    # frame instead of five independent normalize+split passes
    words = Q.word_table(docs, "text", "doc_id").localCheckpoint(eager=False)
    rep = Q.repetition_stats(
        docs, "text", "doc_id", top_ns=(2, 3), dup_ns=(5,), words=words
    )
    rep = rep.withColumn("gopher_pass", Q.gopher_repetition_pass(rep))

    rich = docs.select("doc_id", _rich_text().alias("rich")).localCheckpoint(
        eager=False
    )
    # split rich into lines ONCE, shared by the C4 and boilerplate subtrees
    rich_lines = Q.line_table(rich, "rich", "doc_id").localCheckpoint(eager=False)
    c4 = Q.c4_line_stats(rich, "rich", "doc_id", lines=rich_lines)
    c4 = c4.withColumn("c4_pass", Q.c4_page_pass(c4)).withColumnRenamed(
        "doc", "doc_id"
    )
    counts = P.pii_counts(F.col("rich"))
    pii = rich.select(
        "doc_id",
        *[counts[k].cast("bigint").alias(f"n_{k}") for k in P.PII_PATTERNS],
        F.md5(P.redact_pii(F.col("rich"))).alias("pii_redacted_md5"),
    )
    boiler = Q.boilerplate_line_stats(
        rich, "rich", "doc_id", lines=rich_lines
    ).withColumnRenamed("doc", "doc_id")
    # benchmark decontamination: a deterministic slice of the corpus plays
    # the eval set (every 50th doc) — its 8-gram set broadcasts and the
    # corpus probes it map-side (operators/quality.contamination_stats);
    # BOTH sides read the shared word table (the bench slice by doc id)
    cont = Q.contamination_stats(
        docs,
        docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text"),
        n=8,
        words=words,
        bench_words=words.filter(F.col("doc") % 50 == 0),
    ).withColumnRenamed("doc", "doc_id")
    # CCNet-style corpus-relative token-frequency signals (exact-integer
    # arithmetic — the transcendental log-prob form is tolerance-tested in
    # tests/test_quality.py, outside the bit-exact oracle surface)
    tfs = Q.token_frequency_stats(docs, "text", "doc_id", words=words).withColumnRenamed(
        "doc", "doc_id"
    )
    return (
        rep.join(c4, "doc_id")
        .join(pii, "doc_id")
        .join(boiler, "doc_id")
        .join(cont, "doc_id")
        .join(tfs, "doc_id")
    )


def _sql_shingles_k(k: int) -> str:
    return (
        f"CASE WHEN len(ws) < {k} THEN [array_to_string(ws, ' ')] "
        f"ELSE list_transform(range(1, len(ws) - {k} + 2), "
        f"i -> array_to_string(ws[i:i+{k - 1}], ' ')) END"
    )


def _sql_ngram_stats(n: int) -> str:
    return f"""g{n} AS (
  SELECT doc_id, unnest({_sql_shingles_k(n)}) AS s FROM ws_t
), pg{n} AS (
  SELECT doc_id, s, COUNT(*) AS cnt FROM g{n} GROUP BY 1, 2
), ns{n} AS (
  SELECT doc_id,
    MAX(cnt * length(s)) AS top{n}_mass,
    CAST(SUM(cnt * length(s)) AS BIGINT) AS all{n}_mass,
    CAST(SUM(CASE WHEN cnt > 1 THEN cnt * length(s) ELSE 0 END) AS BIGINT) AS dup{n}_mass
  FROM pg{n} GROUP BY 1
)"""


# the deterministic rich-text expression (must byte-match _rich_text());
# plain string — single braces are literal SQL here
_SQL_RICH = """text
  || chr(10) || 'Contact user' || CAST(doc_id % 50 AS VARCHAR) || '@example.com for more details.'
  || chr(10) || CASE WHEN doc_id % 3 = 0
       THEN 'Call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today!'
       ELSE 'Here is another quality sentence.' END
  || chr(10) || CASE WHEN doc_id % 5 = 0
       THEN 'Server 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 runs javascript widgets.'
       ELSE 'This closing sentence has six words.' END
  || CASE WHEN doc_id % 17 = 0
       THEN chr(10) || 'Card 4111-1111-1111-1111 with SSN 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
       ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Totally lorem ipsum filler here.' ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'var f = function() { return 1; };' ELSE '' END"""


def _sql_quality_pii_ctes() -> str:
    """The rich-text / C4-line / PII CTEs appended to the repetition CTEs."""
    from ..functions.pii import PII_PATTERNS, pii_count_sql, redact_pii_sql

    counts = ",\n    ".join(
        pii_count_sql("rich", k) + " AS n_" + k for k in PII_PATTERNS
    )
    return (
        "rich AS (\n  SELECT doc_id, " + _SQL_RICH + " AS rich FROM documents\n"
        "), rl AS (\n"
        "  SELECT doc_id, trim(l) AS line\n"
        "  FROM (SELECT doc_id, unnest(string_split(rich, chr(10))) AS l FROM rich)\n"
        "  WHERE length(trim(l)) > 0\n"
        "), rf AS (\n"
        "  SELECT doc_id,\n"
        "    regexp_matches(line, '[.!?\"]$') AS terminal,\n"
        r"    len(string_split_regex(line, '\s+')) AS words,"
        "\n    contains(lower(line), 'javascript') AS js\n"
        "  FROM rl\n"
        "), c4 AS (\n"
        "  SELECT doc_id,\n"
        "    COUNT(*) AS n_rich_lines,\n"
        "    CAST(SUM(CASE WHEN terminal AND words >= 5 AND NOT js THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines,\n"
        "    ROUND(AVG(CASE WHEN terminal THEN 1.0 ELSE 0.0 END), 6) AS terminal_line_frac,\n"
        "    ROUND(AVG(CASE WHEN words < 5 THEN 1.0 ELSE 0.0 END), 6) AS short_line_frac\n"
        "  FROM rf GROUP BY 1\n"
        "), pii AS (\n"
        "  SELECT doc_id,\n"
        "    contains(lower(rich), 'lorem ipsum') AS has_lorem_ipsum,\n"
        "    contains(rich, '{') AS has_curly_brace,\n"
        "    " + counts + ",\n"
        "    md5(" + redact_pii_sql("rich") + ") AS pii_redacted_md5\n"
        "  FROM rich\n"
        "), bl AS (\n"
        "  SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM rl GROUP BY 1\n"
        "), boiler AS (\n"
        "  SELECT doc_id,\n"
        "    CAST(SUM(CASE WHEN line_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_lines,\n"
        "    ROUND(SUM(CASE WHEN line_df >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)::DOUBLE, 6) AS boiler_line_frac\n"
        "  FROM rl JOIN bl USING (line) GROUP BY 1\n"
        ")"
    )


SQL_QUALITY_FILTERS = rf"""
WITH ws_t AS (
  SELECT doc_id, {_SQL_WORDS} AS ws,
         length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS chars
  FROM documents
), lines AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
  WHERE length(trim(l)) > 0
), pl AS (
  SELECT doc_id, line, COUNT(*) AS cnt FROM lines GROUP BY 1, 2
), ls AS (
  SELECT doc_id,
    CAST(SUM(cnt) AS BIGINT) AS n_lines,
    COUNT(*) AS n_distinct,
    CAST(SUM(cnt * length(line)) AS BIGINT) AS line_chars,
    CAST(SUM(CASE WHEN cnt > 1 THEN cnt * length(line) ELSE 0 END) AS BIGINT) AS dup_line_chars
  FROM pl GROUP BY 1
), {_sql_ngram_stats(2)}, {_sql_ngram_stats(3)}, {_sql_ngram_stats(5)},
g8c AS (
  SELECT doc_id, unnest({_sql_shingles_k(8)}) AS s FROM ws_t
), bg8 AS (
  SELECT DISTINCT s FROM g8c WHERE doc_id % 50 = 0
), cont AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
  FROM g8c WHERE s IN (SELECT s FROM bg8) GROUP BY 1
), tok AS (
  SELECT doc_id, unnest(ws) AS w FROM ws_t
), dtq AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
), tfq AS (
  SELECT w, CAST(SUM(c) AS BIGINT) AS tf FROM dtq GROUP BY 1
), tfs AS (
  SELECT doc_id,
    CAST(SUM(c) AS BIGINT) AS n_tokens,
    COUNT(*) AS n_distinct_tokens,
    SUM(c * tf) AS sum_ct,
    CAST(SUM(CASE WHEN tf = 1 THEN c ELSE 0 END) AS BIGINT) AS hapax_ct,
    CAST(SUM(CASE WHEN tf <= 2 THEN c ELSE 0 END) AS BIGINT) AS rare_ct
  FROM dtq JOIN tfq USING (w) GROUP BY 1
),
{_sql_quality_pii_ctes()}
SELECT w.doc_id,
  COALESCE(ls.n_lines, 0) AS n_lines,
  ROUND(CASE WHEN COALESCE(ls.n_lines, 0) > 0
        THEN (ls.n_lines - ls.n_distinct)::DOUBLE / ls.n_lines::DOUBLE ELSE 0.0 END, 6)
    AS dup_line_frac,
  ROUND(CASE WHEN COALESCE(ls.line_chars, 0) > 0
        THEN ls.dup_line_chars::DOUBLE / ls.line_chars::DOUBLE ELSE 0.0 END, 6)
    AS dup_line_char_frac,
  ROUND(CASE WHEN w.chars > 0
        THEN COALESCE(ns2.top2_mass, 0)::DOUBLE / w.chars::DOUBLE ELSE 0.0 END, 6)
    AS top2gram_char_frac,
  ROUND(CASE WHEN w.chars > 0
        THEN COALESCE(ns3.top3_mass, 0)::DOUBLE / w.chars::DOUBLE ELSE 0.0 END, 6)
    AS top3gram_char_frac,
  ROUND(CASE WHEN COALESCE(ns5.all5_mass, 0) > 0
        THEN ns5.dup5_mass::DOUBLE / ns5.all5_mass::DOUBLE ELSE 0.0 END, 6)
    AS dup5gram_char_frac,
  (ROUND(CASE WHEN COALESCE(ls.n_lines, 0) > 0
         THEN (ls.n_lines - ls.n_distinct)::DOUBLE / ls.n_lines::DOUBLE ELSE 0.0 END, 6) <= 0.30
   AND ROUND(CASE WHEN COALESCE(ls.line_chars, 0) > 0
         THEN ls.dup_line_chars::DOUBLE / ls.line_chars::DOUBLE ELSE 0.0 END, 6) <= 0.20
   AND ROUND(CASE WHEN w.chars > 0
         THEN COALESCE(ns2.top2_mass, 0)::DOUBLE / w.chars::DOUBLE ELSE 0.0 END, 6) <= 0.20
   AND ROUND(CASE WHEN w.chars > 0
         THEN COALESCE(ns3.top3_mass, 0)::DOUBLE / w.chars::DOUBLE ELSE 0.0 END, 6) <= 0.18
   AND ROUND(CASE WHEN COALESCE(ns5.all5_mass, 0) > 0
         THEN ns5.dup5_mass::DOUBLE / ns5.all5_mass::DOUBLE ELSE 0.0 END, 6) <= 0.15)
    AS gopher_pass,
  COALESCE(c4.n_rich_lines, 0) AS n_rich_lines,
  COALESCE(c4.n_kept_lines, 0) AS n_kept_lines,
  COALESCE(c4.terminal_line_frac, 0.0) AS terminal_line_frac,
  COALESCE(c4.short_line_frac, 0.0) AS short_line_frac,
  pii.has_lorem_ipsum,
  pii.has_curly_brace,
  (COALESCE(c4.n_kept_lines, 0) >= 3 AND NOT pii.has_lorem_ipsum
   AND NOT pii.has_curly_brace) AS c4_pass,
  pii.n_credit_card, pii.n_ssn, pii.n_phone, pii.n_ipv4, pii.n_email,
  pii.pii_redacted_md5,
  COALESCE(boiler.n_boiler_lines, 0) AS n_boiler_lines,
  COALESCE(boiler.boiler_line_frac, 0.0) AS boiler_line_frac,
  COALESCE(cont.n_contaminated_grams, 0) AS n_contaminated_grams,
  COALESCE(cont.n_contaminated_grams, 0) > 0 AS contaminated,
  tfs.n_tokens, tfs.n_distinct_tokens,
  floor(tfs.sum_ct::DOUBLE / tfs.n_tokens::DOUBLE * 1e6 + 0.5) / 1e6 AS mean_token_tf,
  floor(tfs.hapax_ct::DOUBLE / tfs.n_tokens::DOUBLE * 1e6 + 0.5) / 1e6 AS hapax_frac,
  floor(tfs.rare_ct::DOUBLE / tfs.n_tokens::DOUBLE * 1e6 + 0.5) / 1e6 AS rare_frac
FROM ws_t w
LEFT JOIN ls  ON w.doc_id = ls.doc_id
LEFT JOIN ns2 ON w.doc_id = ns2.doc_id
LEFT JOIN ns3 ON w.doc_id = ns3.doc_id
LEFT JOIN ns5 ON w.doc_id = ns5.doc_id
LEFT JOIN c4  ON w.doc_id = c4.doc_id
JOIN pii ON w.doc_id = pii.doc_id
LEFT JOIN boiler ON w.doc_id = boiler.doc_id
LEFT JOIN cont ON w.doc_id = cont.doc_id
JOIN tfs ON w.doc_id = tfs.doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic corpus sampling + token-budget sequence packing, composed as
# one pipeline step: mixture-weighted Bernoulli sampling on a salted md5
# bucket of the id — per-LANGUAGE fractions (the corpus-rebalancing step:
# downsample the dominant language, keep more of the rest), identical row
# selection in every engine and on every cluster layout (df.sample is
# partitioning-dependent) — then concat-and-chunk the SAMPLED corpus into
# fixed token-budget training sequences via one window cumsum per stratum.
# ---------------------------------------------------------------------------
_MIXTURE = {"en": 0.15, "de": 0.4, "fr": 0.4, "es": 0.35}  # default 0.25 (zh)


def q_sample_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents")
    toks = SA.stratified_sample(
        docs, "doc_id", "lang", _MIXTURE, default=0.25
    ).select(
        "doc_id", "lang", TX.token_count_whitespace(F.col("text")).alias("tokens")
    )
    return SA.pack_sequences(toks, "doc_id", "tokens", budget=2000, stratum_col="lang")


def _sql_sample_pack() -> str:
    from ..operators.sampling import stratified_sample_sql

    return rf"""
WITH toks AS (
  SELECT doc_id, lang,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS tokens
  FROM documents
  WHERE {stratified_sample_sql('doc_id', 'lang', _MIXTURE, default=0.25)}
), off AS (
  SELECT doc_id, lang, tokens,
    CAST(COALESCE(SUM(tokens) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
  FROM toks
)
SELECT doc_id, lang, tokens, "offset",
       CAST(FLOOR("offset"::DOUBLE / 2000) AS BIGINT) AS seq_id
FROM off
"""


SQL_SAMPLE_PACK = _sql_sample_pack()


# ---------------------------------------------------------------------------
# Near-dup clustering: simhash Hamming pairs → connected components →
# (doc, min-id cluster label). Spark side iterates min-label propagation to
# fixpoint; the oracle computes full reachability with a recursive CTE and
# takes MIN over each reachable set — both are the exact components, so the
# match is exact.
# ---------------------------------------------------------------------------
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import clustering as C

    docs = _docs(spark, sf_dir)
    pairs = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", bits=64, max_hamming=4,
        sigs=_simhash_sigs(spark, sf_dir).select("doc", "simhash64"),
    )
    comp = C.connected_components(
        pairs, vertices=docs.select("doc_id"), vertex_col="doc_id"
    )
    return comp.select(
        F.col("doc").alias("doc_id"), F.col("cluster").alias("cluster_id")
    )


SQL_DEDUP_CLUSTERS = rf"""
WITH RECURSIVE hw AS (
  SELECT doc_id, list_transform(list_distinct({_SQL_WORDS}), w -> {_SIMHASH_H64}) AS hs
  FROM documents
), sigs AS (
  SELECT doc_id, {_SQL_SIMHASH64_SIG} AS sig FROM hw
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= 4
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
), reach(src, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
)
SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
"""


# ---------------------------------------------------------------------------
# EXACT n-gram-Jaccard self-join (operators/setsim.py AllPairs/PPJoin):
# every (doc_a, doc_b) pair with distinct-shingle Jaccard >= 0.6 — prefix-
# filtered candidates (rarest-token prefix index, never all-pairs), then
# candidates-only exact verification. Promoted into the oracle window
# r11 (the winnow_pairs absorption freed the slot): the jaccard value is
# a pure int/int double division — bit-exact in any IEEE engine, no
# rounding needed. The DuckDB twin counts shared distinct shingles via
# the unnest equi-join (|A∪B| = |A|+|B|−|A∩B|), so it too never goes
# all-pairs. Brute-force set equality for the operator itself is pinned
# in tests/test_setsim.py.
# ---------------------------------------------------------------------------
_JACCARD_T = 0.6


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.setsim import jaccard_similarity_join

    docs = _docs(spark, sf_dir)
    return jaccard_similarity_join(
        docs, "text", "doc_id", threshold=_JACCARD_T, shingle_k=3
    )


# ---------------------------------------------------------------------------
# Incremental exact-Jaccard INGEST (setsim.prefix_filtered_candidates_
# incremental): a new batch (doc_id % 10 == 0) probed against the standing
# corpus — batch prefix postings BROADCAST into the corpus index (the
# corpus never reshuffles; the persisted-index production form), then
# candidates-only exact verification. ORACLED since round 12 (the
# rule_score merge freed the slot): the cross-form equivalence with the
# self-join, broadcast plan pin, and unseen-vocabulary safety are pinned
# in tests/test_setsim.py; every output value is the same bit-exact
# int/int arithmetic as jaccard_pairs.
# ---------------------------------------------------------------------------
def q_jaccard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.setsim import prefix_filtered_candidates_incremental

    docs = _docs(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    cand = prefix_filtered_candidates_incremental(
        batch, corpus, "text", "doc_id", threshold=0.5, shingle_k=3
    ).select(
        F.col("new_doc").alias("doc_a"), F.col("corpus_doc").alias("doc_b")
    )
    # one checkpointed shingle table for both verify sides (the same
    # staging jaccard_similarity_join applies — without it the verify
    # join runs the normalize→shingle chain once per side)
    sh = D.shingle_table(
        docs, "text", "doc_id", 3, distinct=True
    ).localCheckpoint(eager=False)
    return (
        D.ngram_jaccard(docs, cand, "text", "doc_id", 3, shingles=sh)
        .filter(F.col("jaccard") >= 0.5 - 1e-9)
        .orderBy("doc_a", "doc_b")
    )


SQL_JACCARD_PAIRS = rf"""
WITH shing AS (
  SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS s
  FROM (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents)
), ex AS (
  SELECT doc_id AS doc, unnest(s) AS sh, len(s) AS sz FROM shing
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS i,
         MAX(a.sz) AS sa, MAX(b.sz) AS sb
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) AS jaccard
FROM inter
WHERE CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) >= {_JACCARD_T - 1e-9!r}
"""


# DuckDB twin of q_jaccard_ingest — PROMOTED into the hash-checked window
# round 12 (the rule_score/ensemble_decision merge freed the slot); it had
# been pinned bit-exact in tests/test_setsim.py since r11 (the
# merchant_updates promotion pattern): the incremental probe's
# completeness guarantee means its output IS "all (batch, corpus) pairs
# with jaccard >= t", which the oracle states directly as the split
# restriction of the all-pairs join. Same int/int double arithmetic as
# SQL_JACCARD_PAIRS.
SQL_JACCARD_INGEST = rf"""
WITH shing AS (
  SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS s
  FROM (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents)
), ex AS (
  SELECT doc_id AS doc, unnest(s) AS sh, len(s) AS sz FROM shing
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS i,
         MAX(a.sz) AS sa, MAX(b.sz) AS sb
  FROM ex a JOIN ex b ON a.sh = b.sh
  WHERE a.doc % 10 = 0 AND b.doc % 10 != 0
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) AS jaccard
FROM inter
WHERE CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) >= {0.5 - 1e-9!r}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs, blocked by label
# ---------------------------------------------------------------------------
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the one-file embeddings fixture scans as ONE partition; the
    # pair-join probe side must be wide or the whole per-bucket dot-product
    # sweep runs on a single core (r13: warm 1.3 s -> 0.8 s, bit-identical)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    return D.embedding_near_dup_pairs(emb, threshold=0.45)


SQL_EMBEDDING_NEAR_DUPS = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  ROUND(
    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
    / (SQRT(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))
       * SQRT(list_sum(list_transform(range(1, 65), i -> b.e[i] * b.e[i])))),
  6) AS cosine
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(
    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
    / (SQRT(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))
       * SQRT(list_sum(list_transform(range(1, 65), i -> b.e[i] * b.e[i])))),
  6) >= 0.45
"""


# ---------------------------------------------------------------------------
# ANN: brute-force cosine top-k (exact baseline) for query vectors vec_id<5
# ---------------------------------------------------------------------------
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.brute_force_topk(emb, queries, k=3)


SQL_ANN_TOPK = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
scored AS (
  SELECT qid, v.vec_id AS nid,
    ROUND(
      list_sum(list_transform(range(1, 65), i -> qe[i] * v.e[i]))
      / (SQRT(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])))
         * SQRT(list_sum(list_transform(range(1, 65), i -> v.e[i] * v.e[i])))),
    6) AS cosine_sim
  FROM q CROSS JOIN v WHERE qid <> v.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, nid ASC) AS rank
  FROM scored
)
SELECT qid, nid, cosine_sim, rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# ANN: LSH-bucketed variant (approximate — rows-only check; the plan shape
# is the deliverable: equi join on the hyperplane signature instead of a
# cross join).
# ---------------------------------------------------------------------------
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.lsh_topk(emb, queries, k=3, n_planes=4, dim=64)


# ---------------------------------------------------------------------------
# Shared ANN build artifacts. Every IVF-family query in this suite uses
# the SAME coarse quantizer (n_cells=8, seed 42 on the same corpus), and
# the PQ build/serve pair trains the SAME raw-vector codebooks — so the
# suite fits each model once per (session, fixture-content) and injects
# it (the featurize-once precedent of `_docs`; production does the same
# through the persisted ann_io artifacts). Keyed on the session's
# applicationId (checkpointed frames die with their session) plus the
# fixture CONTENT fingerprint (regenerated fixtures miss the cache).
# ---------------------------------------------------------------------------
_ANN_CACHE: dict = {}


def _ann_key(spark: SparkSession, sf_dir: str, *params) -> tuple:
    import os

    fp = _fixture_fingerprint(
        os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    )
    return (spark.sparkContext.applicationId, fp, *params)


def _doc_key(spark: SparkSession, sf_dir: str, *params) -> tuple:
    import os

    fp = _fixture_fingerprint(
        os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    )
    return (spark.sparkContext.applicationId, fp, *params)


def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared 16+64-bit signature table (doc, simhash16, simhash64):
    three suite queries (signatures, Hamming pairs, near-dup clustering)
    consume the same deterministic md5 votes, so the suite computes them
    once per (session, fixture-content) and checkpoints — the signature
    table production would persist. Value-identical to a fresh
    computation (pinned in tests/test_simhash.py)."""
    key = _doc_key(spark, sf_dir, "simhash_sigs")
    if key not in _ANN_CACHE:
        docs = _docs(spark, sf_dir)
        _ANN_CACHE[key] = D.simhash_signatures(
            docs, "text", "doc_id", bits=(16, 64)
        ).localCheckpoint(eager=False)
    return _ANN_CACHE[key]


def _coarse(spark: SparkSession, sf_dir: str, n_cells: int):
    key = _ann_key(spark, sf_dir, "coarse", n_cells)
    if key not in _ANN_CACHE:
        emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
        _ANN_CACHE[key] = SIM.fit_coarse_quantizer(emb, n_cells)
    return _ANN_CACHE[key]


def _pq_books(spark: SparkSession, sf_dir: str, m: int, ks: int):
    key = _ann_key(spark, sf_dir, "books", m, ks)
    if key not in _ANN_CACHE:
        emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
        _ANN_CACHE[key] = SIM.pq_train(emb, m=m, ks=ks)
    return _ANN_CACHE[key]


# ---------------------------------------------------------------------------
# ANN: IVF variant (KMeans coarse quantizer — rows-only: approximate and
# dependent on MLlib's kmeans iteration order).
# ---------------------------------------------------------------------------
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.ivf_topk(
        emb, queries, k=3, n_cells=8, n_probe=3,
        coarse=_coarse(spark, sf_dir, 8),
    )


# int8 scalar-quantized ANN (FAISS SQ8-style asymmetric distance): the
# 4x-memory-footprint scale path. Rows-only (quantization is approximate
# by construction); reconstruction bound + recall vs the exact baseline
# pinned in tests/test_int8_ann.py.
def q_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.int8_topk(emb, queries, k=3)


# IVF,PQ (Jegou et al. PAMI'11 + coarse cells + exact re-rank): the byte
# floor of the ANN family — M=8 code bytes per 256-byte float vector for
# the scan, floats touched only for rerank*k candidates per query.
# Rows-only (three stacked approximations); recall >= the SQ8 path pinned
# in tests/test_pq_ann.py.
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.ivf_pq_topk(
        emb, queries, k=3, n_cells=8, n_probe=3, m=8, ks=16, rerank=6,
        coarse=_coarse(spark, sf_dir, 8),
        codebooks=_pq_books(spark, sf_dir, 8, 16),
    )


# ---------------------------------------------------------------------------
# PQ SERVE path: the number production actually pays per query batch at
# 100 TB. q_ann_pq above measures BUILD+serve (train codebooks, encode the
# corpus, then search); this entry persists the index once per fixture
# (codebooks as a JSON artifact, the encoded corpus as parquet —
# examples/ann_index_lifecycle.py's layout) and then serves top-k purely
# from the artifacts: the scan reads M=8 code bytes per vector, floats are
# touched only for the rerank*k candidates. Rows-only (approximate by
# construction, same as ann_pq); bench medians 3 runs so the one-time
# build in a cold run doesn't pollute the serve timing.
#
# Staleness is keyed on a CONTENT fingerprint of the source parquet
# (file names + sizes + mtimes), not a row count: fixtures are
# regenerated between rounds at identical row counts, and a count-keyed
# cache would serve the old round's codes against the new floats. The
# fingerprint is part of the index path, so a regenerated fixture simply
# misses the cache; builds land in a per-pid temp dir renamed into place
# (atomic on POSIX), so a concurrent run either wins the rename or uses
# the winner's complete index — never a torn build.
# ---------------------------------------------------------------------------
def _fixture_fingerprint(path: str) -> str:
    """md5 over the sorted (relative name, size, mtime_ns) of every file
    under `path` (or the file itself) — changes whenever the fixture is
    regenerated, even at identical row counts."""
    import hashlib as _h
    import os as _os

    entries = []
    if _os.path.isdir(path):
        for root, _dirs, files in _os.walk(path):
            for f in files:
                p = _os.path.join(root, f)
                st = _os.stat(p)
                entries.append(
                    (_os.path.relpath(p, path), st.st_size, st.st_mtime_ns)
                )
    else:
        st = _os.stat(path)
        entries.append((_os.path.basename(path), st.st_size, st.st_mtime_ns))
    h = _h.md5()
    for e in sorted(entries):
        h.update(repr(e).encode())
    return h.hexdigest()[:16]


# Bump when the trainer/encoder changes (e.g. the r7 local-Lloyd's
# quantizer): the content fingerprint only covers FIXTURE staleness; a
# persisted index built by an older trainer is self-consistent but not
# what the current code would build.
_PQ_INDEX_VERSION = 2


def _pq_index_dir(sf_dir: str) -> str:
    import os as _os

    base = _os.path.basename(_os.path.normpath(sf_dir))
    fp = _fixture_fingerprint(
        _os.path.join(_os.path.abspath(sf_dir), "embeddings.parquet")
    )
    return f"/tmp/spark_graft_pq_index_v{_PQ_INDEX_VERSION}_{base}_{fp}"


def q_ann_pq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import shutil

    from ..functions import ann_io

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    idx = _pq_index_dir(sf_dir)
    if not os.path.exists(os.path.join(idx, "meta.json")):
        # one-time build into a private temp dir, renamed into place
        tmp = f"{idx}.build.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        books = _pq_books(spark, sf_dir, 8, 16)
        ann_io.save_pq_codebooks(books, os.path.join(tmp, "pq.json"))
        SIM.pq_encode(emb, books).write.mode("overwrite").parquet(
            os.path.join(tmp, "codes")
        )
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"n": emb.count()}, fh)  # meta last: build complete
        try:
            os.rename(tmp, idx)
        except OSError:  # a concurrent build won the rename — use it
            shutil.rmtree(tmp, ignore_errors=True)
    books, _ = ann_io.load_pq_codebooks(os.path.join(idx, "pq.json"))
    codes = spark.read.parquet(os.path.join(idx, "codes"))
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.pq_topk(
        emb, queries, k=3, rerank=6, codebooks=books, codes=codes
    )


# IVF,SQ8 composed index (coarse cell pruning over the int8-quantized
# corpus, asymmetric fine scoring) — exists with recall tests since round
# 4 but previously had no suite entry exercising it on the fixtures.
# Rows-only (two stacked approximations).
def q_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.ivf_int8_topk(
        emb, queries, k=3, n_cells=8, n_probe=3,
        coarse=_coarse(spark, sf_dir, 8),
    )


# Residual IVF,PQ (FAISS's default IVF,PQ encoding: codebooks quantize
# x − c(cell)) — reconstruction-error bound pinned in tests/test_pq_ann.py;
# this entry runs the composed index on the fixtures. Rows-only.
def q_ann_pq_res(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.ivf_pq_topk(
        emb, queries, k=3, n_cells=8, n_probe=3, m=8, ks=16, rerank=6,
        by_residual=True,
        coarse=_coarse(spark, sf_dir, 8),
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, arXiv:2303.09540): KMeans cells → within-cell
# cosine groups → min-id survivors (rows-only: cell assignment depends on
# MLlib's kmeans; the deterministic group/survivor semantics are pinned by
# tests/test_semantic_dedup.py).
# ---------------------------------------------------------------------------
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan_out here (r13 A/B): the scan feeds a driver-local kmeans fit
    # and a checkpointed cell assignment, so the 1-partition read is not
    # in the iterated CC path — fanning out just adds an exchange under
    # every loop consumer (final plan 0.38 s -> 1.40 s warm, bench +4 s)
    emb = load_table(spark, sf_dir, "embeddings")
    return D.semantic_dedup(emb, threshold=0.45, n_cells=8, dim=64)


# ---------------------------------------------------------------------------
# Context-window chunking (rows-only here; exact DuckDB parity is pinned by
# tests/test_chunking.py::test_chunking_matches_duckdb).
# ---------------------------------------------------------------------------
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import chunk_documents

    docs = _docs(spark, sf_dir)
    return chunk_documents(docs, "text", "doc_id", chunk_tokens=128, stride=96)


# ---------------------------------------------------------------------------
# Exact duplicate-span detection (Lee et al. ACL'22 substring dedup).
# Oracled (promoted into the driver window in round 9 after the signature /
# pair-query merges freed two slots): the DuckDB twin below is the same
# independent formulation tests/test_duplicate_spans.py has pinned
# bit-exact since round 5 — duplicated k-gram hashes, gap-≥k islands,
# per-island span boundaries.
# ---------------------------------------------------------------------------
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spans import duplicate_spans

    docs = _docs(spark, sf_dir)
    return duplicate_spans(docs, "text", "doc_id", k=8).orderBy("doc", "span_start")


_SPAN_K = 8
_SPAN_H = md5_bigint_sql("s")
_SPAN_LEADS = ", ".join(f"lead(tok, {i}) OVER win AS l{i}" for i in range(1, _SPAN_K))
_SPAN_CAT = (
    "concat_ws(' ', tok, " + ", ".join(f"l{i}" for i in range(1, _SPAN_K)) + ")"
)
SQL_DUPLICATE_SPANS = rf"""
WITH ws AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS w
  FROM documents
),
toks AS (SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS pos FROM ws),
gr AS (
  SELECT doc_id, pos, {_SPAN_CAT} AS s
  FROM (SELECT doc_id, pos, tok, {_SPAN_LEADS}
        FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
  WHERE l{_SPAN_K - 1} IS NOT NULL
),
g AS (SELECT doc_id, pos, {_SPAN_H} AS h FROM gr),
dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
m AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER win2 >= {_SPAN_K} THEN 1 ELSE 0 END AS b
  FROM m WINDOW win2 AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS sp
  FROM brk
)
SELECT doc_id AS doc, min(pos) AS span_start, max(pos) + {_SPAN_K - 1} AS span_end,
       max(pos) + {_SPAN_K - 1} - min(pos) + 1 AS span_tokens,
       count(*) AS n_dup_grams
FROM isl GROUP BY doc_id, sp
ORDER BY doc, span_start
"""


# ---------------------------------------------------------------------------
# Okapi BM25 full-text search (operators/corpus.bm25_rank). Rows-only here
# (the oracle window is full; idf is transcendental anyway) — DuckDB
# tolerance parity is pinned by tests/test_corpus.py. The query set derives
# deterministically from the corpus: first 4 tokens of every 97th document.
# ---------------------------------------------------------------------------
def _bm25_dt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BM25 doc-term table: two suite queries (bm25_search,
    hybrid_search) rank against the same corpus, so the suite tokenizes it
    once per (session, fixture-content) and checkpoints — the search-index
    build production would persist (same discipline as _simhash_sigs)."""
    from ..operators.corpus import doc_term_table

    key = _doc_key(spark, sf_dir, "bm25_dt")
    if key not in _ANN_CACHE:
        docs = _docs(spark, sf_dir)
        _ANN_CACHE[key] = doc_term_table(
            docs, "text", "doc_id"
        ).localCheckpoint(eager=False)
    return _ANN_CACHE[key]


def _bm25_queries(docs: DataFrame) -> DataFrame:
    return docs.filter("doc_id % 97 = 0").selectExpr(
        "doc_id AS q_id",
        "concat_ws(' ', slice(split(trim(regexp_replace(lower(text), "
        "'[^a-z0-9]+', ' ')), ' '), 1, 4)) AS query",
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import bm25_rank

    docs = _docs(spark, sf_dir)
    return bm25_rank(
        docs, _bm25_queries(docs), top_k=5, dt=_bm25_dt(spark, sf_dir)
    ).orderBy("q_id", "rank")


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 lexical + brute-force cosine vector ranking fused
# with reciprocal-rank fusion (operators/corpus.rrf_fuse). Queries are the
# bm25_search query set (every 97th document), each carrying BOTH its first-4-
# token text query and its own embedding (doc_id == vec_id in the fixtures).
# Rows-only (the oracle window is full; BM25 ranks are transcendental-score-
# derived anyway) — exact-replay parity is pinned by
# tests/test_hybrid_search.py.
# ---------------------------------------------------------------------------
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import bm25_rank, rrf_fuse

    docs = _docs(spark, sf_dir)
    # fan_out: the vector leg's brute-force cosine sweep otherwise runs on
    # the one-file scan's single partition (r13: hybrid warm 4.5 -> 2.6 s)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    lex = bm25_rank(
        docs, _bm25_queries(docs), top_k=20, dt=_bm25_dt(spark, sf_dir)
    ).select("q_id", "doc", "rank")
    vec = SIM.brute_force_topk(
        emb, emb.filter("vec_id % 97 = 0"), k=20
    ).select(
        F.col("qid").alias("q_id"), F.col("nid").alias("doc"), "rank"
    )
    fused = rrf_fuse({"lex": lex, "vec": vec}, k=60, top_k=10)
    return fused.orderBy("q_id", "rank")


# ---------------------------------------------------------------------------
# Token-budget mixture materialization (operators/sampling.token_budget_sample)
# — per-language char budgets realized as the minimal hash-ordered prefix.
# Oracled (promoted into the driver window in round 9): the DuckDB twin is
# the single per-group-window sequential rendering the distributed
# bucket-offset prefix-sum form must equal exactly — the same formulation
# tests/test_token_budget.py has pinned bit-exact.
# ---------------------------------------------------------------------------
_MIX_BUDGETS = {"en": 20000, "fr": 10000, "de": 8000, "es": 10000, "zh": 6000}


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import token_budget_sample

    docs = _docs(spark, sf_dir)
    picked = token_budget_sample(
        docs, _MIX_BUDGETS, group_col="lang", token_col="n_chars",
        id_col="doc_id",
    )
    return picked.select("doc_id", "lang", "n_chars").orderBy("doc_id")


_MIX_H = md5_bigint_sql("CAST(doc_id AS VARCHAR)", salt="mix:")
_MIX_CASE = "".join(
    f"WHEN lang = '{k}' THEN {v} " for k, v in sorted(_MIX_BUDGETS.items())
)
SQL_TOKEN_BUDGET_MIX = rf"""
WITH base AS (
  SELECT doc_id, lang, n_chars, {_MIX_H} AS h
  FROM documents
),
cum AS (
  SELECT *, COALESCE(SUM(n_chars) OVER (
    PARTITION BY lang ORDER BY h, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM base
)
SELECT doc_id, lang, n_chars FROM cum
WHERE prev < CASE {_MIX_CASE}ELSE 0 END
ORDER BY doc_id
"""


# Every oracle-backed query must sit within the driver's 50-entry check
# window (dict insertion order across suite modules) — the two
# approximate-by-construction ANN queries are rows-only and go LAST.
QUERIES = {
    "text_features": q_text_features,
    "exact_dedup": q_exact_dedup,
    "doc_signatures": q_doc_signatures,
    "near_dup_pairs": q_near_dup_pairs,
    "embedding_near_dups": q_embedding_near_dups,
    "ann_topk": q_ann_topk,
    "jaccard_pairs": q_jaccard_pairs,
    "jaccard_ingest": q_jaccard_ingest,
    "dedup_clusters": q_dedup_clusters,
    "quality_filters": q_quality_filters,
    "sample_pack": q_sample_pack,
    "duplicate_spans": q_duplicate_spans,
    "token_budget_mix": q_token_budget_mix,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_int8": q_ann_int8,
    "ann_pq": q_ann_pq,
    "ann_pq_serve": q_ann_pq_serve,
    "ann_ivf_int8": q_ann_ivf_int8,
    "ann_pq_res": q_ann_pq_res,
    "semantic_dedup": q_semantic_dedup,
    "doc_chunks": q_doc_chunks,
    "bm25_search": q_bm25_search,
    "hybrid_search": q_hybrid_search,
}

ORACLES = {
    "text_features": SQL_TEXT_FEATURES,
    "exact_dedup": SQL_EXACT_DEDUP,
    "doc_signatures": SQL_DOC_SIGNATURES,
    "near_dup_pairs": SQL_NEAR_DUP_PAIRS,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "ann_topk": SQL_ANN_TOPK,
    "jaccard_pairs": SQL_JACCARD_PAIRS,
    "jaccard_ingest": SQL_JACCARD_INGEST,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "quality_filters": SQL_QUALITY_FILTERS,
    "sample_pack": SQL_SAMPLE_PACK,
    "duplicate_spans": SQL_DUPLICATE_SPANS,
    "token_budget_mix": SQL_TOKEN_BUDGET_MIX,
    # ann_lsh / ann_ivf: approximate by construction → rows-only check
}
