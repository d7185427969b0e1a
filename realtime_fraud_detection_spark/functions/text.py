"""Text analysis — the reference's text feature family plus the
training-data-pipeline text operators (language ID, quality scoring, token
counting, fingerprinting).

The reference computes these Python-side per request (services/ml-models/src/
models/bert_text_analyzer.py:283-399 — length, char diversity, digit/special
counts, word counts, keyword-set flags). Here they are JVM column expressions
that run inside whole-stage codegen over arbitrarily wide corpora; the "BERT"
part of the reference is a per-request transformers call we deliberately keep
out of the hot path (SURVEY §2.8 M7) — the rule-based features carry the
signal, and a pandas_udf hook exists in ml/models.py for real model scoring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KEYWORD_FLAGS = {
    "has_crypto_keyword": "(?i)(bitcoin|crypto|btc|ethereum|coin)",
    "has_gift_card_keyword": "(?i)(gift ?card|prepaid|voucher)",
    "has_urgent_keyword": "(?i)(urgent|immediately|act now|limited time)",
    "has_scam_keyword": "(?i)(winner|prize|lottery|inheritance|prince)",
}

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. English-vs-rest is what the synthetic corpus exercises; the
# mechanism (per-language marker hit counts → argmax) is the real deliverable.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "es": r"\b(el|la|los|las|es|una|del|para|por|que)\b",
}


def _count_matches(col: Column, pattern: str) -> Column:
    """Occurrences of a regex — `regexp_count` (Spark ≥3.5), codegen'd."""
    return F.regexp_count(col, F.lit(pattern))


def text_features(text: Column) -> dict[str, Column]:
    """The reference's rule-based text family (bert_text_analyzer.py:283-399)."""
    length = F.length(text)
    words = F.split(F.trim(text), r"\s+")
    out = {
        "text_length": length,
        "word_count": F.when(F.length(F.trim(text)) == 0, 0).otherwise(F.size(words)),
        "digit_count": _count_matches(text, r"[0-9]"),
        "special_char_count": _count_matches(text, r"[^a-zA-Z0-9\s]"),
        "unique_char_count": F.size(F.array_distinct(F.split(text, ""))),
    }
    out["char_diversity"] = out["unique_char_count"] / F.nullif(
        length.cast("double"), F.lit(0.0)
    )
    for name, pattern in KEYWORD_FLAGS.items():
        out[name] = text.rlike(pattern)
    return out


# --------------------------------------------------------------------------
# Training-data-pipeline operators
# --------------------------------------------------------------------------
def token_count_whitespace(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, 0).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: word pieces + digits + punctuation as separate
    tokens (a GPT-2-style pre-tokenizer regex approximation)."""
    return _count_matches(text, r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def quality_score(text: Column) -> Column:
    """Document quality in [0,1] from length / punctuation / stopword ratios —
    the C4/Gopher-style heuristic stack as one expression."""
    length = F.length(text).cast("double")
    wc = token_count_whitespace(text).cast("double")
    stop_ratio = _count_matches(F.lower(text), LANG_MARKERS["en"]).cast("double") / F.nullif(wc, F.lit(0.0))
    special_ratio = _count_matches(text, r"[^a-zA-Z0-9\s]").cast("double") / F.nullif(length, F.lit(0.0))
    mean_word_len = length / F.nullif(wc, F.lit(0.0))
    len_score = F.least(length / 500.0, F.lit(1.0))
    stop_score = F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 4.0, F.lit(1.0))
    special_penalty = F.greatest(F.lit(0.0), 1.0 - F.coalesce(special_ratio, F.lit(0.0)) * 5.0)
    word_len_score = F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.5)
    return (0.3 * len_score + 0.3 * stop_score + 0.2 * special_penalty + 0.2 * word_len_score)


def language_id(text: Column) -> Column:
    """Marker-lexicon language ID: per-language hit rates → argmax, 'und' when
    nothing matches. Pure expressions — scales as a scan, no UDF."""
    lowered = F.lower(text)
    pairs = [
        F.struct(
            _count_matches(lowered, pat).cast("double").alias("hits"),
            F.lit(code).alias("lang"),
        )
        for code, pat in LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*pairs))
    return F.when(best["hits"] > 0, best["lang"]).otherwise("und")


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase, strip non-alphanumerics."""
    return F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " ")


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (content identity —
    survives whitespace/punctuation/case edits)."""
    return F.md5(F.trim(normalized_text(text)))
