"""Byte-pair-encoding tokenizer: corpus-trained, distributed-applied.

The tokenizer step of a training-data pipeline (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016).
The key scale observation is that BPE training needs only the WORD
FREQUENCY TABLE, not the corpus: the table is Heaps'-law-small
(O(corpus^~0.5) types) and is the output of the same explode→hash-aggregate
shuffle every corpus statistic here uses (operators/corpus.term_table).
So:

* `word_freq_table` — distributed: tokenize once, one map-side-combined
  count shuffle, truncate to the top `max_terms` types by frequency
  (tie-broken by the word, suite determinism rule). Truncation only drops
  the long tail of hapaxes, which contribute at most one pair-count each;
  SentencePiece/HF trainers do the same pruning.
* `train_bpe` — driver-side greedy merge loop over the collected table
  (model-sized state, like every trainer in this repo: the driver holds
  vocabularies and weights, never corpora). Ties on pair count break
  lexicographically so training is bit-deterministic.
* `apply_bpe` — distributed: Arrow-batched pandas_udf with the merge
  ranks broadcast once per executor and an LRU cache per word type (token
  streams repeat types heavily; the cache turns per-token cost into
  per-type cost within a batch).

Word symbols are characters with an explicit `</w>` end-of-word sentinel
(the ACL'16 formulation), so merges never cross word boundaries and
detokenization is exact.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalized_text

END = "</w>"


def word_freq_table(
    df: DataFrame, text_col: str, max_terms: int = 100_000
) -> list[tuple[str, int]]:
    """Collect the (word, count) table, most-frequent first (ties by word).

    The ONLY driver-side materialization in the BPE path — bounded by
    `max_terms`, not the corpus. orderBy+limit executes as per-partition
    partial top-k + merge, so no single task sees the whole vocabulary.
    """
    words = df.select(
        F.explode(
            F.split(F.trim(normalized_text(F.col(text_col))), r"\s+")
        ).alias("w")
    ).filter(F.length("w") > 0)
    rows = (
        words.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_terms)
        .collect()
    )
    return [(r["w"], int(r["c"])) for r in rows]


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Greedy BPE merges over a word-frequency table (ACL'16 algorithm).

    Stops early when no adjacent pair reaches `min_pair_count` (merging
    singletons only memorizes hapaxes). Full recount per merge — O(merges
    × table); the table is vocabulary-sized, so this is driver-trivial
    next to the corpus scan that produced it (incremental pair-count
    maintenance is the known refinement if merges × table ever matters).
    """
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_freqs:
        syms = tuple(w) + (END,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # max by count, ties broken by the lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        vocab = {
            _merge_word(syms, best): freq for syms, freq in vocab.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word by repeatedly applying the lowest-rank merge
    present (the standard greedy BPE inference loop)."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        pairs = set(zip(syms, syms[1:]))
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        syms = _merge_word(syms, best)
    return list(syms)


def apply_bpe(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    tokens_col: str = "tokens",
) -> DataFrame:
    """(doc, tokens, n_tokens) — distributed encoding of every document.

    The merge table broadcasts once (executor-resident, model-sized); the
    pandas_udf runs over Arrow batches with an LRU cache keyed by word
    type, so the per-batch cost is per-TYPE, not per-token.
    """
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(merges)

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        ranks = {pair: i for i, pair in enumerate(bc.value)}

        @lru_cache(maxsize=1 << 16)
        def enc(word: str) -> tuple[str, ...]:
            return tuple(encode_word(word, ranks))

        def doc(text: str) -> list[str]:
            if text is None:
                return []
            toks: list[str] = []
            for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split():
                toks.extend(enc(w))
            return toks

        return texts.map(doc)

    return df.select(
        F.col(id_col).alias("doc"), encode(F.col(text_col)).alias(tokens_col)
    ).withColumn("n_tokens", F.size(tokens_col))
