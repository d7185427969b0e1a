"""Unigram-LM subword tokenizer (Kudo, "Subword Regularization", ACL
2018) — SentencePiece's other algorithm, completing the tokenizer family
next to BPE (functions/bpe.py). Same scale split as BPE:

* the corpus contributes only its word-frequency table (the one
  distributed aggregate — functions/bpe.word_freq_table);
* training is a driver-side EM + prune loop over that vocabulary-sized
  table (candidate pieces, Viterbi E-step, count-normalize M-step, prune
  lowest-probability pieces keeping single characters until the target
  vocab);
* encoding runs distributed as an Arrow-batched pandas_udf with the
  piece log-probabilities broadcast and a per-type LRU cache.

Determinism: every iteration walks pieces and words in sorted order,
Viterbi ties break toward the segmentation that is lexicographically
smallest as a tuple, and pruning ties break by the piece — training is
bit-reproducible.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log-probability floor for characters never seen in training (OOV at
# encode time): worse than any trained piece, so they only appear when
# unavoidable
OOV_LOGP = -100.0


def init_pieces(
    word_freqs: list[tuple[str, int]],
    max_piece_len: int = 8,
    max_pieces: int = 4000,
) -> dict[str, float]:
    """Seed vocabulary: all substrings up to `max_piece_len`, weighted by
    word frequency, truncated to the `max_pieces` highest-count pieces
    (ties by piece) — single characters always kept so every word stays
    segmentable."""
    counts: dict[str, int] = {}
    for w, c in word_freqs:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[: max(0, max_pieces - len(chars))]
    kept = chars | set(multi)
    total = sum(counts[p] for p in kept)
    return {p: math.log(counts[p] / total) for p in sorted(kept)}


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> tuple[list[str], float]:
    """Best segmentation under the unigram LM: DP over end positions;
    unseen single characters score OOV_LOGP so any word segments. Ties
    break toward the lexicographically smallest piece tuple."""
    n = len(word)
    # best[i] = (score, pieces tuple) for word[:i]
    best: list[tuple[float, tuple[str, ...]]] = [(0.0, ())] + [
        (-math.inf, ()) for _ in range(n)
    ]
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) == 1:
                    lp = OOV_LOGP
                else:
                    continue
            score = best[j][0] + lp
            cand = (score, best[j][1] + (piece,))
            cur = best[i]
            if score > cur[0] or (score == cur[0] and cand[1] < cur[1]):
                best[i] = cand
    return list(best[n][1]), best[n][0]


def train_unigram(
    word_freqs: list[tuple[str, int]],
    vocab_size: int = 500,
    max_piece_len: int = 8,
    seed_pieces: int = 4000,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """EM + prune loop (the hard-EM variant: Viterbi counts, the
    standard simplification of Kudo §3.2's lattice E-step): repeat
    [E-step piece counts from best segmentations → M-step renormalize →
    drop the lowest-probability `prune_frac` of multi-char pieces] until
    the vocabulary reaches `vocab_size`; single characters are never
    pruned. Returns piece → log-probability."""
    logp = init_pieces(word_freqs, max_piece_len, seed_pieces)
    words = sorted(word_freqs)

    def em_pass(cur: dict[str, float]) -> dict[str, float]:
        counts: dict[str, float] = {}
        for w, c in words:
            pieces, _ = viterbi_segment(w, cur, max_piece_len)
            for p in pieces:
                counts[p] = counts.get(p, 0.0) + c
        # unseen pieces die; unseen CHARS stay at the floor
        total = sum(counts.values())
        out = {p: math.log(counts[p] / total) for p in sorted(counts)}
        for p in cur:
            if len(p) == 1 and p not in out:
                out[p] = OOV_LOGP
        return out

    while True:
        for _ in range(em_iters):
            logp = em_pass(logp)
        multi = [p for p in logp if len(p) > 1]
        n_chars = len(logp) - len(multi)
        if len(logp) <= vocab_size or not multi:
            break
        keep_multi = max(0, vocab_size - n_chars)
        n_drop = max(1, int(len(multi) * prune_frac))
        # drop prune_frac per round, but never below the target count
        n_keep = max(keep_multi, len(multi) - n_drop)
        survivors = sorted(multi, key=lambda p: (-logp[p], p))[:n_keep]
        logp = {
            p: lp
            for p, lp in logp.items()
            if len(p) == 1 or p in set(survivors)
        }
    return em_pass(logp)


def apply_unigram(
    df: DataFrame,
    text_col: str,
    id_col: str,
    logp: dict[str, float],
    max_piece_len: int = 8,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Distributed Viterbi encoding — same Arrow shape as
    functions/bpe.apply_bpe: broadcast model, per-type LRU cache."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(logp)

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        model = bc.value

        @lru_cache(maxsize=1 << 16)
        def enc(word: str) -> tuple[str, ...]:
            return tuple(viterbi_segment(word, model, max_piece_len)[0])

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
