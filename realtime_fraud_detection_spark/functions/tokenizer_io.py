"""Tokenizer artifact persistence — train once, apply anywhere.

Both subword trainers in this repo produce MODEL-sized driver objects
(BPE: an ordered merge list; unigram-LM: piece -> log-probability), and
real pipelines train them on one corpus snapshot and reuse them for
every later ingest, split, and serving path. This module fixes a stable
JSON artifact format for each (versioned, self-describing), so a trained
tokenizer survives the session and travels with the dataset it tokenized
— the tokenizer.json idiom of modern tokenizer libraries, minus any
external dependency.

JSON, not pickle: artifacts are inspectable, diffable in a release
review, and loadable from any language (the vocab IS the contract with
the training run that consumes the tokens).
"""

from __future__ import annotations

import json
import os


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist an ordered BPE merge list (functions/bpe.train_bpe output).
    Order IS the model — encoding applies merges by rank."""
    art = {
        "format": "spark-graft-tokenizer",
        "version": 1,
        "algorithm": "bpe",
        "merges": [[a, b] for a, b in merges],
    }
    _atomic_write(path, art)


def load_bpe(path: str) -> list[tuple[str, str]]:
    art = _read(path, expect_algorithm="bpe")
    return [(a, b) for a, b in art["merges"]]


def save_unigram(logp: dict[str, float], path: str) -> None:
    """Persist a unigram-LM piece table (functions/unigram_lm.train_unigram
    output). Pieces sort lexicographically so the artifact is
    byte-deterministic for a given model (diff-friendly)."""
    art = {
        "format": "spark-graft-tokenizer",
        "version": 1,
        "algorithm": "unigram",
        "pieces": [[p, logp[p]] for p in sorted(logp)],
    }
    _atomic_write(path, art)


def load_unigram(path: str) -> dict[str, float]:
    art = _read(path, expect_algorithm="unigram")
    return {p: float(lp) for p, lp in art["pieces"]}


def _atomic_write(path: str, art: dict) -> None:
    """Write-then-rename so a crashed save never leaves a half-written
    artifact where a loader might find it."""
    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(art, f, ensure_ascii=False, separators=(",", ":"))
    os.replace(tmp, path)


def _read(path: str, expect_algorithm: str) -> dict:
    with open(path, encoding="utf-8") as f:
        art = json.load(f)
    if art.get("format") != "spark-graft-tokenizer":
        raise ValueError(f"{path}: not a tokenizer artifact")
    if art.get("algorithm") != expect_algorithm:
        raise ValueError(
            f"{path}: artifact holds a {art.get('algorithm')!r} tokenizer, "
            f"expected {expect_algorithm!r}"
        )
    return art
