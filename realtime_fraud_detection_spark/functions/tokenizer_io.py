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

from .artifacts import atomic_write, read_artifact


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist an ordered BPE merge list (functions/bpe.train_bpe output).
    Order IS the model — encoding applies merges by rank."""
    art = {
        "format": "spark-graft-tokenizer",
        "version": 1,
        "algorithm": "bpe",
        "merges": [[a, b] for a, b in merges],
    }
    atomic_write(path, art)


def load_bpe(path: str) -> list[tuple[str, str]]:
    art = read_artifact(path, "bpe", _FORMATS)
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
    atomic_write(path, art)


def load_unigram(path: str) -> dict[str, float]:
    art = read_artifact(path, "unigram", _FORMATS)
    return {p: float(lp) for p, lp in art["pieces"]}



# both the original tokenizer format tag and the shared artifact tag load
_FORMATS = ("spark-graft-tokenizer", "spark-graft-artifact")
