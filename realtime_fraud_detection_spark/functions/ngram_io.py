"""Stupid Backoff n-gram LM persistence — count the reference corpus
once, score every later corpus map-side.

This is CCNet's production topology (Wenzek et al. LREC'20 §4.3): a FIXED
language model (theirs: a KenLM counted from Wikipedia) scores each
incoming CommonCrawl shard; the model is built once and shipped to the
scorers. Here the model is the three count tables of
operators/quality.fit_ngram_lm — vocabulary-sized after KenLM-style
pruning, far beyond artifacts.py's single-JSON blobs — so the artifact is
a DIRECTORY: parquet count tables plus a meta.json in the shared artifact
format (written LAST, so its presence marks a complete save; the whole
directory is built in a temp path renamed into place, so a crashed or
concurrent save never leaves a torn artifact where a loader looks).

    <path>/
      meta.json   {format, kind: "stupid-backoff-trigram", version,
                   n_corpus, min_count, vocab/bigram/trigram row counts}
      uni/        parquet (w, c1w)
      bi/         parquet (w1, w, c2)
      tri/        parquet (w2, w1, w, c3)

Loaded models feed ``ngram_lm_logprob(df, lm=...)`` directly: the count
tables broadcast, every join in the scorer becomes a BroadcastHashJoin,
and scoring a 100 TB shard is one scan + two per-doc aggregations — no
LM-side shuffle at all (plan-pinned in tests/test_ngram_io.py).

Reference behavior source: the reference repo has no LM persistence (its
text path is rule-based, model_manager.py fallbacks); this implements the
published CCNet/Brants design the quality family already follows.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

from .artifacts import FORMAT

KIND = "stupid-backoff-trigram"


def save_ngram_lm(lm, path: str, min_count: int = 1) -> dict:
    """Persist a fitted :class:`~..operators.quality.NgramLM` (pruned at
    `min_count` — one threshold across all orders, which preserves the
    scorer's backoff-closure invariants; see quality.prune_ngram_lm).
    Returns the written meta dict. Overwrite semantics: a complete
    existing artifact at `path` is replaced atomically."""
    from ..operators.quality import prune_ngram_lm

    pruned = prune_ngram_lm(lm, min_count)
    tmp = f"{path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    counts = {}
    for name, df in (("uni", pruned.uni), ("bi", pruned.bi), ("tri", pruned.tri)):
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        counts[name] = df.count()
    meta = {
        "format": FORMAT,
        "version": 1,
        "kind": KIND,
        "n_corpus": float(lm.n_corpus),
        "min_count": int(min_count),
        "counts": counts,
    }
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)  # meta last: marks the save complete
    old = f"{path}.old.{os.getpid()}"
    try:
        if os.path.exists(path):
            os.rename(path, old)  # keep the old artifact live until the
        os.rename(tmp, path)  # new one is fully in place
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent saver won
    shutil.rmtree(old, ignore_errors=True)
    return meta


def load_ngram_lm(spark: SparkSession, path: str):
    """Load a persisted LM back into an :class:`NgramLM` whose count
    tables are ordinary parquet scans — `ngram_lm_logprob(lm=...)`
    broadcasts them at join time."""
    from ..operators.quality import NgramLM

    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"{path}: no complete n-gram LM artifact")
    with open(meta_path, encoding="utf-8") as f:
        meta = json.load(f)
    if meta.get("format") != FORMAT or meta.get("kind") != KIND:
        raise ValueError(
            f"{path}: artifact holds {meta.get('kind')!r}, expected {KIND!r}"
        )
    return NgramLM(
        uni=spark.read.parquet(os.path.join(path, "uni")),
        bi=spark.read.parquet(os.path.join(path, "bi")),
        tri=spark.read.parquet(os.path.join(path, "tri")),
        n_corpus=float(meta["n_corpus"]),
    )
