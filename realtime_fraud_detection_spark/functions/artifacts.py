"""Shared mechanics for JSON model artifacts (tokenizers, ANN indexes):
atomic write, format/kind validation. JSON, not pickle — artifacts are
inspectable, diffable in release review, and loadable from any language."""

from __future__ import annotations

import json
import os

FORMAT = "spark-graft-artifact"


def atomic_write(path: str, art: dict) -> None:
    """Write-then-rename so a crashed save never leaves a half-written
    artifact where a loader might find it."""
    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(art, f, ensure_ascii=False, separators=(",", ":"))
    os.replace(tmp, path)


def read_artifact(path: str, expect_kind: str, formats: tuple[str, ...]) -> dict:
    with open(path, encoding="utf-8") as f:
        art = json.load(f)
    if art.get("format") not in formats:
        raise ValueError(f"{path}: not a recognized artifact")
    kind = art.get("kind", art.get("algorithm"))
    if kind != expect_kind:
        raise ValueError(
            f"{path}: artifact holds a {kind!r} model, expected {expect_kind!r}"
        )
    return art
