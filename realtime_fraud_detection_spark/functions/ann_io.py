"""ANN index-parameter persistence — build the index once, search from
any later session.

Every ANN family in operators/similarity.py separates model-sized
parameters from the corpus-sized data they apply to (the "train small,
apply as a scan" rule): LSH hyperplanes, IVF centroids, the SQ8 affine
grid, PQ codebooks. This module fixes a versioned JSON artifact per
family so those parameters survive the session — the corpus-side
derivatives (cell assignments, int8 codes, PQ codes) are ordinary
DataFrames the caller persists as parquet next to the vectors (see
`streaming/sinks.embedding_ingest_writer`, which already stores its
centroids and coded vectors that way).

Loaded parameters feed the existing builders directly:
`hyperplane_bucket(vec, planes)`, `quantize_embeddings(emb, mins,
scales)`, `pq_encode(emb, codebooks)` — no index-object wrapper to learn.
"""

from __future__ import annotations

from .artifacts import FORMAT, atomic_write, read_artifact

_FORMATS = (FORMAT,)


def save_lsh_planes(planes: list[list[float]], path: str) -> None:
    atomic_write(path, {"format": FORMAT, "version": 1, "kind": "lsh-planes",
                        "planes": planes})


def load_lsh_planes(path: str) -> list[list[float]]:
    return [list(map(float, p)) for p in
            read_artifact(path, "lsh-planes", _FORMATS)["planes"]]


def save_ivf_centroids(centroids: list[list[float]], path: str) -> None:
    atomic_write(path, {"format": FORMAT, "version": 1, "kind": "ivf-centroids",
                        "centroids": centroids})


def load_ivf_centroids(path: str) -> list[list[float]]:
    return [list(map(float, c)) for c in
            read_artifact(path, "ivf-centroids", _FORMATS)["centroids"]]


def save_sq8_grid(mins: list[float], scales: list[float], path: str) -> None:
    if len(mins) != len(scales):
        raise ValueError("mins and scales must have equal length")
    atomic_write(path, {"format": FORMAT, "version": 1, "kind": "sq8-grid",
                        "mins": mins, "scales": scales})


def load_sq8_grid(path: str) -> tuple[list[float], list[float]]:
    art = read_artifact(path, "sq8-grid", _FORMATS)
    return [float(x) for x in art["mins"]], [float(x) for x in art["scales"]]


def save_pq_codebooks(
    codebooks: list[list[list[float]]], path: str, by_residual: bool = False
) -> None:
    atomic_write(path, {"format": FORMAT, "version": 1, "kind": "pq-codebooks",
                        "by_residual": by_residual, "codebooks": codebooks})


def load_pq_codebooks(path: str) -> tuple[list[list[list[float]]], bool]:
    art = read_artifact(path, "pq-codebooks", _FORMATS)
    books = [[list(map(float, c)) for c in book] for book in art["codebooks"]]
    return books, bool(art["by_residual"])


def save_pca(mean: list[float], components: list[list[float]], path: str) -> None:
    atomic_write(path, {"format": FORMAT, "version": 1, "kind": "pca",
                        "mean": mean, "components": components})


def load_pca(path: str) -> tuple[list[float], list[list[float]]]:
    art = read_artifact(path, "pca", _FORMATS)
    return (
        [float(x) for x in art["mean"]],
        [list(map(float, w)) for w in art["components"]],
    )
