"""ANN index-parameter persistence (functions/ann_io.py): roundtrip
identity and cross-session apply parity for every family, plus the
kind guard."""

from __future__ import annotations

import pytest

from realtime_fraud_detection_spark.functions.ann_io import (
    load_ivf_centroids,
    load_lsh_planes,
    load_pq_codebooks,
    load_sq8_grid,
    save_ivf_centroids,
    save_lsh_planes,
    save_pq_codebooks,
    save_sq8_grid,
)
from realtime_fraud_detection_spark.operators.similarity import (
    make_planes,
    pq_encode,
    pq_train,
    quantization_params,
    quantize_embeddings,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def test_lsh_and_ivf_roundtrip(tmp_path):
    planes = make_planes(dim=8, n_planes=4)
    p = str(tmp_path / "planes.json")
    save_lsh_planes(planes, p)
    assert load_lsh_planes(p) == planes
    cents = [[1.0, 2.0], [3.5, -4.0]]
    c = str(tmp_path / "cents.json")
    save_ivf_centroids(cents, c)
    assert load_ivf_centroids(c) == cents


def test_sq8_grid_roundtrip_and_apply_parity(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    mins, scales = quantization_params(emb)
    p = str(tmp_path / "grid.json")
    save_sq8_grid(mins, scales, p)
    lmins, lscales = load_sq8_grid(p)
    assert (lmins, lscales) == (mins, scales)
    a = {r["nid"]: r["codes"] for r in quantize_embeddings(emb, mins, scales).collect()}
    b = {r["nid"]: r["codes"] for r in quantize_embeddings(emb, lmins, lscales).collect()}
    assert a == b
    with pytest.raises(ValueError, match="equal length"):
        save_sq8_grid([1.0], [1.0, 2.0], str(tmp_path / "bad.json"))


def test_pq_codebooks_roundtrip_and_apply_parity(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    books = pq_train(emb, m=8, ks=8)
    p = str(tmp_path / "pq.json")
    save_pq_codebooks(books, p, by_residual=False)
    lbooks, by_res = load_pq_codebooks(p)
    assert lbooks == books and by_res is False
    a = {r["nid"]: r["codes"] for r in pq_encode(emb, books).collect()}
    b = {r["nid"]: r["codes"] for r in pq_encode(emb, lbooks).collect()}
    assert a == b


def test_kind_guard(tmp_path):
    p = str(tmp_path / "x.json")
    save_lsh_planes([[1.0]], p)
    with pytest.raises(ValueError, match="expected 'sq8-grid'"):
        load_sq8_grid(p)
