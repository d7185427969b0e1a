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


def test_topk_serves_from_artifacts(spark, tmp_path):
    """int8_topk/pq_topk/lsh_topk accept persisted parameters and return
    exactly what the in-session-trained call returns (same seed)."""
    from realtime_fraud_detection_spark.operators.similarity import (
        int8_topk,
        lsh_topk,
        make_planes,
        pq_topk,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    mins, scales = quantization_params(emb)
    save_sq8_grid(mins, scales, str(tmp_path / "g.json"))
    a = int8_topk(emb, queries, k=3).collect()
    b = int8_topk(emb, queries, k=3, params=load_sq8_grid(str(tmp_path / "g.json"))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    books = pq_train(emb, m=8, ks=8)
    save_pq_codebooks(books, str(tmp_path / "pq.json"))
    a = pq_topk(emb, queries, k=3, m=8, ks=8).collect()
    b = pq_topk(emb, queries, k=3, codebooks=load_pq_codebooks(str(tmp_path / "pq.json"))[0]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    planes = make_planes(dim=64, n_planes=4)
    save_lsh_planes(planes, str(tmp_path / "p.json"))
    a = lsh_topk(emb, queries, k=3, n_planes=4, dim=64).collect()
    b = lsh_topk(emb, queries, k=3, planes=load_lsh_planes(str(tmp_path / "p.json"))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
