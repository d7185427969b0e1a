"""The LSH band-table materialization strategies must be output-equivalent —
the strategy only decides where the shared self-join subtree is pinned
(executor storage / reliable checkpoint / parquet table / recompute)."""

from __future__ import annotations

import pytest

from realtime_fraud_detection_spark.operators import dedup as D
from realtime_fraud_detection_spark.sources.testdata import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def _pairs(spark, sf_dir, **kw):
    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_lsh_candidates(docs, "text", "doc_id", num_perm=4, band_size=2, **kw)
    return sorted((r["doc_a"], r["doc_b"]) for r in cands.collect())


def test_materialize_strategies_identical_output(spark, tmp_path):
    base = _pairs(spark, SF_SMOKE)  # default local_checkpoint
    assert base, "fixture should produce candidates"
    assert _pairs(spark, SF_SMOKE, materialize="none") == base
    assert (
        _pairs(spark, SF_SMOKE, materialize="table", materialize_path=str(tmp_path / "bands"))
        == base
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    assert _pairs(spark, SF_SMOKE, materialize="checkpoint") == base


def test_materialize_table_requires_path(spark):
    with pytest.raises(ValueError, match="materialize_path"):
        _pairs(spark, SF_SMOKE, materialize="table")


def test_unknown_strategy_rejected(spark):
    with pytest.raises(ValueError, match="unknown materialize"):
        _pairs(spark, SF_SMOKE, materialize="bogus")
