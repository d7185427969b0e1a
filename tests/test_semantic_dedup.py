"""semantic_dedup: within-cell cosine groups collapse to min-id survivors,
distinct vectors survive, and the composition (KMeans cells → bucketed pair
join → connected components) is deterministic under the fixed seed."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.dedup import semantic_dedup


def _emb(spark):
    # two well-separated semantic regions; ids 1/2/3 are near-identical
    # paraphrase vectors, 10/11 likewise, 4 and 12 are distinct
    rows = [
        (1, [1.0, 0.02, 0.0, 0.0]),
        (2, [0.99, 0.0, 0.01, 0.0]),
        (3, [1.0, 0.01, 0.01, 0.0]),
        (4, [0.6, 0.8, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.02]),
        (11, [0.0, 0.01, 0.99, 0.0]),
        (12, [0.0, 0.0, 0.6, -0.8]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_dedup_groups_and_survivors(spark):
    out = semantic_dedup(
        _emb(spark), threshold=0.95, n_cells=2, dim=4, seed=42
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 7
    # paraphrase groups collapse to the min id
    assert by_id[1]["dup_group"] == 1 and by_id[1]["is_survivor"]
    assert by_id[2]["dup_group"] == 1 and not by_id[2]["is_survivor"]
    assert by_id[3]["dup_group"] == 1 and not by_id[3]["is_survivor"]
    assert by_id[10]["dup_group"] == 10 and by_id[10]["is_survivor"]
    assert by_id[11]["dup_group"] == 10 and not by_id[11]["is_survivor"]
    # distinct vectors are their own group and survive
    assert by_id[4]["dup_group"] == 4 and by_id[4]["is_survivor"]
    assert by_id[12]["dup_group"] == 12 and by_id[12]["is_survivor"]
    # cells separate the two regions (group members share a cell)
    assert by_id[1]["cell"] == by_id[2]["cell"] == by_id[3]["cell"]
    assert by_id[10]["cell"] == by_id[11]["cell"]


def test_semantic_dedup_deterministic(spark):
    a = semantic_dedup(_emb(spark), threshold=0.95, n_cells=2, dim=4, seed=42)
    b = semantic_dedup(_emb(spark), threshold=0.95, n_cells=2, dim=4, seed=42)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_semantic_dedup_fit_fraction(spark):
    """Sampled-fit path (the 100 TB form): assignment still covers every
    row and survivors stay unique per group."""
    out = semantic_dedup(
        _emb(spark), threshold=0.95, n_cells=2, dim=4, seed=42, fit_fraction=0.9
    )
    assert out.count() == 7
    groups = (
        out.groupBy("dup_group")
        .agg(F.sum(F.col("is_survivor").cast("int")).alias("s"))
        .collect()
    )
    assert all(r["s"] == 1 for r in groups)
