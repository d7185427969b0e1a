"""Pure-expression Bloom filter (functions/bloom.py): parameter formulas,
zero false negatives, measured fp rate, pure-Python bitmap replay
(engine-portable md5 determinism), and the bloom decontamination
variant's superset law vs the exact operator."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_parameters,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def test_parameters_formula():
    m, k = bloom_parameters(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10000  # ~9.59 bits/key at 1%
    assert k == 7
    m2, _ = bloom_parameters(1000, 0.001)
    assert m2 > m  # lower fpp -> bigger sketch


def _md5_bigint_py(s: str, salt: str) -> int:
    """Pure-Python replay of functions/hashing.md5_bigint (60-bit
    non-negative hash: first 15 md5 hex chars)."""
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


def _bitmap_py(keys: list[str], m_bits: int, k: int) -> list[int]:
    words = [0] * (m_bits // 64)
    for s in keys:
        h1 = _md5_bigint_py(s, "bloomA:") % m_bits
        h2 = _md5_bigint_py(s, "bloomB:") % max(1, m_bits - 1) + 1
        for i in range(k):
            p = (h1 + i * h2) % m_bits
            words[p // 64] |= 1 << (p % 64)
    # to signed longs (Spark bitmap words are signed)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def test_build_matches_python_replay(spark):
    keys = [f"key{i}" for i in range(500)]
    m, k = bloom_parameters(500, 0.01)
    df = spark.createDataFrame([(s,) for s in keys], "s string")
    assert bloom_build(df, "s", m, k) == _bitmap_py(keys, m, k)


def test_no_false_negatives_and_fp_rate(spark):
    keys = [f"member{i}" for i in range(2000)]
    m, k = bloom_parameters(2000, 0.01)
    df = spark.createDataFrame([(s,) for s in keys], "s string")
    bitmap = bloom_build(df, "s", m, k)
    probe = spark.createDataFrame(
        [(s,) for s in keys] + [(f"absent{i}",) for i in range(5000)], "s string"
    )
    hits = {
        r["s"]
        for r in probe.filter(bloom_might_contain(bitmap, F.col("s"), k)).collect()
    }
    assert set(keys) <= hits  # NEVER a false negative
    fp = len(hits - set(keys)) / 5000
    assert fp <= 0.03, fp  # 1% target with slack


def test_bloom_contamination_superset_of_exact(spark):
    from realtime_fraud_detection_spark.operators.quality import (
        contamination_stats,
        contamination_stats_bloom,
    )

    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    exact = {
        r["doc"]: r["n_contaminated_grams"]
        for r in contamination_stats(docs, bench, n=8).collect()
    }
    # fpp sized to the per-DOC budget: false positives compound across a
    # doc's ~hundreds of grams (operator docstring), so the boolean flag
    # needs a per-gram rate of ~doc_budget/grams_per_doc
    bloom = {
        r["doc"]: r["n_contaminated_grams"]
        for r in contamination_stats_bloom(docs, bench, n=8, fpp=1e-6).collect()
    }
    assert set(bloom) == set(exact)  # one row per doc either way
    for d, n_exact in exact.items():
        assert bloom[d] >= n_exact, d  # no false negatives, ever
    # and the sketch shouldn't over-flag much at this scale
    extra_docs = sum(1 for d in exact if bloom[d] > 0 and exact[d] == 0)
    assert extra_docs <= len(exact) * 0.05


def test_bloom_pruned_join_exact_result(spark):
    """bloom_pruned_join == plain join, row for row: the pre-filter can
    only drop rows the join would drop anyway (no false negatives), and
    its false positives are removed by the join itself."""
    import pytest

    from realtime_fraud_detection_spark.operators.joins import (
        bloom_pruned_join,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    # a selective small side: ~2% of orders
    small = orders.filter(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = lineitem.join(small, "l_orderkey")
    pruned = bloom_pruned_join(lineitem, small, "l_orderkey")
    key = lambda r: tuple(sorted(r.asDict().items()))  # noqa: E731
    assert sorted(map(key, pruned.collect())) == sorted(
        map(key, plain.collect())
    )
    # semi form too
    plain_semi = lineitem.join(small, "l_orderkey", "left_semi")
    pruned_semi = bloom_pruned_join(lineitem, small, "l_orderkey", "left_semi")
    assert pruned_semi.count() == plain_semi.count()
    # non-result-preserving join types must refuse
    with pytest.raises(ValueError):
        bloom_pruned_join(lineitem, small, "l_orderkey", "left_anti")


def test_bloom_pruned_join_actually_prunes(spark):
    """The pre-filter keeps matching rows plus ~fpp of the rest — the
    shuffle input shrinks to roughly the match set (the operator's whole
    point at scale); and the probe sits big-side, before the join."""
    from realtime_fraud_detection_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_parameters,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    small = orders.filter(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    n = small.count()
    m_bits, k = bloom_parameters(n, 0.01)
    # the fast in-job hash pair the operator uses (portable=False)
    bitmap = bloom_build(
        small.select(F.col("l_orderkey").alias("_bk")),
        "_bk",
        m_bits,
        k,
        portable=False,
    )
    total = lineitem.count()
    matches = lineitem.join(small, "l_orderkey", "left_semi").count()
    survivors = lineitem.filter(
        bloom_might_contain(bitmap, F.col("l_orderkey"), k, portable=False)
    ).count()
    assert survivors >= matches  # no false negatives
    assert survivors - matches <= max(50, 0.03 * (total - matches))
