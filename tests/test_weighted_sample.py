"""Weighted sampling without replacement (operators/sampling.weighted_sample,
Efraimidis-Spirakis A-ES): pure-Python replay determinism, weight
monotonicity over many seeds, per-group form, and edge cases."""

from __future__ import annotations

import hashlib
import math

import pytest

from realtime_fraud_detection_spark.operators.sampling import weighted_sample


def _replay(rows, n, seed="wsample:"):
    """Pure-Python A-ES with the same md5-derived u."""
    def key(doc_id, w):
        h = int(hashlib.md5(f"{seed}{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / ((1 << 60) + 1)
        return math.log(u) / w
    eligible = [(i, w) for i, w in rows if w > 0]
    ranked = sorted(eligible, key=lambda t: (-key(*t), t[0]))
    return [i for i, _ in ranked[:n]]


def test_matches_python_replay_exactly(spark):
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(r["doc_id"] for r in weighted_sample(df, "w", 50).collect())
    assert got == sorted(_replay(rows, 50))


def test_heavier_weights_sampled_more_often(spark):
    # two classes, weight 10 vs 1, equal counts: across 30 seeds the
    # heavy class must dominate the sample
    rows = [(i, 10.0 if i < 100 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy = 0
    for s in range(30):
        picked = {r["doc_id"] for r in weighted_sample(df, "w", 20, seed=f"s{s}:").collect()}
        heavy += sum(1 for i in picked if i < 100)
    frac = heavy / (30 * 20)
    assert frac > 0.75, frac  # expected ~0.9; 0.5 would mean unweighted


def test_group_form_and_edge_cases(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", float(i + 1)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    out = weighted_sample(df, "w", 5, group_col="g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["doc_id"])
    assert sorted(by_g) == ["a", "b"]
    assert all(len(v) == 5 for v in by_g.values())
    # zero/negative weights never sample; n larger than corpus is fine
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 2.0)], "doc_id long, w double")
    assert [r["doc_id"] for r in weighted_sample(df2, "w", 10).collect()] == [3]
    with pytest.raises(ValueError):
        weighted_sample(df2, "w", 0)


def test_cap_per_group(spark):
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.sampling import cap_per_group

    rows = [(i, f"dom{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = cap_per_group(df, "dom", 7).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["dom"], set()).add(r["doc_id"])
    assert all(len(v) == 7 for v in by_g.values())
    # deterministic across reruns
    again = {(r["dom"], r["doc_id"]) for r in cap_per_group(df, "dom", 7).collect()}
    assert again == {(r["dom"], r["doc_id"]) for r in out}
    # groups smaller than the cap survive whole; explicit order honored
    small = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, dom string")
    assert cap_per_group(small, "dom", 5).count() == 3
    newest = cap_per_group(small, "dom", 1, order_col=F.col("doc_id").desc())
    assert {r["doc_id"] for r in newest.collect()} == {2, 3}
    import pytest

    with pytest.raises(ValueError):
        cap_per_group(small, "dom", 0)


def test_kfold_splits(spark):
    from realtime_fraud_detection_spark.operators.sampling import kfold_splits

    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    folds = kfold_splits(docs, "doc_id", k=5)
    assert len(folds) == 5
    test_sets = [
        {r["doc_id"] for r in te.select("doc_id").collect()} for _, te in folds
    ]
    # disjoint + exhaustive
    all_ids = set()
    for s in test_sets:
        assert not (all_ids & s)
        all_ids |= s
    assert all_ids == set(range(500))
    # train = complement of test, reproducible
    tr0 = {r["doc_id"] for r in folds[0][0].select("doc_id").collect()}
    assert tr0 == all_ids - test_sets[0]
    again = kfold_splits(docs, "doc_id", k=5)
    assert {r["doc_id"] for r in again[0][1].collect()} == test_sets[0]
    import pytest

    with pytest.raises(ValueError):
        kfold_splits(docs, "doc_id", k=1)


def test_winsorize(spark):
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.functions.features import (
        winsorize,
        winsorize_fractions,
    )

    vals = list(range(100)) + [10_000, -10_000]  # heavy tails
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    lo, hi = winsorize_fractions(df, "x", 0.05, 0.95)
    out = [
        r["w"]
        for r in df.select(winsorize(F.col("x"), lo, hi).alias("w")).collect()
    ]
    assert max(out) == hi and min(out) == lo
    assert all(lo <= v <= hi for v in out)
    # interior values untouched
    assert 50.0 in out
