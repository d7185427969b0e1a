"""DeLong AUC standard error / CI (ml/evaluation.auc_with_ci): exact
pure-Python DeLong replay parity, 1/sqrt(n) width shrinkage, degenerate
guards, partitioning invariance, and the inverse-normal approximation."""

from __future__ import annotations

import math
import random

from realtime_fraud_detection_spark.ml.evaluation import (
    _z_from_alpha,
    auc_with_ci,
    binary_eval,
)


def _delong_replay(pairs):
    """Textbook DeLong (1988): placements via O(P·N) pair comparison."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    P, N = len(pos), len(neg)
    v10 = [
        sum(1.0 if p > n else 0.5 if p == n else 0.0 for n in neg) / N
        for p in pos
    ]
    v01 = [
        sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos) / P
        for n in neg
    ]
    auc = sum(v10) / P
    s10 = sum((v - auc) ** 2 for v in v10) / (P - 1)
    s01 = sum((v - auc) ** 2 for v in v01) / (N - 1)
    return auc, math.sqrt(s10 / P + s01 / N)


def _data(spark, n, seed=3, grid=25):
    rng = random.Random(seed)
    pairs = [
        (rng.randrange(grid) / grid + (0.3 if rng.random() < 0.5 else 0.0), 0)
        for _ in range(n // 2)
    ] + [
        (rng.randrange(grid) / grid + (0.3 if rng.random() < 0.8 else 0.0), 1)
        for _ in range(n - n // 2)
    ]
    rng.shuffle(pairs)
    return pairs, spark.createDataFrame(pairs, "score double, label int")


def test_matches_pair_level_delong_replay(spark):
    pairs, df = _data(spark, 300)
    got = auc_with_ci(df).first()
    want_auc, want_se = _delong_replay(pairs)
    assert abs(got["auc"] - want_auc) < 1e-12
    assert abs(got["se"] - want_se) < 1e-12
    assert got["lo"] < got["auc"] < got["hi"]
    # same auc as binary_eval (one shared definition of ties)
    assert got["auc"] == binary_eval(df).first()["auc"]


def test_ci_width_shrinks_with_sqrt_n(spark):
    _, small = _data(spark, 400, seed=5)
    _, big = _data(spark, 6400, seed=5)
    w_small = (lambda r: r["hi"] - r["lo"])(auc_with_ci(small).first())
    w_big = (lambda r: r["hi"] - r["lo"])(auc_with_ci(big).first())
    # 16x data -> ~4x narrower; allow slack for distribution drift
    assert w_big < w_small / 2.5


def test_degenerate_groups_guarded(spark):
    df = spark.createDataFrame(
        [("a", 0.5, 1), ("a", 0.7, 0), ("a", 0.6, 1), ("b", 0.5, 1), ("b", 0.9, 1)],
        "g string, score double, label int",
    )
    rows = {r["g"]: r for r in auc_with_ci(df, by=["g"]).collect()}
    assert rows["a"]["se"] is None  # N = 1: s01 undefined
    assert rows["b"]["auc"] is None and rows["b"]["se"] is None  # no negatives


def test_partitioning_invariant(spark):
    _, df = _data(spark, 500, seed=9)
    a = auc_with_ci(df.repartition(1)).first()
    b = auc_with_ci(df.repartition(7)).first()
    assert a == b  # decimal-exact sums: bit-identical on any layout


def test_ci_clamped_to_unit_interval(spark):
    # perfectly separated, tiny n -> wide CI, must clamp
    df = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], "score double, label int"
    )
    r = auc_with_ci(df, alpha=0.001).first()
    assert r["auc"] == 1.0 and r["hi"] == 1.0 and r["lo"] >= 0.0


def _paired_replay(rows):
    """Textbook paired DeLong: O(P·N) placements under both models."""
    pos = [(a, b) for a, b, y in rows if y == 1]
    neg = [(a, b) for a, b, y in rows if y == 0]
    P, N = len(pos), len(neg)

    def psi(x, y):
        return 1.0 if x > y else 0.5 if x == y else 0.0

    v10a = [sum(psi(p[0], n[0]) for n in neg) / N for p in pos]
    v10b = [sum(psi(p[1], n[1]) for n in neg) / N for p in pos]
    v01a = [sum(psi(p[0], n[0]) for p in pos) / P for n in neg]
    v01b = [sum(psi(p[1], n[1]) for p in pos) / P for n in neg]
    auc_a, auc_b = sum(v10a) / P, sum(v10b) / P

    def s(u, v):
        mu, mv = sum(u) / len(u), sum(v) / len(v)
        return sum((x - mu) * (y - mv) for x, y in zip(u, v)) / (len(u) - 1)

    var = (s(v10a, v10a) + s(v10b, v10b) - 2 * s(v10a, v10b)) / P + (
        s(v01a, v01a) + s(v01b, v01b) - 2 * s(v01a, v01b)
    ) / N
    return auc_a, auc_b, math.sqrt(var)


def test_paired_delong_matches_replay(spark):
    from realtime_fraud_detection_spark.ml.evaluation import (
        delong_paired_test,
    )

    rng = random.Random(17)
    rows = []
    for _ in range(240):
        y = rng.randrange(2)
        base = rng.randrange(20) / 20 + (0.25 if y else 0.0)
        # model b = correlated, noisier version of model a
        rows.append(
            (base, base + rng.randrange(-2, 3) / 10, y)
        )
    df = spark.createDataFrame(rows, "sa double, sb double, label int")
    got = delong_paired_test(df, "sa", "sb").first()
    auc_a, auc_b, se = _paired_replay(rows)
    assert abs(got["auc_a"] - auc_a) < 1e-12
    assert abs(got["auc_b"] - auc_b) < 1e-12
    assert abs(got["se"] - se) < 1e-12
    assert got["n"] == 240


def test_paired_delong_identical_models_not_significant(spark):
    rng = random.Random(23)
    rows = [
        (s := rng.randrange(30) / 30 + (0.2 * (y := rng.randrange(2))), s, y)
        for _ in range(200)
    ]
    from realtime_fraud_detection_spark.ml.evaluation import (
        delong_paired_test,
    )

    df = spark.createDataFrame(rows, "sa double, sb double, label int")
    r = delong_paired_test(df, "sa", "sb").first()
    assert r["delta"] == 0.0 and not r["significant"]


def test_paired_delong_detects_dominant_model(spark):
    rng = random.Random(29)
    rows = []
    for _ in range(400):
        y = rng.randrange(2)
        good = rng.randrange(50) / 50 + (0.5 if y else 0.0)  # strong
        bad = rng.randrange(50) / 50  # uninformative
        rows.append((good, bad, y))
    from realtime_fraud_detection_spark.ml.evaluation import (
        delong_paired_test,
    )

    df = spark.createDataFrame(rows, "sa double, sb double, label int")
    r = delong_paired_test(df, "sa", "sb").first()
    assert r["auc_a"] > 0.8 > r["auc_b"] and r["significant"] and r["z"] > 3


def test_ece_hand_computed(spark):
    from realtime_fraud_detection_spark.ml.evaluation import (
        expected_calibration_error,
    )

    # bin [0.0,0.5): scores .2/.4 mean .3, frac_pos .5 -> gap .2, n=2
    # bin [0.5,1.0]: scores .8/.8 mean .8, frac_pos 1. -> gap .2, n=2
    df = spark.createDataFrame(
        [(0.2, 0), (0.4, 1), (0.8, 1), (0.8, 1)], "score double, label int"
    )
    r = expected_calibration_error(df, bins=2).first()
    assert r["n"] == 4
    assert abs(r["ece"] - 0.2) < 1e-12


def test_ece_separates_calibrated_from_miscalibrated(spark):
    from realtime_fraud_detection_spark.ml.evaluation import (
        expected_calibration_error,
    )

    rng = random.Random(31)
    calibrated, miscal = [], []
    for _ in range(20000):
        s = rng.randrange(100) / 100
        u = rng.random()
        calibrated.append((s, 1 if u < s else 0))  # P(y|s) = s
        miscal.append((s, 1 if u < s * s else 0))  # claims s, delivers s²
    good = expected_calibration_error(
        spark.createDataFrame(calibrated, "score double, label int")
    ).first()["ece"]
    bad = expected_calibration_error(
        spark.createDataFrame(miscal, "score double, label int")
    ).first()["ece"]
    # E|s - s²| over uniform s is 1/6; the calibrated model's gap is
    # only sampling noise
    assert good < 0.03 < 0.12 < bad


def test_ece_partitioning_invariant(spark):
    from realtime_fraud_detection_spark.ml.evaluation import (
        expected_calibration_error,
    )

    rng = random.Random(37)
    rows = [
        (rng.random(), rng.randrange(2)) for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    a = expected_calibration_error(df.repartition(1)).first()
    b = expected_calibration_error(df.repartition(9)).first()
    assert a == b


def test_z_from_alpha():
    assert abs(_z_from_alpha(0.05) - 1.959963984540054) < 1e-8
    assert abs(_z_from_alpha(0.01) - 2.5758293035489004) < 1e-8
    assert abs(_z_from_alpha(0.32) - 0.9944578832097532) < 1e-8
