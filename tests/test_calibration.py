"""Isotonic score calibration + rolling-origin temporal splits
(ml/calibration.py): calibration recovers a known miscalibration
(Brier improves, reliability bins line up, map is monotone), and
forward-chaining folds never train on the future."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.calibration import (
    brier_score,
    calibrate,
    fit_isotonic_calibrator,
    reliability_table,
    rolling_origin_splits,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def _miscalibrated(spark, n=4000):
    """Deterministic synthetic scorer whose raw score s overstates risk:
    true P(label=1 | s) = s², label decided by an md5 coin per row."""
    rows = []
    for i in range(n):
        s = (i % 100) / 100.0 + 0.005
        u = int(hashlib.md5(f"cal:{i}".encode()).hexdigest()[:8], 16) / 16**8
        rows.append((i, s, 1.0 if u < s * s else 0.0))
    return spark.createDataFrame(rows, "id bigint, score double, label double")


def test_isotonic_improves_brier_and_reliability(spark):
    df = _miscalibrated(spark)
    model = fit_isotonic_calibrator(df, "score", "label")
    out = calibrate(df, model, "score").cache()
    raw = brier_score(out, "score", "label")
    cal = brier_score(out, "calibrated", "label")
    assert cal < raw, (cal, raw)
    # reliability: calibrated bins track observed frequency much closer
    # than raw-score bins (raw overstates by s − s² ≈ up to 0.25)
    rel = reliability_table(out, "calibrated", "label").collect()
    for r in rel:
        if r["n"] >= 100:
            assert abs(r["mean_pred"] - r["frac_pos"]) < 0.1, tuple(r)
    out.unpersist()


def test_calibrated_map_is_monotone(spark):
    df = _miscalibrated(spark)
    model = fit_isotonic_calibrator(df, "score", "label")
    grid = spark.createDataFrame(
        [(i / 200.0,) for i in range(201)], "score double"
    )
    vals = [
        r["calibrated"]
        for r in calibrate(grid, model, "score").orderBy("score").collect()
    ]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_calibrator_roundtrips_persistence(spark, tmp_path):
    from pyspark.ml.regression import IsotonicRegressionModel

    df = _miscalibrated(spark, n=1000)
    model = fit_isotonic_calibrator(df, "score", "label")
    p = str(tmp_path / "iso")
    model.save(p)
    reloaded = IsotonicRegressionModel.load(p)
    a = calibrate(df, model, "score").select("id", "calibrated").collect()
    b = calibrate(df, reloaded, "score").select("id", "calibrated").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rolling_origin_no_future_leak(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    folds = rolling_origin_splits(ev, "ts", n_folds=4)
    assert len(folds) == 4
    n = ev.count()
    prev_test_max = None
    for train, test in folds:
        bounds = train.agg(F.max("ts").alias("mx")).first()
        t_bounds = test.agg(
            F.min("ts").alias("mn"), F.max("ts").alias("mx")
        ).first()
        # the defining property: every training row precedes every test row
        assert bounds["mx"] < t_bounds["mn"]
        # folds advance: train grows to cover earlier test slices
        if prev_test_max is not None:
            assert bounds["mx"] >= prev_test_max
        prev_test_max = t_bounds["mx"]
        # near-equal test mass (quantile boundaries)
        assert abs(test.count() - n / 5) < 0.05 * n
    # the last fold's train+test together cover the whole frame
    last_train, last_test = folds[-1]
    assert last_train.count() + last_test.count() == n
