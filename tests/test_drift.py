"""PSI drift monitoring (ml/drift.py): hand-computed parity, zero drift
on identical data, monotone response to shift, categorical folding."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.drift import (
    numeric_cuts,
    psi_categorical,
    psi_numeric,
    psi_numeric_detail,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_identical_distribution_is_zero(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    base = docs.select(F.col("n_chars").cast("double").alias("x"))
    psi = psi_numeric(base, base, "x", n_buckets=10).first()["psi"]
    assert psi == pytest.approx(0.0, abs=1e-12)


def test_shift_monotone(spark):
    base = _vals(spark, range(1000))
    small = _vals(spark, [x + 50 for x in range(1000)])
    big = _vals(spark, [x + 400 for x in range(1000)])
    p_small = psi_numeric(base, small, "x").first()["psi"]
    p_big = psi_numeric(base, big, "x").first()["psi"]
    assert 0 < p_small < p_big
    assert p_big > 0.25  # rule-of-thumb: retrain territory


def test_hand_computed_parity(spark):
    # 2 buckets, cuts at the median of [0..99] -> 49.5ish; current is
    # 75/25 split; replicate the arithmetic exactly (incl. eps floors)
    base = _vals(spark, range(100))
    cur = _vals(spark, list(range(50)) + list(range(50, 100)) + list(range(50)))
    cuts = numeric_cuts(base, "x", 2)
    got = psi_numeric(base, cur, "x", n_buckets=2).first()["psi"]
    c = cuts[0]
    pb = [sum(1 for v in range(100) if v <= c) / 100, sum(1 for v in range(100) if v > c) / 100]
    curv = list(range(50)) + list(range(50, 100)) + list(range(50))
    pc = [sum(1 for v in curv if v <= c) / len(curv), sum(1 for v in curv if v > c) / len(curv)]
    want = sum((q - p) * math.log(q / p) for p, q in zip(pb, pc))
    assert got == pytest.approx(want, rel=1e-9)


def test_detail_rows_and_new_bucket_smoothing(spark):
    base = _vals(spark, range(100))
    cur = _vals(spark, [x + 1000 for x in range(100)])  # all mass in top bucket
    det = psi_numeric_detail(base, cur, "x", n_buckets=4).collect()
    assert len(det) == 4
    assert all(math.isfinite(r["contribution"]) for r in det)  # eps floor


def test_categorical_folds_new_values(spark):
    base = spark.createDataFrame([("a",)] * 80 + [("b",)] * 20, "c string")
    same = psi_categorical(base, base, "c").first()["psi"]
    assert same == pytest.approx(0.0, abs=1e-12)
    cur = spark.createDataFrame([("a",)] * 50 + [("zzz",)] * 50, "c string")
    psi = psi_categorical(base, cur, "c").first()["psi"]
    assert math.isfinite(psi) and psi > 0.25  # new category -> big drift
