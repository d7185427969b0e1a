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


def test_stream_equals_batch_psi(spark, tmp_path):
    """Two streamed batches' merged counts must score the EXACT same PSI
    as the one-shot batch computation over their union, baseline loaded
    cold from its artifact; a windowed view isolates one batch."""
    from realtime_fraud_detection_spark.ml.drift import (
        fit_drift_baseline,
        load_drift_baseline,
        save_drift_baseline,
    )
    from realtime_fraud_detection_spark.streaming.sinks import (
        drift_monitor_writer,
        drift_psi_view,
    )

    base = _vals(spark, range(1000))
    model = fit_drift_baseline(base, "x", n_buckets=8)
    p = str(tmp_path / "baseline.json")
    save_drift_baseline(model, p)
    loaded = load_drift_baseline(p)
    assert loaded == {k: model[k] for k in ("col", "cuts", "p_base")}

    b1 = _vals(spark, [v + 100 for v in range(400)])
    b2 = _vals(spark, [v + 300 for v in range(600)])
    out = str(tmp_path / "mon")
    w = drift_monitor_writer(out, loaded)
    w(b1, 0)
    w(b2, 1)
    streamed = drift_psi_view(spark, out, loaded).first()
    batch = psi_numeric(base, b1.unionAll(b2), "x", n_buckets=8).first()
    assert streamed["psi"] == pytest.approx(batch["psi"], rel=1e-12)
    assert streamed["n_rows"] == 1000
    # windowed view: batch 1 alone
    only_b2 = drift_psi_view(spark, out, loaded, batch_ids=[1]).first()
    alone = psi_numeric(base, b2, "x", n_buckets=8).first()
    assert only_b2["psi"] == pytest.approx(alone["psi"], rel=1e-12)
    # replay idempotency: rewriting batch 0 must not change the totals
    w(b1, 0)
    again = drift_psi_view(spark, out, loaded).first()
    assert again["psi"] == streamed["psi"] and again["n_rows"] == 1000


def test_categorical_detail_sums_to_total(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    from realtime_fraud_detection_spark.ml.drift import (
        psi_categorical_detail,
    )

    base = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    total = psi_categorical(base, cur, "event_type").first()
    detail = psi_categorical_detail(base, cur, "event_type").collect()
    assert total["n_buckets"] == len(detail)
    assert total["psi"] == pytest.approx(
        sum(r["contribution"] for r in detail), rel=1e-12
    )


def test_suite_drift_report(spark):
    """The round-12 driver query: per-bucket PSI detail for value +
    event_type plus a __total__ row per feature; the total must equal the
    DECIMAL sum of the ROUNDED per-bucket contributions exactly (the
    query's documented determinism contract)."""
    from decimal import Decimal

    from realtime_fraud_detection_spark.suite.mlops_q import q_drift_report

    rows = q_drift_report(spark, SF_SMOKE).collect()
    feats = {r["feature"] for r in rows}
    assert feats == {"value", "event_type"}
    for feat in feats:
        det = [
            r for r in rows if r["feature"] == feat and r["bucket"] != "__total__"
        ]
        tot = [
            r for r in rows if r["feature"] == feat and r["bucket"] == "__total__"
        ]
        assert len(tot) == 1 and len(det) >= 2
        want = sum(
            Decimal(f"{r['contribution']:.6f}") for r in det
        )
        assert Decimal(f"{tot[0]['contribution']:.6f}") == want
        assert tot[0]["p_base"] is None and tot[0]["p_cur"] is None


# The DuckDB twin was promoted into the suite's ORACLES round 13
# (suite/mlops_q.SQL_DRIFT_REPORT) — this test keeps the end-to-end
# bit-exact pin running in pytest against the same registered SQL.


def test_suite_drift_report_duckdb_twin_bit_exact(spark):
    import duckdb

    from realtime_fraud_detection_spark.suite.mlops_q import q_drift_report

    got = [
        (r["feature"], r["bucket"], r["p_base"], r["p_cur"], r["contribution"])
        for r in q_drift_report(spark, SF_SMOKE).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    from realtime_fraud_detection_spark.suite.mlops_q import SQL_DRIFT_REPORT

    want = con.execute(SQL_DRIFT_REPORT).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g == w, (g, w)
