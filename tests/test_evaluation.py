"""Distributed binary-eval metrics (ml/evaluation.py).

Correctness strategy mirrors the repo's sketch tests: hand-computed tiny
cases, an exact brute-force pair replay (Fraction arithmetic — no float
slop), bit-exact DuckDB window-SQL parity for the integer-numerator
metrics (auc/ks), tolerance parity for the float-summed one (ap), and a
partitioning-invariance pin for the ordered AP fold.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.ml.evaluation import (
    binary_eval,
    confusion_at_thresholds,
    cumulative_gains,
    roc_auc,
)

SF = "/root/testdata/sf0.001"


def _tiny(spark):
    rows = [(0.1, 0), (0.2, 1), (0.2, 0), (0.3, 1)]
    return spark.createDataFrame(rows, "score double, label int")


def test_binary_eval_hand_computed(spark):
    r = binary_eval(_tiny(spark)).first()
    assert r["n"] == 4 and r["pos"] == 2
    # pos 0.2 beats neg 0.1, ties neg 0.2 (+0.5); pos 0.3 beats both.
    assert r["auc"] == 3.5 / 4
    assert r["ks"] == 0.5
    # desc steps: P@0.3 = 1/1 (dR=1/2), P@0.2 = 2/3 (dR=1/2)
    assert abs(r["ap"] - (0.5 * 1.0 + 0.5 * (2 / 3))) < 1e-12


def test_binary_eval_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("a", 0.5, 1), ("a", 0.7, 1), ("b", 0.5, 0)],
        "g string, score double, label int",
    )
    rows = {r["g"]: r for r in binary_eval(df, by=["g"]).collect()}
    assert rows["a"]["auc"] is None and rows["a"]["ks"] is None
    assert rows["b"]["ap"] is None
    assert rows["a"]["n"] == 2 and rows["a"]["pos"] == 2


def _pair_auc(pairs):
    """Exact O(n²) Mann-Whitney replay in Fractions."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = sum(
        Fraction(1) if p > n else Fraction(1, 2) if p == n else 0
        for p in pos
        for n in neg
    )
    return num / (len(pos) * len(neg))


def test_auc_matches_exact_pair_count_with_ties(spark):
    import random

    rng = random.Random(7)
    # coarse score grid forces heavy ties
    pairs = [
        (rng.randrange(20) / 20.0, rng.randrange(2)) for _ in range(400)
    ]
    got = roc_auc(spark.createDataFrame(pairs, "score double, label int"))
    want = _pair_auc(pairs)
    assert Fraction(got.first()["auc"]).limit_denominator(10**9) == want


def _scored_events():
    """The suite's deterministic pseudo-score/label frame, as SQL text
    usable by both engines (md5 coin, miscalibrated P(y=1|s)=s²)."""
    return """
    SELECT event_type,
           (event_id * 37) % 1000 / 1000.0 AS score,
           CASE WHEN ('0x' || substr(md5('ev:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 / 1e6
                     < ((event_id * 37) % 1000 / 1000.0) * ((event_id * 37) % 1000 / 1000.0)
                THEN 1 ELSE 0 END AS label
    FROM events
    """


_DUCK_EVAL = """
WITH scored AS ({scored}),
g AS (
  SELECT event_type, score AS s,
         SUM(label)::BIGINT AS p, SUM(1 - label)::BIGINT AS n
  FROM scored GROUP BY event_type, score
),
w AS (
  SELECT event_type, s, p, n,
         SUM(p) OVER (PARTITION BY event_type) AS ptot,
         SUM(n) OVER (PARTITION BY event_type) AS ntot,
         SUM(p) OVER (PARTITION BY event_type ORDER BY s
                      ROWS UNBOUNDED PRECEDING) AS cum_p,
         SUM(n) OVER (PARTITION BY event_type ORDER BY s
                      ROWS UNBOUNDED PRECEDING) AS cum_n
  FROM g
)
, terms AS (
  SELECT event_type, p, n, ptot, ntot, cum_p, cum_n,
         p * (2 * (cum_n - n) + n) AS auc_num,
         ABS(cum_p * ntot - cum_n * ptot) AS ks_num,
         p * (ptot - cum_p + p)::DOUBLE / (ptot + ntot - cum_p - cum_n + p + n) AS ap_term
  FROM w
)
SELECT event_type,
       SUM(auc_num)::DOUBLE / (2 * ANY_VALUE(ptot) * ANY_VALUE(ntot))::DOUBLE AS auc,
       MAX(ks_num)::DOUBLE / (ANY_VALUE(ptot) * ANY_VALUE(ntot))::DOUBLE AS ks,
       SUM(ap_term) / ANY_VALUE(ptot) AS ap
FROM terms GROUP BY event_type ORDER BY event_type
"""


def test_binary_eval_duckdb_parity(spark):
    import duckdb

    from realtime_fraud_detection_spark.functions.hashing import md5_bigint
    from realtime_fraud_detection_spark.sources.testdata import load_table

    ev = load_table(spark, SF, "events")
    score = ((F.col("event_id") * 37) % 1000) / 1000.0
    coin = (
        md5_bigint(F.col("event_id").cast("string"), "ev:") % 1_000_000
    ) / 1e6
    scored = ev.select(
        "event_type",
        score.alias("score"),
        F.when(coin < score * score, 1).otherwise(0).alias("label"),
    )
    got = {
        r["event_type"]: r
        for r in binary_eval(scored, by=["event_type"]).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.execute(
        _DUCK_EVAL.format(scored=_scored_events())
    ).fetchall()
    assert len(want) == len(got) > 0
    for et, auc, ks, ap in want:
        r = got[et]
        # integer numerators + one IEEE division: bit-exact across engines
        assert r["auc"] == auc, et
        assert r["ks"] == ks, et
        # ap sums doubles — ordered fold vs DuckDB's own order: tolerance
        assert abs(r["ap"] - ap) < 1e-9, et


def test_ap_fold_partitioning_invariant(spark):
    import random

    rng = random.Random(11)
    pairs = [
        (rng.randrange(50) / 50.0, rng.randrange(2)) for _ in range(500)
    ]
    df = spark.createDataFrame(pairs, "score double, label int")
    a = binary_eval(df.repartition(1)).first()["ap"]
    b = binary_eval(df.repartition(7)).first()["ap"]
    assert a == b  # bit-identical: the fold order is sorted, not arrival


def test_nan_and_null_scores_dropped(spark):
    base = [(0.1, 0), (0.2, 1), (0.2, 0), (0.3, 1)]
    noisy = base + [(float("nan"), 1), (None, 0)]
    df_b = spark.createDataFrame(base, "score double, label int")
    df_n = spark.createDataFrame(noisy, "score double, label int")
    assert binary_eval(df_n).first() == binary_eval(df_b).first()
    a = cumulative_gains(
        df_b.withColumn("id", F.monotonically_increasing_id()), "id", buckets=2
    ).count()
    assert a == 2


def test_confusion_at_thresholds_hand(spark):
    out = {
        r["threshold"]: r
        for r in confusion_at_thresholds(
            _tiny(spark), [0.2, 0.25]
        ).collect()
    }
    r = out[0.2]  # predicts pos for scores {0.2, 0.2, 0.3}
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 0, 1)
    assert r["precision"] == 2 / 3 and r["recall"] == 1.0
    assert r["f1"] == 4 / 5 and r["fpr"] == 0.5
    r = out[0.25]  # pos for {0.3} only; below: 0.1(n), 0.2(p), 0.2(n)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 0, 1, 2)


def test_confusion_duplicate_thresholds_not_double_counted(spark):
    a = confusion_at_thresholds(_tiny(spark), [0.2, 0.2, 0.2]).collect()
    assert len(a) == 1 and (a[0]["tp"], a[0]["fp"]) == (2, 1)


def test_confusion_zero_division_guards(spark):
    df = spark.createDataFrame(
        [(0.1, 0), (0.2, 0)], "score double, label int"
    )
    r = confusion_at_thresholds(df, [0.5]).first()
    assert r["precision"] is None and r["recall"] is None
    assert r["fpr"] == 0.0


def test_cumulative_gains(spark):
    rows = [(i, i / 100.0, 1 if i >= 80 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    out = {
        r["bucket"]: r
        for r in cumulative_gains(df, "id", buckets=10).collect()
    }
    assert len(out) == 10 and all(out[b]["n"] == 10 for b in out)
    # all 20 positives are the top two deciles
    assert out[0]["pos"] == 10 and out[1]["pos"] == 10
    assert out[0]["capture_rate"] == 0.5 and out[1]["capture_rate"] == 1.0
    assert out[0]["lift"] == 5.0
    assert out[9]["capture_rate"] == 1.0


def test_cumulative_gains_tie_break_deterministic(spark):
    rows = [(i, 0.5, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    a = sorted(map(tuple, cumulative_gains(df, "id", buckets=4).collect()))
    b = sorted(
        map(
            tuple,
            cumulative_gains(df.repartition(5), "id", buckets=4).collect(),
        )
    )
    assert a == b


def test_suite_model_eval_runs(spark):
    from realtime_fraud_detection_spark.suite import all_queries

    q = all_queries()
    assert "model_eval" in q
    rows = q["model_eval"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["auc"] <= 1.0 and 0.0 <= r["ks"] <= 1.0


@pytest.mark.parametrize("name", ["model_eval"])
def test_model_eval_inside_oracle_window(name):
    """Promoted round 12: the DuckDB twin replays the ascending-score AP
    fold (ORDER BY list aggregate + list_reduce), so the query sits in the
    driver's hash-checked first-50 window."""
    from realtime_fraud_detection_spark.suite import all_oracles, all_queries

    names = list(all_queries())
    assert names.index(name) < 50 and name in all_oracles()
