"""asof_join semantics: latest right row at-or-before each left timestamp,
LEFT-join nulls for unmatched, tolerance nulling, equal-ts matching, and
equivalence against a brute-force range-join + top-1 ground truth."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.joins import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 100.0),
            ("u1", _ts("2024-01-01 10:05:00"), 200.0),
            ("u1", _ts("2024-01-01 09:00:00"), 50.0),  # before any right row
            ("u2", _ts("2024-01-01 10:00:00"), 300.0),  # no right rows at all
        ],
        ["user_id", "ts", "amount"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 1.0),
            ("u1", _ts("2024-01-01 10:00:00"), 2.0),  # equal-ts: must match 10:00
            ("u1", _ts("2024-01-01 10:04:00"), 3.0),
        ],
        ["user_id", "ts", "score"],
    )
    return left, right


def test_asof_basic(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id")
    rows = {(r["user_id"], r["ts"]): r for r in out.collect()}
    assert len(rows) == 4
    # equal-ts right row matches
    assert rows[("u1", _ts("2024-01-01 10:00:00"))]["score_asof"] == 2.0
    assert rows[("u1", _ts("2024-01-01 10:05:00"))]["score_asof"] == 3.0
    # left row before all right rows → NULL
    assert rows[("u1", _ts("2024-01-01 09:00:00"))]["score_asof"] is None
    # key with no right rows → NULL
    assert rows[("u2", _ts("2024-01-01 10:00:00"))]["score_asof"] is None
    # matched timestamp carried through
    assert rows[("u1", _ts("2024-01-01 10:05:00"))]["ts_asof"] == _ts(
        "2024-01-01 10:04:00"
    )


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", tolerance="2 minutes")
    rows = {(r["user_id"], r["ts"]): r for r in out.collect()}
    # 10:05 ← 10:04 is within 2 min: kept
    assert rows[("u1", _ts("2024-01-01 10:05:00"))]["score_asof"] == 3.0
    # 10:00 ← 10:00 (0 min): kept
    assert rows[("u1", _ts("2024-01-01 10:00:00"))]["score_asof"] == 2.0
    out2 = asof_join(left, right, "user_id", tolerance="0 seconds")
    rows2 = {(r["user_id"], r["ts"]): r for r in out2.collect()}
    assert rows2[("u1", _ts("2024-01-01 10:05:00"))]["score_asof"] is None
    assert rows2[("u1", _ts("2024-01-01 10:00:00"))]["score_asof"] == 2.0


def test_asof_matches_bruteforce_range_join(spark):
    """Property check on generated data: the windowed form equals the naive
    range-join + row_number()==1 definition."""
    import random

    rng = random.Random(7)
    base = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame(
        [
            (f"u{rng.randrange(6)}", base + datetime.timedelta(seconds=rng.randrange(86400)), float(i))
            for i in range(300)
        ],
        ["k", "ts", "v"],
    )
    right = spark.createDataFrame(
        [
            (f"u{rng.randrange(6)}", base + datetime.timedelta(seconds=rng.randrange(86400)), float(1000 + i))
            for i in range(200)
        ],
        ["k", "ts", "p"],
    ).dropDuplicates(["k", "ts"])

    got = asof_join(left, right, "k").select("k", "ts", "v", "p_asof")

    l, r = left.alias("l"), right.alias("r")
    ranked = (
        l.join(r, (F.col("l.k") == F.col("r.k")) & (F.col("r.ts") <= F.col("l.ts")), "left")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("l.k", "l.ts", "l.v").orderBy(F.col("r.ts").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(F.col("l.k").alias("k"), F.col("l.ts").alias("ts"), "v", F.col("r.p").alias("p_asof"))
    )
    assert got.exceptAll(ranked).count() == 0
    assert ranked.exceptAll(got).count() == 0


def test_asof_plan_is_single_window_not_range_join(spark):
    """The plan must be window-over-union (one shuffle), not a nested-loop
    or theta join."""
    left, right = _frames(spark)
    plan = asof_join(left, right, "user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_asof_forward_direction(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", direction="forward")
    rows = {(r["user_id"], r["ts"]): r for r in out.collect()}
    # 09:00 → earliest right at-or-after is 09:30
    assert rows[("u1", _ts("2024-01-01 09:00:00"))]["score_asof"] == 1.0
    # equal-ts still matches (10:00 → 10:00)
    assert rows[("u1", _ts("2024-01-01 10:00:00"))]["score_asof"] == 2.0
    # 10:05 has no right at-or-after → NULL
    assert rows[("u1", _ts("2024-01-01 10:05:00"))]["score_asof"] is None
    assert rows[("u2", _ts("2024-01-01 10:00:00"))]["score_asof"] is None
    # forward tolerance: 09:00 → 09:30 is outside 10 minutes
    out2 = asof_join(
        left, right, "user_id", direction="forward", tolerance="10 minutes"
    )
    rows2 = {(r["user_id"], r["ts"]): r for r in out2.collect()}
    assert rows2[("u1", _ts("2024-01-01 09:00:00"))]["score_asof"] is None
    assert rows2[("u1", _ts("2024-01-01 10:00:00"))]["score_asof"] == 2.0


def test_asof_forward_matches_bruteforce(spark):
    import random

    rng = random.Random(13)
    base = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame(
        [
            (f"u{rng.randrange(5)}", base + datetime.timedelta(seconds=rng.randrange(86400)), float(i))
            for i in range(200)
        ],
        ["k", "ts", "v"],
    )
    right = spark.createDataFrame(
        [
            (f"u{rng.randrange(5)}", base + datetime.timedelta(seconds=rng.randrange(86400)), float(1000 + i))
            for i in range(150)
        ],
        ["k", "ts", "p"],
    ).dropDuplicates(["k", "ts"])
    got = asof_join(left, right, "k", direction="forward").select("k", "ts", "v", "p_asof")
    l, r = left.alias("l"), right.alias("r")
    ranked = (
        l.join(r, (F.col("l.k") == F.col("r.k")) & (F.col("r.ts") >= F.col("l.ts")), "left")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("l.k", "l.ts", "l.v").orderBy(F.col("r.ts").asc_nulls_last())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(F.col("l.k").alias("k"), F.col("l.ts").alias("ts"), "v", F.col("r.p").alias("p_asof"))
    )
    assert got.exceptAll(ranked).count() == 0
    assert ranked.exceptAll(got).count() == 0


def test_asof_tie_break_min_wins(spark):
    """Duplicate right rows at the same (key, ts): the SMALLEST tie-break
    value wins (min-wins, the repo-wide deterministic-tie convention)."""
    left = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:05:00"), 1.0)], ["user_id", "ts", "amount"]
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 9.0),
            ("u1", _ts("2024-01-01 10:00:00"), 2.0),
            ("u1", _ts("2024-01-01 10:00:00"), 5.0),
        ],
        ["user_id", "ts", "score"],
    )
    out = asof_join(left, right, "user_id", tie_break=["score"]).collect()
    assert len(out) == 1 and out[0]["score_asof"] == 2.0
    # forward direction honors the same convention
    left_f = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), 1.0)], ["user_id", "ts", "amount"]
    )
    out_f = asof_join(
        left_f, right, "user_id", tie_break=["score"], direction="forward"
    ).collect()
    assert len(out_f) == 1 and out_f[0]["score_asof"] == 2.0
