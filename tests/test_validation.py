"""Data-contract checks (operators/validation.check_invariants):
hand-checked violation counts and tags, null-counts-as-violation
semantics, the clean-contract empty path, and the one-scan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.validation import (
    check_invariants,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a@x.com"),
            (2, -5.0, "b@x.com"),   # breaks positive_amount
            (3, None, "c@x.com"),   # NULL amount -> breaks positive_amount
            (4, 7.5, None),         # breaks email_present
            (5, -1.0, None),        # breaks both
        ],
        "id bigint, amount double, email string",
    )


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "positive_amount": F.col("amount") > 0,
        "email_present": F.col("email").isNotNull(),
    }


def test_counts_and_tags_hand_checked(spark):
    violations, summary = check_invariants(_df(spark), _rules(), id_cols=["id"])
    assert summary == {"positive_amount": 3, "email_present": 2}
    got = {r["id"]: sorted(r["failed_rules"]) for r in violations.collect()}
    assert got == {
        2: ["positive_amount"],
        3: ["positive_amount"],
        4: ["email_present"],
        5: ["email_present", "positive_amount"],
    }


def test_clean_contract_is_empty(spark):
    df = _df(spark).filter("id = 1")
    violations, summary = check_invariants(df, _rules())
    assert summary == {"positive_amount": 0, "email_present": 0}
    assert violations.count() == 0
    assert violations.columns == ["id", "amount", "email", "failed_rules"]


def test_nullable_ok_expressed_in_rule(spark):
    rules = {"amount_ok": F.col("amount").isNull() | (F.col("amount") > 0)}
    _, summary = check_invariants(_df(spark), rules)
    assert summary == {"amount_ok": 2}  # only the two genuinely negative


def test_single_scan_plan(spark):
    """R rules evaluate in ONE scan: the violations plan contains exactly
    one relation scan (the rules are projections, not per-rule subqueries)."""
    import re

    from realtime_fraud_detection_spark.plans.explain import formatted_plan

    violations, _ = check_invariants(_df(spark), _rules(), id_cols=["id"])
    plan = formatted_plan(violations)
    assert len(re.findall(r"\(\d+\) Scan ", plan)) == 1, plan
