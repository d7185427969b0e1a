"""Property tests (pure Python — no Spark session) for the round-8
closed forms: LSH band planning, the RRF decimal-contribution law, and
the token-budget minimal-prefix selection model."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_fraud_detection_spark.operators.dedup import (
    lsh_collision_prob,
    lsh_plan,
)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=0.05, max_value=0.95),
    st.sampled_from([4, 8, 16, 32, 64, 128]),
)
def test_lsh_plan_is_argmin_over_factorizations(threshold, num_perm):
    bands, rows, mid = lsh_plan(threshold, num_perm)
    assert bands * rows == num_perm
    assert abs(mid - ((1.0 / bands) ** (1.0 / rows) if bands > 1 else 1.0)) < 1e-12
    for r in range(1, num_perm + 1):
        if num_perm % r:
            continue
        b = num_perm // r
        other = (1.0 / b) ** (1.0 / r) if b > 1 else 1.0
        assert abs(mid - threshold) <= abs(other - threshold) + 1e-12


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)
def test_lsh_collision_prob_monotone_in_similarity(s1, s2, bands, rows):
    lo, hi = sorted((s1, s2))
    assert lsh_collision_prob(lo, bands, rows) <= lsh_collision_prob(
        hi, bands, rows
    ) + 1e-12


Q16 = Decimal("1e-16")


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 50)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=120),
)
def test_rrf_decimal_sum_is_order_insensitive(rank_pairs, k):
    """The operator's DECIMAL(20,16) contribution quantization makes the
    fused score independent of source/partition summation order — the
    invariant the Spark groupBy relies on."""
    contribs = [
        Decimal(repr(1.0 / (k + r))).quantize(Q16, rounding=ROUND_HALF_UP)
        for r, _ in rank_pairs
    ]
    fwd = sum(contribs, Decimal(0))
    rev = sum(reversed(contribs), Decimal(0))
    assert fwd == rev


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=20000),
)
def test_token_budget_minimal_prefix_model(tokens, budget):
    """The selection law token_budget_sample implements (keep iff the
    EXCLUSIVE prefix sum is under budget) yields the minimal prefix
    reaching >= budget, or the whole list when it cannot."""
    kept, prev = [], 0
    for t in tokens:
        if prev < budget:
            kept.append(t)
        prev += t
    total = sum(kept)
    if sum(tokens) >= budget:
        assert total >= budget
        if kept:
            assert total - kept[-1] < budget  # dropping the last dips under
    else:
        assert kept == tokens


def test_round8_input_validation(spark):
    """The hardening pass: misuses raise instead of silently degrading."""
    import pytest

    from realtime_fraud_detection_spark.operators.corpus import rrf_fuse
    from realtime_fraud_detection_spark.operators.sampling import (
        token_budget_sample,
    )
    from realtime_fraud_detection_spark.operators.similarity import pca_fit
    from realtime_fraud_detection_spark.streaming.sinks import (
        budget_admission_writer,
    )

    lst = spark.createDataFrame([(1, 10, 1)], "q_id long, doc long, rank int")
    with pytest.raises(ValueError, match="unknown sources"):
        rrf_fuse({"lex": lst}, weights={"vce": 2.0})  # typo'd key
    docs = spark.createDataFrame(
        [(1, "en", 10)], "doc_id long, lang string, n_chars long"
    )
    with pytest.raises(ValueError, match="default_budget"):
        token_budget_sample(
            docs, {"en": 5}, group_col="lang", token_col="n_chars",
            id_col="doc_id", default_budget=-1,
        )
    with pytest.raises(ValueError, match="at least one group"):
        budget_admission_writer("/tmp/x", {})
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        pca_fit(empty, k=2)
