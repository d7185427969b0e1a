"""Property-based tests (hypothesis): randomized event sets checked against
brute-force pandas re-implementations — the SURVEY §5(c) strategy applied to
the trickiest semantics (rolling ranges with ties, session merging,
minhash containment)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=7200),  # seconds offset
        st.integers(min_value=1, max_value=10000),  # cents
    ),
    min_size=1,
    max_size=60,
)


def _to_pdf(events):
    base = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        {
            "user_id": [f"u{u}" for u, _, _ in events],
            "transaction_id": [f"t{i:03d}" for i in range(len(events))],
            "ts": [base + pd.Timedelta(seconds=s) for _, s, _ in events],
            "amount": [c / 100.0 for _, _, c in events],
        }
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_rolling_range_matches_bruteforce(spark, events):
    """rolling_ranges (1h frame) == O(n²) pandas brute force, ties included."""
    from realtime_fraud_detection_spark.operators.windows import rolling_ranges

    pdf = _to_pdf(events)
    out = (
        rolling_ranges(spark.createDataFrame(pdf), "user_id", "ts", "amount", {"r1h": 3600})
        .select("transaction_id", "r1h_count", "r1h_amount")
        .toPandas()
        .set_index("transaction_id")
        .sort_index()
    )
    for i, row in pdf.iterrows():
        mask = (
            (pdf["user_id"] == row["user_id"])
            & (pdf["ts"] >= row["ts"] - pd.Timedelta(hours=1))
            & (pdf["ts"] <= row["ts"])
        )
        tid = row["transaction_id"]
        assert out.loc[tid, "r1h_count"] == mask.sum()
        assert abs(out.loc[tid, "r1h_amount"] - round(pdf[mask]["amount"].sum(), 2)) < 1e-9


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_session_windows_match_bruteforce(spark, events):
    """session_aggregate == pandas gaps-and-islands (30-min gap)."""
    from realtime_fraud_detection_spark.operators.aggregations import session_aggregate

    pdf = _to_pdf(events)
    got = (
        session_aggregate(spark.createDataFrame(pdf), "user_id", "ts", "amount", "30 minutes")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    expected_rows = []
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        start = prev = None
        cnt = 0
        for ts in g["ts"]:
            if prev is None or (ts - prev) > pd.Timedelta(minutes=30):
                if prev is not None:
                    expected_rows.append((uid, start, cnt))
                start, cnt = ts, 0
            cnt += 1
            prev = ts
        expected_rows.append((uid, start, cnt))
    want = pd.DataFrame(expected_rows, columns=["user_id", "session_start", "event_count"]).sort_values(
        ["user_id", "session_start"]
    ).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["user_id"] == want["user_id"]).all()
    assert (got["event_count"] == want["event_count"]).all()
    assert (got["session_start"] == want["session_start"]).all()


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.text(alphabet="abcd ", min_size=10, max_size=40), min_size=2, max_size=6)
)
def test_exact_dedup_identical_texts_always_group(spark, texts):
    """Duplicating any document must merge its fingerprint group."""
    from realtime_fraud_detection_spark.functions.text import fingerprint
    from realtime_fraud_detection_spark.operators.dedup import exact_dedup

    docs = texts + [texts[0]]  # guaranteed duplicate of doc 0
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = exact_dedup(spark.createDataFrame(pdf), fingerprint(F.col("text")), "doc_id").toPandas()
    assert out["dup_count"].sum() == len(docs)
    # the duplicated text's group has ≥2 members and survivor id 0
    import re

    norm = re.sub(r"[^a-z0-9]+", " ", texts[0].lower()).strip()
    joined = out[out["dup_count"] >= 2]
    assert any(joined["survivor_id"] == 0) or norm == ""


# ---------------------------------------------------------------------------
# Round-4 operators: duplicate spans and token-frequency stats vs brute force
# ---------------------------------------------------------------------------

corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc"]),  # tiny vocab -> dense collisions
        min_size=0,
        max_size=14,
    ),
    min_size=1,
    max_size=8,
)


def _spans_bruteforce(docs_tokens, k, min_count=2):
    from collections import Counter

    grams, cnt = {}, Counter()
    for d, toks in docs_tokens.items():
        g = (
            [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else []
        )
        grams[d] = g
        cnt.update(g)
    out = set()
    for d, g in grams.items():
        dup_pos = [i for i, s in enumerate(g) if cnt[s] >= min_count]
        group = []
        for p in dup_pos:
            if group and p - group[-1] >= k:
                out.add((d, group[0], group[-1] + k - 1, len(group)))
                group = []
            group.append(p)
        if group:
            out.add((d, group[0], group[-1] + k - 1, len(group)))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_duplicate_spans_match_bruteforce(spark, corpus):
    """duplicate_spans (k=3) == O(n·corpus) python reference on random
    small-vocab corpora (dense gram collisions exercise island merging;
    md5 on 60 bits cannot collide distinct 3-grams of this vocab)."""
    from realtime_fraud_detection_spark.operators.spans import duplicate_spans

    docs_tokens = {i: toks for i, toks in enumerate(corpus)}
    pdf = pd.DataFrame(
        {"doc_id": list(docs_tokens), "text": [" ".join(t) for t in docs_tokens.values()]}
    )
    got = {
        (r["doc"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in duplicate_spans(
            spark.createDataFrame(pdf), "text", "doc_id", k=3
        ).collect()
    }
    assert got == _spans_bruteforce(docs_tokens, k=3)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_token_frequency_stats_match_bruteforce(spark, corpus):
    """token_frequency_stats == Counter brute force, including the exact
    floor-based 6dp rounding (identical IEEE expression in python)."""
    import math
    from collections import Counter

    from realtime_fraud_detection_spark.operators.quality import token_frequency_stats

    # empty docs normalize to one '' token in both the operator and here
    docs_tokens = {i: (toks if toks else [""]) for i, toks in enumerate(corpus)}
    pdf = pd.DataFrame(
        {"doc_id": list(docs_tokens), "text": [" ".join(t) for t in docs_tokens.values()]}
    )
    tf = Counter(t for toks in docs_tokens.values() for t in toks)
    got = {
        r["doc"]: r.asDict()
        for r in token_frequency_stats(spark.createDataFrame(pdf)).collect()
    }
    assert set(got) == set(docs_tokens)
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    for d, toks in docs_tokens.items():
        n = len(toks)
        assert got[d]["n_tokens"] == n
        assert got[d]["n_distinct_tokens"] == len(set(toks))
        assert got[d]["mean_token_tf"] == r6(sum(tf[t] for t in toks) / n)
        assert got[d]["hapax_frac"] == r6(sum(tf[t] == 1 for t in toks) / n)
        assert got[d]["rare_frac"] == r6(sum(tf[t] <= 2 for t in toks) / n)
