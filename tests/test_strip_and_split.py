"""strip_boilerplate_lines (cross-doc line removal) and split_by_hash
(deterministic named splits): hand-built corpora with known answers plus
disjoint/exhaustive/reproducible invariants on the fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.quality import (
    strip_boilerplate_lines,
)
from realtime_fraud_detection_spark.operators.sampling import split_by_hash
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE

DOCS = [
    (1, "COMPANY FOOTER\nunique first line\nshared middle\nCOMPANY FOOTER"),
    (2, "another unique line\nshared middle\nCOMPANY FOOTER"),
    (3, "totally original document\nwith its own lines"),
    (4, ""),  # empty doc must survive with empty text
]


def test_strip_removes_cross_doc_lines_keeps_order(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc"]: r for r in strip_boilerplate_lines(df, min_docs=2).collect()}
    # FOOTER is in docs 1+2 (distinct docs >= 2); "shared middle" too.
    # Doc 1's duplicate FOOTER counts once for df but both copies go.
    assert out[1]["stripped_text"] == "unique first line"
    assert out[1]["n_lines_removed"] == 3
    assert out[2]["stripped_text"] == "another unique line"
    assert out[2]["n_lines_removed"] == 2
    assert out[3]["stripped_text"] == "totally original document\nwith its own lines"
    assert out[3]["n_lines_removed"] == 0
    assert out[4]["stripped_text"] == "" and out[4]["n_lines_removed"] == 0
    assert set(out) == {1, 2, 3, 4}  # no rows lost


def test_strip_consistent_with_stats_signal(spark):
    from realtime_fraud_detection_spark.operators.quality import (
        boilerplate_line_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    stats = {
        r["doc"]: r["n_boiler_lines"]
        for r in boilerplate_line_stats(docs, "text", "doc_id", min_docs=2).collect()
    }
    stripped = {
        r["doc"]: r["n_lines_removed"]
        for r in strip_boilerplate_lines(docs, min_docs=2).collect()
    }
    for d, n in stats.items():
        # stats counts occurrences of boilerplate lines per doc — exactly
        # what the transform removes
        assert stripped[d] == n, d


def test_split_disjoint_exhaustive_reproducible(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    splits = split_by_hash(docs, "doc_id", w)
    ids = {k: {r["doc_id"] for r in v.select("doc_id").collect()} for k, v in splits.items()}
    n = docs.count()
    assert sum(len(v) for v in ids.values()) == n  # exhaustive
    assert not (ids["train"] & ids["val"]) and not (ids["train"] & ids["test"])
    assert not (ids["val"] & ids["test"])  # disjoint
    again = split_by_hash(docs, "doc_id", w)
    assert {r["doc_id"] for r in again["val"].collect()} == ids["val"]
    # rough proportions (md5-uniform: binomial tolerance)
    assert abs(len(ids["train"]) / n - 0.8) < 0.08


def test_split_weights_must_sum_to_one(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        split_by_hash(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_shuffled_packing_reproducible_and_epoch_varying(spark):
    """shuffle_rank gives pack_sequences a reproducible pseudo-random
    training order: identical across reruns, different across epochs,
    token-budget invariants intact."""
    from realtime_fraud_detection_spark.operators.sampling import (
        pack_sequences,
        shuffle_rank,
    )

    docs = load_table(spark, SF_SMOKE, "documents").selectExpr(
        "doc_id", "greatest(1, n_chars) AS toks"
    )

    def run(epoch):
        return {
            r["doc_id"]: (r["seq_id"], r["offset"])
            for r in pack_sequences(
                docs, "doc_id", "toks", budget=2000,
                order_col=shuffle_rank("doc_id", epoch=epoch),
            ).collect()
        }

    e0, e0b, e1 = run(0), run(0), run(1)
    assert e0 == e0b  # reproducible
    assert e0 != e1  # epoch redraws the permutation
    # shuffled order really differs from id order
    plain = {
        r["doc_id"]: r["offset"]
        for r in pack_sequences(docs, "doc_id", "toks", budget=2000).collect()
    }
    assert any(plain[d] != e0[d][1] for d in plain)
    # offsets are a valid packing: sorted by offset, each doc's offset is
    # the sum of preceding token counts
    toks = {r["doc_id"]: r["toks"] for r in docs.collect()}
    order = sorted(e0, key=lambda d: e0[d][1])
    run_total = 0
    for d in order:
        assert e0[d][1] == run_total
        assert e0[d][0] == run_total // 2000
        run_total += toks[d]


def test_temperature_fractions_flatten_distribution(spark):
    """α<1 upweights rare strata: the sampled mixture must sit between
    the natural distribution and uniform, totals near target."""
    from realtime_fraud_detection_spark.operators.sampling import (
        stratified_sample,
        temperature_fractions,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    natural = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(natural.values())
    fr = temperature_fractions(docs, "lang", alpha=0.3, target_rows=total // 2)
    assert set(fr) == set(natural) and all(0 < f <= 1.0 for f in fr.values())
    kept = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, "doc_id", "lang", fr)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept_total = sum(kept.values())
    assert abs(kept_total - total // 2) < 0.15 * total  # hash-sampling noise
    # flattening: rare strata keep a LARGER share than natural, dominant
    # strata a smaller one
    rare = min(natural, key=natural.get)
    dom = max(natural, key=natural.get)
    assert kept[rare] / kept_total > natural[rare] / total
    assert kept[dom] / kept_total < natural[dom] / total
    # α=1 must reproduce the natural mixture exactly (fraction constant)
    fr1 = temperature_fractions(docs, "lang", alpha=1.0, target_rows=total // 2)
    vals = list(fr1.values())
    assert all(abs(v - vals[0]) < 1e-12 for v in vals)


def test_temperature_fraction_properties():
    """Pure-form properties for ANY stratum histogram (no Spark):
    fractions in (0,1]; α<1 gives smaller strata >= fractions (f ∝
    n^(α−1)); α=1 is a constant fraction; uncapped expected rows hit the
    target exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from realtime_fraud_detection_spark.operators.sampling import (
        temperature_fractions_from_counts,
    )

    hist = st.dictionaries(
        st.text("abc", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=8,
    )

    @given(hist, st.floats(min_value=0.1, max_value=0.99))
    @settings(max_examples=300, deadline=None)
    def check(counts, alpha):
        total = sum(counts.values())
        fr = temperature_fractions_from_counts(counts, alpha, total // 2 or 1)
        assert set(fr) == set(counts)
        assert all(0 < f <= 1.0 for f in fr.values())
        for a in counts:
            for b in counts:
                if counts[a] < counts[b]:
                    assert fr[a] >= fr[b] - 1e-12
        if all(f < 1.0 for f in fr.values()):  # cap not binding anywhere
            expected = sum(fr[s] * counts[s] for s in counts)
            assert expected == pytest.approx(total // 2 or 1, rel=1e-9)

    check()


def test_strip_preserves_clean_docs_byte_identical(spark):
    """A doc with no boilerplate must round-trip UNCHANGED — blank lines,
    indentation, and trailing whitespace intact (the strip keys boiler
    identity on trim(line) but reassembles the original lines); and blank
    lines are never boilerplate candidates even though every doc has
    them."""
    docs = [
        (1, "  indented poem\n\nsecond stanza  \n\nSHARED FOOTER"),
        (2, "other text\n\n\nmore text\nSHARED FOOTER"),
        (3, "alone\n\ttab line\n   \nend."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc"]: r for r in strip_boilerplate_lines(df, min_docs=2).collect()}
    # footer removed, everything else byte-identical (blanks kept)
    assert out[1]["stripped_text"] == "  indented poem\n\nsecond stanza  \n"
    assert out[1]["n_lines_removed"] == 1
    assert out[2]["stripped_text"] == "other text\n\n\nmore text"
    assert out[2]["n_lines_removed"] == 1
    # doc 3 shares only blank-ish lines -> fully unchanged
    assert out[3]["stripped_text"] == docs[2][1]
    assert out[3]["n_lines_removed"] == 0
