"""Composed corpus curation (operators/curation.py): funnel monotonicity,
stage flags, deterministic survivors, equivalence of each stage with its
standalone operator, and the lazy (report=False) path."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.curation import clean_corpus
from realtime_fraud_detection_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents", fan_out=True)


def test_funnel_monotone_and_stages_present(spark):
    docs = _docs(spark)
    # c4 off: the synthetic fixture has no sentence-final punctuation, so
    # the C4 page rule (correctly) removes every doc — exercised on a
    # punctuated corpus in test_c4_gate_applies below
    out, funnel = clean_corpus(docs, c4=False, near_dup=True)
    stages = list(funnel)
    assert stages == ["input", "quality_gate", "gopher_gate",
                      "exact_dedup", "near_dup"]
    vals = list(funnel.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))  # gates only remove
    assert funnel["input"] == docs.count()
    assert funnel["near_dup"] > 0
    assert out.count() == funnel["near_dup"]
    assert out.columns == docs.columns


def test_flags_disable_stages(spark):
    docs = _docs(spark)
    _, funnel = clean_corpus(docs, gopher=False, c4=False)
    assert list(funnel) == ["input", "quality_gate", "exact_dedup"]


def test_matches_standalone_operators(spark):
    """The composition must equal applying the operators by hand."""
    from realtime_fraud_detection_spark.functions.text import (
        fingerprint,
        quality_score,
    )
    from realtime_fraud_detection_spark.operators import quality as Q

    docs = _docs(spark)
    out, _ = clean_corpus(docs, c4=False, near_dup=False)

    manual = docs.filter(quality_score(F.col("text")) >= 0.3)
    rep = Q.repetition_stats(manual)
    manual = manual.join(
        rep.filter(Q.gopher_repetition_pass(rep)).select("doc_id"),
        "doc_id", "left_semi",
    )
    fp = manual.select("doc_id", fingerprint(F.col("text")).alias("f"))
    keep = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    manual = manual.join(keep, "doc_id", "left_semi")

    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {
        r["doc_id"] for r in manual.select("doc_id").collect()
    }


def test_lazy_path_no_counts(spark):
    docs = _docs(spark)
    out, funnel = clean_corpus(docs, c4=False, report=False)
    assert funnel == {}
    assert out.count() > 0  # single action, plan built fully lazily


def test_boilerplate_strip_stage(spark):
    docs = spark.createDataFrame(
        [(1, "COMMON FOOTER\nlong unique sentence about streams here."),
         (2, "COMMON FOOTER\nanother long unique sentence about state."),
         (3, "a third long unique sentence, original through and through.")],
        "doc_id long, text string",
    )
    out, funnel = clean_corpus(
        docs, min_quality=0.0, gopher=False, c4=False,
        strip_boilerplate=True,
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "COMMON FOOTER" not in texts[1] and "COMMON FOOTER" not in texts[2]
    assert "original" in texts[3]
    assert funnel["boilerplate_strip"] == 3  # stripping never drops docs


def test_c4_gate_applies(spark):
    good = "this is a proper sentence with enough words in it.\n" * 4
    docs = spark.createDataFrame(
        [(1, good), (2, "word salad lines no punctuation at all\nmore salad")],
        "doc_id long, text string",
    )
    out, funnel = clean_corpus(docs, min_quality=0.0, gopher=False)
    assert funnel["c4_gate"] == 1
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_incremental_curation_via_corpus_diff(spark):
    """The incremental release flow: diff v2 against v1, re-curate ONLY
    added/changed docs, and splice them with v1's still-valid survivors —
    result must equal curating v2 from scratch (same gates, same
    deterministic survivor rule, no cross-doc stage enabled)."""
    from realtime_fraud_detection_spark.operators.corpus import corpus_diff

    v1 = _docs(spark)
    # v2: drop 20 docs, mutate 10, add 5 new
    v2 = (
        v1.filter("doc_id >= 20")
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") < 30, F.concat(F.col("text"), F.lit(" extra tail words"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            v1.limit(5).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
    ).localCheckpoint()

    full, _ = clean_corpus(v2, c4=False, report=False)

    diff = corpus_diff(v1, v2)
    dirty = v2.join(
        diff.filter(F.col("status").isin("added", "changed")).select(
            F.col("doc").alias("doc_id")
        ),
        "doc_id", "left_semi",
    )
    clean_v1, _ = clean_corpus(v1, c4=False, report=False)
    keep_old = clean_v1.join(
        diff.filter(F.col("status") == "unchanged").select(F.col("doc").alias("doc_id")),
        "doc_id", "left_semi",
    )
    clean_dirty, _ = clean_corpus(dirty, c4=False, report=False)
    # the cross-slice step that makes incremental dedup correct: a dirty
    # doc whose fingerprint already lives in the kept corpus is a dup of
    # a surviving doc (the added docs here are copies of unchanged ones)
    # — same new-vs-corpus probe shape as minhash_lsh_candidates_incremental
    from realtime_fraud_detection_spark.functions.text import fingerprint

    clean_dirty = clean_dirty.join(
        keep_old.select(fingerprint(F.col("text")).alias("_fp")).distinct(),
        fingerprint(F.col("text")) == F.col("_fp"),
        "left_anti",
    )
    incremental = keep_old.unionByName(clean_dirty)

    assert {r["doc_id"] for r in incremental.select("doc_id").collect()} == {
        r["doc_id"] for r in full.select("doc_id").collect()
    }


def test_bucket_cap_passthrough(spark):
    """max_bucket_size reaches the near-dup pair generator: a huge cap is
    a no-op (same survivors as uncapped); a cap of 1 suppresses every
    band bucket, so no pairs form and near_dup removes nothing."""
    docs = _docs(spark)
    base, f_base = clean_corpus(docs, c4=False, near_dup=True)
    huge, f_huge = clean_corpus(
        docs, c4=False, near_dup=True, max_bucket_size=10_000_000
    )
    assert f_huge["near_dup"] == f_base["near_dup"]
    _, f_one = clean_corpus(docs, c4=False, near_dup=True, max_bucket_size=1)
    assert f_one["near_dup"] == f_one["exact_dedup"]


def test_cell_balanced_sample_budget_law(spark):
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.curation import (
        cell_balanced_sample,
    )
    from realtime_fraud_detection_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    total, cells = 40_000, 8
    picked = cell_balanced_sample(docs, emb, total, n_cells=cells)
    rows = picked.select("doc_id", "cell", "n_chars").collect()
    assert rows and all(0 <= r["cell"] < cells for r in rows)
    assert len({r["doc_id"] for r in rows}) == len(rows)  # no duplicates

    # per-cell mass: either reached the cell budget (minimal prefix) or
    # the cell was exhausted
    per_cell_budget = total // cells
    sel_mass: dict = {}
    for r in rows:
        sel_mass[r["cell"]] = sel_mass.get(r["cell"], 0) + r["n_chars"]
    # recompute each cell's total corpus mass via the same assignment
    from realtime_fraud_detection_spark.operators.similarity import (
        fit_coarse_quantizer,
    )

    _, cells_df = fit_coarse_quantizer(emb, cells)
    corpus_mass = {
        r["cell"]: r["m"]
        for r in docs.join(
            cells_df.select(F.col("nid").alias("doc_id"), "cell"), "doc_id"
        )
        .groupBy("cell")
        .agg(F.sum("n_chars").alias("m"))
        .collect()
    }
    for c, m in sel_mass.items():
        assert m >= per_cell_budget or m == corpus_mass[c], (c, m)

    # determinism: same inputs -> identical selection
    again = {
        (r["doc_id"], r["cell"])
        for r in cell_balanced_sample(docs, emb, total, n_cells=cells)
        .select("doc_id", "cell")
        .collect()
    }
    assert again == {(r["doc_id"], r["cell"]) for r in rows}


def test_dsir_selects_target_like_documents(spark):
    """DSIR (Xie et al. \'23): raw = generic fixture docs + a 100-doc
    domain slice with its own vocabulary; target = a DISJOINT sample of
    the same domain. Weights must rank domain docs first and the sampled
    selection must be dominated by them. (The fixture\'s lang column is
    metadata only — every lang shares one vocabulary — so the domain
    corpus is constructed, not taken from lang.)"""
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.curation import (
        dsir_select,
        dsir_weights,
    )
    from realtime_fraud_detection_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    vocab = [
        "dosage", "clinical", "trial", "patient", "symptom", "therapy",
        "diagnosis", "oncology", "biopsy", "remission", "protocol", "cohort",
    ]

    def domain_text(seed: int) -> str:
        return " ".join(vocab[(seed + j) % len(vocab)] for j in range(30))

    generic = (
        load_table(spark, SF_SMOKE, "documents", fan_out=True)
        .select("doc_id", "text")
        .limit(400)
    )
    domain_raw = spark.createDataFrame(
        [(1_000_000 + i, domain_text(i)) for i in range(100)],
        "doc_id bigint, text string",
    )
    raw = generic.unionByName(domain_raw)
    target = spark.createDataFrame(
        [(domain_text(i + 7),) for i in range(50)], "text string"
    )

    w = dsir_weights(raw, target)
    rows = {r["doc_id"]: r["dsir_logw"] for r in w.collect()}
    dom = [v for d, v in rows.items() if d >= 1_000_000]
    gen = [v for d, v in rows.items() if d < 1_000_000]
    assert min(dom) > max(gen)  # clean separation by construction

    picked = dsir_select(raw, target, k=50)
    ids = [r["doc_id"] for r in picked.collect()]
    assert len(ids) == 50
    dom_rate = sum(1 for d in ids if d >= 1_000_000) / len(ids)
    assert dom_rate >= 0.9, dom_rate

    again = [r["doc_id"] for r in dsir_select(raw, target, k=50).collect()]
    assert set(again) == set(ids)


def test_corpus_report_hand_checked(spark):
    from realtime_fraud_detection_spark.operators.curation import (
        corpus_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en"),
            (2, "alpha beta gamma", "en"),  # exact dup of 1
            (3, "uno dos tres cuatro", "es"),
            (4, "cinq six sept", "fr"),
        ],
        "doc_id bigint, text string, lang string",
    )
    report, breakdown = corpus_report(docs)
    assert report["n_docs"] == 4
    assert report["total_tokens"] == 3 + 3 + 4 + 3
    assert report["total_chars"] == sum(
        len(t) for t in ("alpha beta gamma",) * 2
        + ("uno dos tres cuatro", "cinq six sept")
    )
    assert report["exact_dup_rate"] == 0.25  # 3 distinct fingerprints / 4
    rows = {r["lang"]: r for r in breakdown.collect()}
    assert rows["en"]["n_docs"] == 2 and rows["en"]["exact_dup_rate"] == 0.5
    assert rows["es"]["exact_dup_rate"] == 0.0

    # no lang column -> breakdown omitted, report intact
    r2, b2 = corpus_report(docs.drop("lang"))
    assert b2 is None and r2["n_docs"] == 4


def test_corpus_report_on_fixture(spark):
    from realtime_fraud_detection_spark.operators.curation import (
        corpus_report,
    )
    from realtime_fraud_detection_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    report, breakdown = corpus_report(docs)
    assert report["n_docs"] == docs.count()
    assert 0.0 <= report["exact_dup_rate"] < 1.0
    assert report["tokens_p50"] <= report["tokens_p95"]
    assert 0.0 <= report["quality_p10"] <= report["quality_p90"] <= 1.0
    assert breakdown.count() == docs.select("lang").distinct().count()
