#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (no driver-side
collect — we measure the engine, not py4j serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the shapes that are
# expensive at scale (wide aggs, multi-join, sliding windows, LSH dedup, ANN).
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "profile_enrich",
    "rolling_profile",
    "velocity_sliding",
    "velocity_sliding_approx",
    "hourly_type_stats",
    "user_sessions",
    "pattern_buckets",
    "rule_score",
    "ensemble_decision",
    "asof_join",
    "gap_fill",
    "text_features",
    "doc_fingerprint",
    "minhash_signature",
    "lsh_near_dups",
    "simhash",
    "simhash_pairs",
    "dedup_clusters",
    "quality_filters",
    "sample_pack",
    "doc_chunks",
    "duplicate_spans",
    "bm25_search",
    "ngram_lm",
    "bpe_tokens",
    "embedding_near_dups",
    "ann_topk",
    "ann_int8",
    "sketch_rollup",
    # round-5: previously unbenched families (regressions were invisible)
    "ann_lsh",
    "ann_ivf",
    "semantic_dedup",
    "text_classifier",
    "pagerank",
    # round-5 new families
    "ann_pq",
    "triangles",
    "unigram_tokens",
    # round-6: the PQ serve path (loads the persisted index; medians 3
    # runs so the one-time cold build doesn't read as the serve cost) and
    # the composed indexes (IVF over SQ8, residual IVF,PQ)
    "ann_pq_serve",
    "ann_ivf_int8",
    "ann_pq_res",
    # round-6: dimension maintenance (changelog compaction + SCD2 +
    # versioned as-of enrichment in one query)
    "scd2_enrich",
    # round-6: DDSketch percentile rollups (quantile dual of sketch_rollup)
    # + Misra–Gries heavy-hitter rollups — the stored-partials sketch family
    "quantile_rollup",
    "heavy_hitters",
    # round-6: isotonic score calibration (fit + reliability table)
    "score_calibration",
    # round-6: LPA communities (density structure vs CC connectivity)
    "communities",
    # round-7: persisted-LM broadcast scoring (CCNet serve topology —
    # the recurring cost of ngram_lm's build+score; medians 3 runs so
    # the one-time LM build doesn't read as the serve cost)
    "ngram_lm_serve",
]

# Iterative queries (CC / power-iteration loops) have documented ±2 s
# run-to-run noise on local[32] (SCALE.md) — a single run cannot
# distinguish noise from regression, so these record the MEDIAN of 3
# trials within the same session.
ITERATIVE = {
    "dedup_clusters",
    "pagerank",
    "semantic_dedup",
    "ann_pq_serve",
    "communities",
    "ngram_lm_serve",
}


def _velocity_sliding_approx(spark, sf_dir):
    """The scale form of velocity_sliding: approx_count_distinct (HLL) in
    place of the exact-NDV Expand + two-phase distinct — SCALE.md documents
    when to flip `exact`; this entry keeps the measured gap in BENCH."""
    from realtime_fraud_detection_spark.operators import aggregations as A
    from realtime_fraud_detection_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    return A.velocity_windows(
        ev, "user_id", "ts", "value", ndv_col="event_type",
        size="5 minutes", slide="1 minute", exact=False,
    )


# bench-only variants without a driver-suite entry (approximate results
# can't hash-match a DuckDB oracle; the exact forms above are the gate)
EXTRA = {"velocity_sliding_approx": _velocity_sliding_approx}


def _previous_bench() -> dict[str, float]:
    """Per-query timings from the newest BENCH_r*.json next to this file
    (or $SPARK_GRAFT_BENCH_BASELINE) — the comparison base for the
    mover re-measure rule. Missing/garbled history just disables it."""
    import glob

    path = os.environ.get("SPARK_GRAFT_BENCH_BASELINE")
    if not path:
        hist = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        path = hist[-1] if hist else None
    if not path or not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            doc = json.load(f)
        q = doc.get("parsed", doc).get("queries") or {}
        return {k: float(v) for k, v in q.items()}
    except Exception:
        return {}


def _quiet_benign_accumulator_errors(spark) -> None:
    """Straggler tasks of a localCheckpoint'd stage can complete after the
    ContextCleaner has already unregistered the stage's accumulators, and
    the DAGScheduler logs each as `ERROR ... Failed to update accumulator
    (Unknown class)` — a benign race (the job already succeeded; nothing
    is lost). Quiet that logger to FATAL for the bench process so the
    artifact tail is unambiguous: REAL failures still reach the "errors"
    dict via the per-query try/except, which does not depend on logging."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:
        pass  # logging cosmetics must never fail the bench


def main() -> None:
    from realtime_fraud_detection_spark.session import get_spark
    from realtime_fraud_detection_spark.suite import all_queries

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    _quiet_benign_accumulator_errors(spark)
    qs = all_queries()

    # warmup: JIT + codegen + parquet footer caches on a tiny query
    qs["pricing_summary"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # Per-query fault isolation: one broken query must not zero the whole
    # bench artifact (round 2 lost its BENCH file to a single loader
    # exception). Failures land in "errors" and the process still exits 0
    # with timings for everything that ran.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs.get(name) or EXTRA[name]
        trials = 3 if name in ITERATIVE else 1
        runs: list[float] = []
        try:
            for _ in range(trials):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            timings[name] = sorted(runs)[len(runs) // 2]  # median
        except Exception as exc:  # noqa: BLE001 — report, keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # Mover re-measure rule (round-6 verdict): a single sample cannot
    # distinguish the documented planning/codegen noise band from real
    # drift, so any single-trial query that moved >20% vs the previous
    # recorded bench is re-run twice more in the SAME session and the
    # median of all three is kept, annotated under "remeasured".
    #
    # Exception: a query whose OUTPUT is itself a session-cached frame
    # (q_simhash returns the shared signature table) re-runs as a pure
    # block read — keeping that median would record ~0s for a query that
    # really costs a corpus hash. Keep the first (real) sample there.
    SESSION_CACHED_OUTPUT = {"simhash"}
    prev = _previous_bench()
    remeasured: dict[str, dict[str, float]] = {}
    for name, first in list(timings.items()):
        base = prev.get(name)
        if (
            name in ITERATIVE
            or name in SESSION_CACHED_OUTPUT
            or not base
            or abs(first - base) / base <= 0.20
        ):
            continue
        fn = qs.get(name) or EXTRA[name]
        runs = [first]
        try:
            for _ in range(2):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
        except Exception:  # keep the first sample if a re-run dies
            pass
        kept = sorted(runs)[len(runs) // 2]
        timings[name] = kept
        remeasured[name] = {"first": first, "kept": kept, "prev": base}

    # end-to-end streaming throughput — the one number directly comparable
    # to the reference's published claim (BASELINE.md: 15,000 TPS sustained
    # on its 12-container stack). Same fault isolation as the queries; the
    # full-size solo measurement lives in tools/bench_streaming.py /
    # BENCH_STREAMING.json, this inline run is sized to ~15 s.
    streaming: dict | None = None
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        import bench_streaming

        streaming = bench_streaming.run(
            spark, n_events=400_000, n_batches=5, files_per_batch=16
        )
    except Exception as exc:  # noqa: BLE001 — report, keep the artifact
        errors["streaming_tps"] = f"{type(exc).__name__}: {exc}"[:300]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if streaming:
        out["streaming"] = streaming
    if remeasured:
        out["remeasured"] = remeasured
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
