#!/usr/bin/env python3
"""Scale probe: measure the dedup pipeline at 10x the sf0.1 document count.

Builds a 50k-doc corpus from the sf0.1 fixture (10 replicas; EVERY word
gets a replica-unique suffix — a per-replica vocabulary bijection, so
each replica keeps the fixture's near-dup cluster structure while
replicas share zero words: no shared shingles for LSH, and independent
64-bit simhashes whose Hamming<=4 collision probability is ~4e-14.
Partial-suffix schemes do NOT isolate replicas here: the fixture's ~30
word vocabulary keeps cross-replica signatures within Hamming 4),
then times the three heavy
dedup operators end-to-end. Linear input growth should give ~linear
runtime growth for the scan/LSH stages and pair counts (cluster structure
is replicated, not densified); superlinear growth would indicate a
candidate-generation blow-up. Results are recorded in SCALE.md.

Usage: python3 tools/scale_probe.py [replicas]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scale_docs"


def build_corpus(spark, replicas: int) -> None:
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.sources.testdata import load_table

    docs = load_table(spark, SF_DIR, "documents", fan_out=True)
    parts = []
    for r in range(replicas):
        # suffix must be ALPHANUMERIC with no separator: the dedup ops
        # normalize text to [a-z0-9] words, so "query_0" would split into
        # "query 0" and replicas would share the original vocabulary again
        # (observed: identical pair counts under every separator scheme)
        mutated = F.regexp_replace(F.col("text"), r"(\S+)", rf"$1qz{r}")
        parts.append(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                "lang",
                mutated.alias("text"),
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionAll(p)
    corpus.repartition(64).write.mode("overwrite").parquet(OUT)


def main() -> None:
    from realtime_fraud_detection_spark.operators import clustering as C
    from realtime_fraud_detection_spark.operators import dedup as D
    from realtime_fraud_detection_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    build_corpus(spark, replicas)
    print(f"corpus: {replicas}x built in {time.time() - t0:.1f}s")

    docs = spark.read.parquet(OUT)
    n = docs.count()

    t0 = time.time()
    sigs = D.minhash_signatures(docs, "text", "doc_id", num_perm=4)
    sigs.write.format("noop").mode("overwrite").save()
    t_minhash = time.time() - t0

    t0 = time.time()
    cands = D.minhash_lsh_candidates(
        docs, "text", "doc_id", num_perm=16, band_size=4, max_bucket_size=1000
    )
    n_cands = cands.count()
    t_lsh = time.time() - t0

    t0 = time.time()
    pairs = D.simhash_near_dup_pairs(docs, "text", "doc_id", bits=64, max_hamming=4)
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()
    t_simhash_pairs = time.time() - t0

    t0 = time.time()
    comp = C.connected_components(
        pairs, vertices=docs.select("doc_id"), vertex_col="doc_id"
    )
    n_clusters = comp.select("cluster").distinct().count()
    t_cc = time.time() - t0

    t0 = time.time()
    from realtime_fraud_detection_spark.operators import spans as SP

    sp = SP.duplicate_spans(docs, "text", "doc_id", k=8)
    n_spans = sp.count()
    t_spans = time.time() - t0

    # round-4 operators: trigram LM (count tables scale with the corpus —
    # replica-unique vocab makes them 10x too), BPE train+apply, classifier
    # feature extraction + scoring (training excluded: its wall clock is
    # the iteration job floor, measured flat elsewhere), BM25
    from realtime_fraud_detection_spark.operators import quality as Q

    t0 = time.time()
    lm = Q.ngram_lm_logprob(docs, text_col="text", id_col="doc_id")
    lm.write.format("noop").mode("overwrite").save()
    t_ngram = time.time() - t0

    t0 = time.time()
    from realtime_fraud_detection_spark.functions import bpe as B

    merges = B.train_bpe(B.word_freq_table(docs, "text"), n_merges=200)
    B.apply_bpe(docs, "text", "doc_id", merges).write.format("noop").mode(
        "overwrite"
    ).save()
    t_bpe = time.time() - t0

    t0 = time.time()
    from realtime_fraud_detection_spark.ml import text_classifier as TC

    feats = TC.hashed_features(docs, "text", "doc_id", 1024, bigrams=False)
    model = TC.LogRegModel(n_buckets=1024, bias=0.1, weights={1: 0.5, 2: -0.5})
    TC.score_logreg(feats, model).write.format("noop").mode("overwrite").save()
    t_clf = time.time() - t0

    print(
        f"ngram_lm={t_ngram:.1f}s bpe_train_apply={t_bpe:.1f}s "
        f"classifier_feats_score={t_clf:.1f}s (merges={len(merges)})"
    )

    t0 = time.time()
    comp_star = C.connected_components_star(
        pairs, vertices=docs.select("doc_id"), vertex_col="doc_id"
    )
    n_clusters_star = comp_star.select("cluster").distinct().count()
    t_star = time.time() - t0

    print(
        f"docs={n} lsh_candidates={n_cands} simhash_pairs={n_pairs} "
        f"dup_spans={n_spans} clusters={n_clusters} clusters_star={n_clusters_star}"
    )
    print(
        f"minhash={t_minhash:.1f}s lsh_candidates={t_lsh:.1f}s "
        f"simhash_pairs={t_simhash_pairs:.1f}s duplicate_spans={t_spans:.1f}s "
        f"connected_components={t_cc:.1f}s "
        f"connected_components_star={t_star:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
