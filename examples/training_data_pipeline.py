#!/usr/bin/env python3
"""Training-data pipeline demo — the LLM-corpus operators end to end over
the documents/embeddings fixtures:

  documents → text features + quality/language + Gopher repetition filters
            → CCNet token-frequency / unigram-logprob LM quality
            → exact dedup (md5 fingerprint)
            → winnowing rolling-hash candidates (shared-substring overlap)
            → MinHash+LSH near-dup pairs (bucket-capped) → Jaccard verify
            → simhash Hamming pairs → connected components → survivors
            → duplicate-span detection (Lee et al.) → span stripping
            → mixture sampling → token packing → context-window chunks
            → BM25 full-text search over the cleaned corpus
            → hashed n-gram classifier trained on a weak-supervision rule
            → BPE tokenizer trained on the corpus word-frequency table
  embeddings → embedding-cosine near-dups → semantic dedup (SemDeDup)
            → ANN top-k (brute force + LSH)

Every stage is a linear scan plus an equi-join on a small derived key —
the shapes that survive a 1000-executor / 100 TB corpus (SCALE.md).

Usage: python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions import text as TX
from realtime_fraud_detection_spark.operators import clustering as C
from realtime_fraud_detection_spark.operators import dedup as D
from realtime_fraud_detection_spark.operators import quality as Q
from realtime_fraud_detection_spark.operators import similarity as SIM
from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources.testdata import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    n_docs = docs.count()

    # 1. quality + language gate (keep scored rows for the report)
    gated = docs.select(
        "doc_id",
        "text",
        F.round(TX.quality_score(F.col("text")), 4).alias("quality"),
        TX.language_id(F.col("text")).alias("lang_detected"),
        TX.token_count_whitespace(F.col("text")).alias("tokens"),
    ).filter(F.col("quality") >= 0.3)
    n_gated = gated.count()

    # 1b. Gopher/C4 repetition gate — tokenize the corpus ONCE
    # (quality.word_table) and share it across every word-level signal
    words = Q.word_table(docs).localCheckpoint(eager=False)
    rep = Q.repetition_stats(docs, words=words)
    n_gopher = rep.filter(Q.gopher_repetition_pass(rep)).count()

    # 1c. corpus-relative LM quality (CCNet): rare-token mass + unigram
    # log-probability with the corpus as its own language model
    tfs = Q.token_frequency_stats(docs, words=words)
    n_rare_heavy = tfs.filter(F.col("rare_frac") > 0.5).count()
    lp = Q.unigram_logprob(docs)
    lp_cut = lp.agg(F.expr("percentile(mean_unigram_logprob, 0.05)")).first()[0]
    n_lowlp = lp.filter(F.col("mean_unigram_logprob") <= lp_cut).count()

    # 2. exact dedup on the content fingerprint
    exact = D.exact_dedup(docs, TX.fingerprint(F.col("text")), "doc_id")
    n_clusters = exact.count()
    n_exact_dups = exact.agg(F.sum(F.col("dup_count") - 1)).first()[0]

    # 3. winnowing candidates (shared-substring evidence; the fixture docs
    # share one vocabulary, so only a high overlap count is signal)
    winnow = D.winnow_candidate_pairs(docs, "text", "doc_id", min_shared=20)
    n_winnow = winnow.count()

    # 3b. simhash Hamming-ball pairs (exhaustive for the bound via
    # pigeonhole bit-banding)
    sh_pairs = D.simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=4)
    n_shpairs = sh_pairs.count()

    # 3c. components over the simhash pairs → keep one doc per cluster
    clusters = C.connected_components(
        sh_pairs, vertices=docs.select("doc_id"), vertex_col="doc_id"
    )
    survivors = C.dedup_survivors(docs, clusters, "doc_id")
    n_survivors = survivors.count()

    # 3d. substring-level dedup (Lee et al. ACL'22): maximal duplicated
    # token spans, then cut them from the surviving docs
    from realtime_fraud_detection_spark.operators import spans as SPN

    dup_spans = SPN.duplicate_spans(docs, "text", "doc_id", k=8)
    n_spans = dup_spans.count()
    stripped = SPN.strip_duplicate_spans(survivors, dup_spans, "text", "doc_id")
    n_stripped = stripped.filter(
        F.col("stripped_text") != F.trim(TX.normalized_text(F.col("text")))
    ).count()

    # 4. MinHash+LSH candidates (bucket-capped) verified by exact Jaccard
    cands = D.minhash_lsh_candidates(
        docs, "text", "doc_id", num_perm=16, band_size=4, max_bucket_size=1000
    )
    near = D.ngram_jaccard(docs, cands, "text", "doc_id").filter(F.col("jaccard") >= 0.8)
    n_near = near.count()

    # 4b. PII scan over the surviving corpus (counts; redact_pii is the
    # writer-side transform)
    from realtime_fraud_detection_spark.functions import pii as P

    counts = P.pii_counts(F.col("text"))
    n_pii = (
        survivors.select(
            sum(counts.values(), F.lit(0)).alias("hits")
        )
        .agg(F.sum("hits"))
        .first()[0]
    )

    # 4c. mixture rebalance + token-budget packing: per-language sampling
    # fractions, then concat-and-chunk sequence assignment per stratum
    from realtime_fraud_detection_spark.operators import sampling as SA

    mix = {"en": 0.15, "de": 0.4, "fr": 0.4, "es": 0.35}
    sampled = SA.stratified_sample(survivors, "doc_id", "lang", mix, default=0.25)
    toks = sampled.select(
        "doc_id", "lang", TX.token_count_whitespace(F.col("text")).alias("tokens")
    )
    packed = SA.pack_sequences(toks, "doc_id", "tokens", budget=2000, stratum_col="lang")
    n_sampled = packed.count()
    n_seqs = packed.select("lang", "seq_id").distinct().count()

    # 4c2. the other mixture law: absolute per-language TOKEN budgets
    # ("the spec says 3k en tokens, 1.5k each otherwise") realized as the
    # minimal hash-ordered prefix — exact, nested, and skew-proof via
    # bucketed prefix sums (operators/sampling.token_budget_sample)
    budgeted = SA.token_budget_sample(
        toks,
        {"en": 3000, "de": 1500, "fr": 1500, "es": 1500, "zh": 1500},
        group_col="lang",
        token_col="tokens",
        id_col="doc_id",
    )
    n_budgeted, n_budget_toks = budgeted.agg(
        F.count("*"), F.sum("tokens")
    ).first()

    # 4c3. ...and the upsampling half: repeat factors >1 duplicate
    # low-resource docs across epochs (LLaMA/DoReMi-style), each copy
    # tagged for per-epoch reshuffling
    upsampled = SA.upsample_by_factor(
        toks, {"de": 2.4, "zh": 2.0}, group_col="lang", id_col="doc_id"
    )
    n_upsampled = upsampled.count()

    # 4d. context-window chunking of the packed sample (what an embedding
    # or pretraining consumer reads: bounded windows, stride overlap)
    chunks = SA.chunk_documents(sampled, "text", "doc_id", chunk_tokens=128, stride=96)
    n_chunks = chunks.count()

    # 4e. export as training shards: whole sequences per file, one file
    # per shard dir, per-language directories (JSONL)
    import glob
    import tempfile

    shard_dir = tempfile.mkdtemp(prefix="shards_")
    SA.write_training_shards(
        packed.join(sampled.select("doc_id", "text"), "doc_id"),
        shard_dir,
        stratum_col="lang",
        seqs_per_shard=4,
        fmt="json",
    )
    n_shard_files = len(glob.glob(f"{shard_dir}/lang=*/shard_id=*/part-*"))

    # 5. embedding-space: cosine near-dups + semantic dedup + ANN top-k
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    emb_pairs = D.embedding_near_dup_pairs(emb, threshold=0.45)
    n_emb = emb_pairs.count()
    sem = D.semantic_dedup(emb, threshold=0.45, n_cells=8)
    n_sem = sem.filter(~F.col("is_survivor")).count()
    queries = emb.filter(F.col("vec_id") < 3)
    ann = SIM.brute_force_topk(emb, queries, k=3)
    n_ann = ann.count()

    # 5b. PCA pre-transform (FAISS PCAR): project to 16 dims before any
    # coding stage; report the exact-top-10 recall retained in the
    # projected space (this synthetic fixture is near-isotropic, so the
    # number is the honest worst case — real corpora sit far higher)
    pca_mean, pca_comps = SIM.pca_fit(emb, k=16)
    proj = SIM.pca_project(emb, pca_mean, pca_comps).select(
        "vec_id", F.col("pca").alias("embedding")
    )
    pq = emb.filter(F.col("vec_id") < 20)
    exact10 = {
        (r["qid"], r["nid"])
        for r in SIM.brute_force_topk(emb, pq, k=10).collect()
    }
    proj10 = {
        (r["qid"], r["nid"])
        for r in SIM.brute_force_topk(
            proj, proj.filter(F.col("vec_id") < 20), k=10
        ).collect()
    }
    pca_recall = len(exact10 & proj10) / len(exact10)

    # 6. BM25 full-text search over the cleaned corpus
    from realtime_fraud_detection_spark.operators.corpus import bm25_rank

    text_queries = docs.filter("doc_id % 97 = 0").selectExpr(
        "doc_id AS q_id",
        "concat_ws(' ', slice(split(trim(regexp_replace(lower(text), "
        "'[^a-z0-9]+', ' ')), ' '), 1, 4)) AS query",
    )
    bm25 = bm25_rank(survivors, text_queries, top_k=5)
    n_bm25 = bm25.count()

    # 6b. hybrid retrieval: fuse the lexical hits with each query doc's
    # own-embedding cosine neighbors by reciprocal-rank fusion, then
    # diversify the fused list with MMR so near-duplicate hits are demoted
    from realtime_fraud_detection_spark.operators.corpus import rrf_fuse

    vec_hits = SIM.brute_force_topk(
        emb, emb.filter("vec_id % 97 = 0"), k=5
    ).select(F.col("qid").alias("q_id"), F.col("nid").alias("doc"), "rank")
    hybrid = rrf_fuse(
        {"lex": bm25.select("q_id", "doc", "rank"), "vec": vec_hits},
        k=60,
        top_k=5,
    )
    n_hybrid = hybrid.count()
    diversified = SIM.mmr_rerank(
        hybrid.join(
            emb.select(F.col("vec_id").alias("doc"), "embedding"), "doc"
        ).select(
            F.col("q_id").alias("qid"),
            F.col("doc").alias("nid"),
            F.col("rrf_score").alias("relevance"),
            "embedding",
        ),
        k=3,
        lam=0.7,
    )
    n_mmr = diversified.count()

    # 6c. contrastive training pairs from the retrieval output: each
    # query's BM25 top hit is its positive; k deterministic negatives
    # come from bucket-probe sampling (never a corpus scan per query)
    from realtime_fraud_detection_spark.operators.sampling import (
        negative_samples,
    )

    contrastive_pos = bm25.filter(F.col("rank") == 1).select("q_id", "doc")
    negs = negative_samples(
        contrastive_pos, survivors.select("doc_id"), k=3
    )
    n_negs = negs.count()

    # 6d. target-matched selection (DSIR): the highest-quality slice of
    # the cleaned corpus plays the target distribution; importance
    # resampling picks the survivors that look most like it
    from realtime_fraud_detection_spark.operators.curation import dsir_select

    dsir_target = gated.orderBy(F.desc("quality"), "doc_id").limit(25).select(
        "text"
    )
    dsir_picked = dsir_select(
        survivors, dsir_target, k=50, temperature=0.05
    )
    n_dsir = dsir_picked.count()

    # 7. distill a weak-supervision rule into a trainable filter (the
    # FineWeb-Edu / DCLM bootstrap: seed labels → hashed-ngram linear
    # model), trained entirely as DataFrame ops
    from realtime_fraud_detection_spark.ml.text_classifier import (
        hashed_features,
        score_logreg,
        train_text_classifier,
    )
    from realtime_fraud_detection_spark.suite.textml_q import _weak_label

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    clf, _ = train_text_classifier(
        labeled.filter("doc_id % 5 < 4"), "text", "doc_id", "y",
        n_buckets=1024, iters=20, lr=5.0,
    )
    holdout = (
        score_logreg(hashed_features(labeled, "text", "doc_id", 1024, bigrams=False), clf)
        .join(labeled.select(F.col("doc_id").alias("doc"), "y"), "doc")
        .filter("doc % 5 = 4")
        .agg(F.avg((F.col("pred") == F.col("y")).cast("double")))
        .first()[0]
    )

    # 7b. Stupid Backoff trigram LM scoring (CCNet's perplexity filter):
    # the LM counts from the survivor slice, the whole corpus is scored
    lm_scores = Q.ngram_lm_logprob(docs, lm_df=survivors)
    lm_cut = lm_scores.agg(F.expr("percentile(mean_sb_logprob, 0.05)")).first()[0]
    n_low_sb = lm_scores.filter(F.col("mean_sb_logprob") <= lm_cut).count()
    # …and CCNet's head/middle/tail split over the same scores (head =
    # most reference-like; mixtures sample the buckets at different rates)
    buckets = {
        r["bucket"]: r["n"]
        for r in Q.perplexity_buckets(lm_scores)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # 8. train a BPE tokenizer from the corpus word-frequency table and
    # tokenize the stripped survivors with it
    from realtime_fraud_detection_spark.functions.bpe import (
        apply_bpe,
        train_bpe,
        word_freq_table,
    )

    merges = train_bpe(word_freq_table(survivors, "text"), n_merges=200)
    bpe = apply_bpe(survivors, "text", "doc_id", merges)
    bpe_stats = bpe.agg(
        F.sum("n_tokens").alias("tok"),
        F.sum(F.aggregate("tokens", F.lit(0), lambda a, t: a + F.length(t))).alias("chars"),
    ).first()

    # 9. the productized form: one-call curation funnel + named hash
    # splits (everything above, sequenced by operators/curation.py)
    from realtime_fraud_detection_spark.operators.curation import (
        clean_corpus,
        leakage_free_splits,
    )

    cleaned, funnel = clean_corpus(docs, c4=False)  # word-salad corpus: no C4 punctuation
    # split on the near-dup CLUSTER id (components computed at 3c) so a
    # near-copy of a test doc can never land in train (Lee ACL'22 §6.2)
    splits = leakage_free_splits(
        cleaned,
        {"train": 0.9, "val": 0.05, "test": 0.05},
        clusters=clusters,
    )
    split_sizes = {k: v.count() for k, v in splits.items()}

    # 10. physical layout: z-order the curated corpus on (lang bucket,
    # quality score) so downstream per-language / per-band scans prune at
    # the parquet footer (operators/layout.py)
    import glob as _glob
    import tempfile as _tf

    from realtime_fraud_detection_spark.operators.layout import write_zordered

    with_dims = gated.select(
        "doc_id",
        "text",
        (F.crc32(F.col("lang_detected")) % 64).alias("lang_bucket"),
        F.col("quality").alias("q"),
    )
    zdir = _tf.mkdtemp(prefix="tdp_zorder_")
    write_zordered(
        with_dims, zdir, ["lang_bucket", "q"], n_files=8,
        bounds={"lang_bucket": (0, 63), "q": (0.0, 1.0)},  # known domains
    )
    n_zfiles = len(_glob.glob(f"{zdir}/*.parquet"))

    print(f"documents            {n_docs}")
    print(f"quality-gated        {n_gated}  ({n_docs - n_gated} filtered)")
    print(f"gopher-repetition    {n_gopher}  pass  ({n_docs - n_gopher} repetitious)")
    print(f"rare-token heavy     {n_rare_heavy}  (rare_frac > 0.5, CCNet signal)")
    print(f"low-LM-quality       {n_lowlp}  (bottom 5% mean unigram logprob)")
    print(f"exact-dup clusters   {n_clusters}  ({n_exact_dups} redundant docs)")
    print(f"winnow candidates    {n_winnow}  (>=20 shared fingerprints)")
    print(f"simhash near-dups    {n_shpairs}  (hamming <= 4)")
    print(f"cluster survivors    {n_survivors}  (one doc per component)")
    print(f"duplicate spans      {n_spans}  (k=8 token grams; {n_stripped} survivors trimmed)")
    print(f"lsh near-dups        {n_near}  (jaccard >= 0.8)")
    print(f"pii matches          {n_pii}  (email/phone/ip/ssn/card)")
    print(f"mixture sample       {n_sampled}  docs -> {n_seqs} packed sequences")
    print(f"token-budget mix     {n_budgeted}  docs ({n_budget_toks} tokens against per-lang budgets)")
    print(f"upsampled epochs     {n_upsampled}  rows (de x2.4, zh x2.0 repeat factors)")
    print(f"context chunks       {n_chunks}  (128-token windows, stride 96)")
    print(f"training shards      {n_shard_files}  JSONL files (whole sequences per file)")
    print(f"embedding near-dups  {n_emb}  (cosine >= 0.45)")
    print(f"semantic dups        {n_sem}  pruned (SemDeDup, within-cell cosine)")
    print(f"ann results          {n_ann}  (3 queries x top-3)")
    print(f"pca 64->16 dims      {pca_recall:.2f}  top-10 recall retained (isotropic worst case)")
    print(f"bm25 hits            {n_bm25}  (corpus-derived queries, top-5)")
    print(f"hybrid rrf hits      {n_hybrid}  (BM25 + cosine lists fused, top-5)")
    print(f"mmr diversified      {n_mmr}  (lambda=0.7, top-3 per query)")
    print(f"contrastive negs     {n_negs}  (3 bucket-probe negatives per BM25 positive)")
    print(f"dsir selection       {n_dsir}  docs importance-resampled toward the top-quality slice")
    print(f"classifier holdout   {holdout:.3f}  accuracy (weak-rule distillation, {len(clf.weights)} active buckets)")
    print(f"low-trigram-LM       {n_low_sb}  (bottom 5% Stupid Backoff logprob vs survivor LM)")
    print(f"ccnet buckets        head {buckets.get('head', 0)} / middle {buckets.get('middle', 0)} / tail {buckets.get('tail', 0)}")
    print(f"bpe tokens           {bpe_stats['tok']}  ({len(merges)} merges, {bpe_stats['chars']} chars in tokens)")
    print(f"one-call curation    {' -> '.join(f'{k}:{v}' for k, v in funnel.items())}")
    print(f"hash splits          {split_sizes}")
    print(f"z-ordered layout     {n_zfiles}  files clustered on (lang_bucket, quality)")
    print(f"wall clock           {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
