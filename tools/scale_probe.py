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

Usage: python3 tools/scale_probe.py [replicas] [stages]   (default 10, all)
  stages: comma-separated subset of
  minhash,lsh,simhash,cc,star,spans,ngram,bpe,clf,quality,graphx,ivfpq,sketch,layout
  (e.g. `100 simhash,cc,ngram,quality` for the 100x top-3-shape probe;
  `graphx` = triangles + k-core over the simhash pair graph; `ivfpq`
  replicates the embeddings fixture — per-replica element rotation, so
  replicas share no vectors — and times the IVF,PQ build+search; `clf`
  includes full weak-label training, not just feature+score; `sketch`
  replicates the events fixture — per-replica user-id offset so item
  cardinality scales with the data — and times the DDSketch quantile and
  Misra-Gries heavy-hitter partial builds + day rollups, reporting the
  stored-partials row counts, which must stay bounded by groups x
  buckets/capacity while events grow; `mixture` generates replicas x 1M
  synthetic rows with an 80%-hot domain and times token_budget_sample's
  bucket-offset prefix sum against the naive one-window-per-group form;
  `ingest` probes a FIXED 500-doc batch against the persisted setsim
  prefix index of the growing corpus — per-ingest cost is the index
  scan, candidate count must stay flat; `mlprep` replicates the events
  fixture and times the PSI drift detail + out-of-fold target encoding,
  both of which must scale like plain aggregations)
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
    all_stages = (
        "minhash,lsh,setsim,ingest,simhash,cc,star,spans,ngram,bpe,clf,quality,"
        "graphx,doulion,ivfpq,sketch,seqfeat,hotkey,layout,funnel,mixture,pca,embed,negs,"
        "index,dsir,abeval,mmodal,mlprep,retrieval"
    )
    stages = set((sys.argv[2] if len(sys.argv) > 2 else all_stages).split(","))
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if stages - {"ivfpq", "sketch", "seqfeat", "hotkey", "layout", "mixture", "pca", "negs", "abeval", "mmodal", "mlprep", "retrieval"}:  # doc-corpus stages
        t0 = time.time()
        build_corpus(spark, replicas)
        print(f"corpus: {replicas}x built in {time.time() - t0:.1f}s")

        docs = spark.read.parquet(OUT)
        n = docs.count()
        print(f"docs={n}")

    if "minhash" in stages:
        t0 = time.time()
        sigs = D.minhash_signatures(docs, "text", "doc_id", num_perm=4)
        sigs.write.format("noop").mode("overwrite").save()
        print(f"minhash={time.time() - t0:.1f}s")

    if "lsh" in stages:
        t0 = time.time()
        cands = D.minhash_lsh_candidates(
            docs, "text", "doc_id", num_perm=16, band_size=4, max_bucket_size=1000
        )
        n_cands = cands.count()
        print(f"lsh_candidates={time.time() - t0:.1f}s n={n_cands}")

    if "setsim" in stages:
        # prefix-filtered exact Jaccard join (operators/setsim.py): the
        # inverted index holds only rarest-prefix tokens, and replicas
        # share no vocabulary — candidate count and runtime must grow
        # ~linearly with replicas (an all-pairs blow-up would be quadratic)
        from realtime_fraud_detection_spark.operators.setsim import (
            jaccard_similarity_join,
            prefix_filtered_candidates,
        )

        t0 = time.time()
        _cand_df = prefix_filtered_candidates(
            docs, "text", "doc_id", threshold=0.5
        )
        try:
            n_cands = _cand_df.count()
        except Exception:
            import contextlib
            import io

            _b = io.StringIO()
            with contextlib.redirect_stdout(_b):
                _cand_df.explain(mode="formatted")
            with open("/tmp/setsim_failed_plan.txt", "w") as _f:
                _f.write(_b.getvalue())
            raise
        t1 = time.time()
        n_pairs = jaccard_similarity_join(
            docs, "text", "doc_id", threshold=0.5
        ).count()
        print(
            f"setsim_candidates={t1 - t0:.1f}s n={n_cands} "
            f"setsim_join={time.time() - t1:.1f}s n_pairs={n_pairs}"
        )

    if "ingest" in stages:
        # incremental ingest against a PERSISTED index (the production
        # topology of jaccard_ingest / prefix_filtered_candidates_
        # incremental): the batch is FIXED — replica 0's every-10th doc,
        # so it shares vocabulary only with replica 0's corpus slice —
        # while the standing corpus (and therefore the index) grows with
        # the replicas. The per-ingest cost model at 100 TB is "one scan
        # of the index + a broadcast of the batch postings": probe time
        # may grow at most linearly with the index, candidate count must
        # stay FLAT (the batch only ever matches its own replica).
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators.setsim import (
            prefix_filtered_candidates_incremental,
            prefix_index,
            token_df_table,
        )

        batch = docs.filter(
            (F.col("doc_id") < 10_000_000) & (F.col("doc_id") % 10 == 0)
        )
        standing = docs.filter(
            (F.col("doc_id") >= 10_000_000) | (F.col("doc_id") % 10 != 0)
        )
        t0 = time.time()
        token_df_table(standing, "text", "doc_id", 3).write.mode(
            "overwrite"
        ).parquet("/tmp/sg_setsim_dfreq")
        dfreq_p = spark.read.parquet("/tmp/sg_setsim_dfreq")
        prefix_index(
            standing, "text", "doc_id", 0.5, 3, dfreq=dfreq_p
        ).write.mode("overwrite").parquet("/tmp/sg_setsim_idx")
        idx_p = spark.read.parquet("/tmp/sg_setsim_idx")
        t_build = time.time() - t0
        idx_rows = idx_p.count()
        t0 = time.time()
        n_inc = prefix_filtered_candidates_incremental(
            batch,
            corpus_index=idx_p,
            corpus_dfreq=dfreq_p,
            threshold=0.5,
        ).count()
        t_probe = time.time() - t0
        print(
            f"setsim_ingest: index_build={t_build:.1f}s "
            f"idx_rows={idx_rows} probe={t_probe:.1f}s n_cand={n_inc} "
            f"batch_docs={batch.count()}"
        )

    pairs = None
    if stages & {"simhash", "cc", "star", "graphx", "doulion"}:
        t0 = time.time()
        pairs = D.simhash_near_dup_pairs(docs, "text", "doc_id", bits=64, max_hamming=4)
        # DISK_ONLY: at 100x the pair table is ~53M rows; holding its
        # blocks deserialized in the 8 GB heap alongside the downstream
        # stages' working set is what made the graph stages flaky
        from pyspark import StorageLevel

        pairs = pairs.localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
        n_pairs = pairs.count()
        print(f"simhash_pairs={time.time() - t0:.1f}s n={n_pairs}")

    if "cc" in stages:
        t0 = time.time()
        comp = C.connected_components(
            pairs, vertices=docs.select("doc_id"), vertex_col="doc_id"
        )
        n_clusters = comp.select("cluster").distinct().count()
        print(f"connected_components={time.time() - t0:.1f}s clusters={n_clusters}")

    if "star" in stages:
        t0 = time.time()
        comp_star = C.connected_components_star(
            pairs, vertices=docs.select("doc_id"), vertex_col="doc_id"
        )
        n_clusters_star = comp_star.select("cluster").distinct().count()
        print(
            f"connected_components_star={time.time() - t0:.1f}s "
            f"clusters={n_clusters_star}"
        )

    if "spans" in stages:
        from realtime_fraud_detection_spark.operators import spans as SP

        t0 = time.time()
        sp = SP.duplicate_spans(docs, "text", "doc_id", k=8)
        n_spans = sp.count()
        print(f"duplicate_spans={time.time() - t0:.1f}s n={n_spans}")

    from realtime_fraud_detection_spark.operators import quality as Q

    if "ngram" in stages:
        # trigram LM: count tables scale with the corpus (replica-unique
        # vocab makes them grow with the replicas too)
        t0 = time.time()
        lm = Q.ngram_lm_logprob(docs, text_col="text", id_col="doc_id")
        lm.write.format("noop").mode("overwrite").save()
        print(f"ngram_lm={time.time() - t0:.1f}s")

    if "quality" in stages:
        # the post-round-5 quality_filters shape: ONE tokenize
        # (word_table, checkpointed) feeding repetition + token-frequency
        # + contamination; one line split feeding line/boilerplate stats
        from pyspark.sql import functions as F

        t0 = time.time()
        words = Q.word_table(docs, "text", "doc_id").localCheckpoint(eager=False)
        lines = Q.line_table(docs, "text", "doc_id").localCheckpoint(eager=False)
        rep = Q.repetition_stats(docs, "text", "doc_id", words=words)
        tfs = Q.token_frequency_stats(docs, words=words).withColumnRenamed(
            "doc", "doc_id"
        )
        bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
        cont = Q.contamination_stats(
            docs, bench, n=8, words=words,
            bench_words=words.filter(F.col("doc") % 50 == 0),
        ).withColumnRenamed("doc", "doc_id")
        c4 = Q.c4_line_stats(docs, "text", "doc_id", lines=lines).withColumnRenamed(
            "doc", "doc_id"
        )
        boiler = Q.boilerplate_line_stats(
            docs, "text", "doc_id", lines=lines
        ).withColumnRenamed("doc", "doc_id")
        out = (
            rep.join(c4, "doc_id").join(boiler, "doc_id")
            .join(cont, "doc_id").join(tfs, "doc_id")
        )
        out.write.format("noop").mode("overwrite").save()
        print(f"quality_filters={time.time() - t0:.1f}s")

    if "bpe" in stages:
        from realtime_fraud_detection_spark.functions import bpe as B

        t0 = time.time()
        merges = B.train_bpe(B.word_freq_table(docs, "text"), n_merges=200)
        B.apply_bpe(docs, "text", "doc_id", merges).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"bpe_train_apply={time.time() - t0:.1f}s (merges={len(merges)})")

    if "clf" in stages:
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.ml import text_classifier as TC
        from realtime_fraud_detection_spark.suite.textml_q import _weak_label

        t0 = time.time()
        feats = TC.hashed_features(docs, "text", "doc_id", 1024, bigrams=False)
        model = TC.LogRegModel(n_buckets=1024, bias=0.1, weights={1: 0.5, 2: -0.5})
        TC.score_logreg(feats, model).write.format("noop").mode("overwrite").save()
        print(f"classifier_feats_score={time.time() - t0:.1f}s")
        # FULL training on the scaled corpus (the one-shuffle-per-iteration
        # array loop): weak labels + 8 Adagrad iterations. local_cells=0
        # pins the DISTRIBUTED path — this stage's purpose is the
        # at-scale trainer's growth curve, and the 10x corpus (~1.5M
        # cells) would otherwise fall under the local gate
        t0 = time.time()
        labels = docs.select(
            F.col("doc_id").alias("doc"),
            _weak_label(F.col("text")).cast("double").alias("y"),
        )
        feats_m = TC.hashed_features(
            docs, "text", "doc_id", 1024, bigrams=False
        ).localCheckpoint(eager=True)
        trained = TC.train_logreg(
            feats_m, labels, 1024, iters=8, lr=5.0, l2=0.0, local_cells=0
        )
        print(
            f"classifier_train8={time.time() - t0:.1f}s "
            f"(active_buckets={len(trained.weights)})"
        )

    def _guarded(name, fn):
        # a failed stage reports and lets the rest of the probe run —
        # one blow-up must not cost every later stage's measurement
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — probe tool, report + continue
            print(f"{name}=FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}")

    if "embed" in stages:
        # hashed char-n-gram embeddings (operators/text_embed.py): the
        # build is explode(grams) + two hash-keyed aggregates — the
        # minhash/simhash shape — so runtime must grow ~linearly with
        # corpus size (per-doc gram counts are fixture-fixed)
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators.text_embed import (
            hashed_text_embeddings,
        )

        def _embed():
            t0 = time.time()
            emb = hashed_text_embeddings(
                docs, "text", "doc_id", dim=64
            ).select("doc_id", "embedding").localCheckpoint()
            n_e = emb.count()
            n_nz = emb.filter(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda a, x: a + F.abs(x)
                ) > 0
            ).count()
            print(
                f"text_embed={time.time() - t0:.1f}s docs={n_e} nonzero={n_nz}"
            )

        _guarded("embed", _embed)

    if "negs" in stages:
        # bucket-probe negative sampling: replicas x 100k-doc synthetic
        # corpus, 1k queries x k=4 — cost must track the ONE corpus
        # bucket shuffle + probes x ~16-doc bucket fan-out, not |Q| x N
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators.sampling import (
            negative_samples,
        )

        def _negs():
            n_corpus = replicas * 100_000
            corpus = spark.range(n_corpus).select(F.col("id").alias("doc_id"))
            pos = (
                spark.range(1000)
                .select((F.col("id") * 97).alias("q_id"))
                .select("q_id", (F.col("q_id") + 1).alias("doc"))
            )
            t0 = time.time()
            out = negative_samples(
                pos, corpus, k=4, n_buckets=n_corpus // 16
            ).localCheckpoint()
            n_out = out.count()
            full = out.groupBy("q_id").count().filter("count = 4").count()
            print(
                f"negative_samples={time.time() - t0:.1f}s corpus={n_corpus} "
                f"queries=1000 rows={n_out} full_k={full}"
            )

        _guarded("negs", _negs)

    if "index" in stages:
        # incremental search-index maintenance: land the replicated doc
        # corpus in `replicas` batches — per-batch cost must be flat
        # (each batch tokenizes only itself), and the final view must
        # serve BM25 without re-tokenizing anything
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators.corpus import bm25_rank
        from realtime_fraud_detection_spark.streaming.sinks import (
            search_index_view,
            search_index_writer,
        )

        def _index():
            out_dir = tempfile.mkdtemp(prefix="probe_index_")
            try:
                writer = search_index_writer(out_dir)
                batch_times = []
                for r in range(replicas):
                    lo, hi = r * 10_000_000, r * 10_000_000 + 10_000_000
                    b = docs.filter(
                        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                    )
                    t0 = time.time()
                    writer(b, r)
                    batch_times.append(time.time() - t0)
                view = search_index_view(spark, out_dir)
                queries = docs.filter("doc_id % 9973 = 0").selectExpr(
                    "doc_id AS q_id",
                    "concat_ws(' ', slice(split(trim(regexp_replace("
                    "lower(text), '[^a-z0-9]+', ' ')), ' '), 1, 4)) AS query",
                )
                t0 = time.time()
                n_hits = bm25_rank(docs, queries, top_k=5, dt=view).count()
                print(
                    f"search_index: batches={replicas} "
                    f"batch_s=[{min(batch_times):.1f},{max(batch_times):.1f}] "
                    f"serve={time.time() - t0:.1f}s hits={n_hits} "
                    f"stored_terms={view.count()}"
                )
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)

        _guarded("index", _index)

    if "dsir" in stages:
        # DSIR weights over the replicated corpus: two bucket-count
        # aggregates (bounded at n_buckets rows) + one broadcast join+sum
        # — runtime must track the corpus scans, state stays model-sized
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators.curation import (
            dsir_select,
        )

        def _dsir():
            target = docs.filter(F.col("doc_id") % 50 == 0).select("text")
            t0 = time.time()
            picked = dsir_select(docs, target, k=1000)
            n_sel = picked.count()
            print(f"dsir={time.time() - t0:.1f}s docs={n} selected={n_sel}")

        _guarded("dsir", _dsir)

    if "funnel" in stages:
        # the COMPOSED curation pipeline — one call, every gate that can
        # discriminate on this corpus. The per-stage probes above bound
        # each family alone; this row is the interaction test
        # (checkpointed word tables + the simhash band table + CC rolling
        # checkpoints coexisting in one heap), which is where composed
        # pipelines OOM first. c4=False: the fixture docs are single-line
        # with no terminal punctuation, so C4's >=3-kept-lines rule
        # degenerates to an empty corpus here (its line-stats COST is
        # measured in the `quality` stage, which runs c4_line_stats on
        # the same corpus).
        from realtime_fraud_detection_spark.operators import curation as CU

        def _funnel():
            t0 = time.time()
            clean, funnel = CU.clean_corpus(
                docs,
                id_col="doc_id",
                c4=False,
                near_dup=True,
                strip_boilerplate=True,
            )
            clean.write.format("noop").mode("overwrite").save()
            print(
                f"clean_corpus={time.time() - t0:.1f}s "
                + " ".join(f"{k}={v}" for k, v in funnel.items())
            )

        _guarded("clean_corpus", _funnel)

    if "graphx" in stages:
        from realtime_fraud_detection_spark.operators import graph as G

        def _kcore():
            t0 = time.time()
            core = G.k_core(pairs, k=3, src_col="doc_a", dst_col="doc_b")
            print(f"k_core3={time.time() - t0:.1f}s members={core.count()}")

        _guarded("k_core3", _kcore)
        # the near-dup pair graph is a union of near-cliques: EXACT wedge
        # volume is Θ(Σ clique³) and outgrows single-box shuffle capacity
        # around 100x (>80 GB spill observed) — past 50x the probe runs
        # the DOULION edge-sampled estimator (p=0.1 cuts wedges 100x)
        p = 0.1 if replicas >= 50 else None

        def _tri():
            t0 = time.time()
            tri = G.triangle_count(
                pairs, src_col="doc_a", dst_col="doc_b", edge_sample=p
            )
            n_tri = tri.agg({"triangles": "sum"}).first()[0] or 0
            print(
                f"triangles(p={p or 1})={time.time() - t0:.1f}s sum={n_tri:.0f}"
            )

        _guarded("triangles", _tri)

        def _lpa():
            t0 = time.time()
            labels = G.label_propagation(
                pairs, src_col="doc_a", dst_col="doc_b"
            )
            n_comm = labels.select("label").distinct().count()
            print(
                f"lpa={time.time() - t0:.1f}s communities={n_comm} "
                f"vertices={labels.count()}"
            )

        _guarded("lpa", _lpa)

    if "doulion" in stages:
        # Round-10 item: measure the DOULION knob at scale instead of
        # citing it — exact vs sampled global counts (relative error)
        # and the degree-wedge volume Σ C(deg,2) the sampler cuts by
        # ~p² (the quantity that outgrows shuffle capacity on the
        # clique-dominated near-dup graph). Exact runs only below 50x;
        # above, the p-ladder still records the wedge cut.
        from pyspark.sql import functions as PF

        from realtime_fraud_detection_spark.functions.hashing import (
            md5_bigint,
        )
        from realtime_fraud_detection_spark.operators import graph as G

        def _wedges(p: float | None) -> int:
            a, b = PF.col("doc_a"), PF.col("doc_b")
            und = (
                pairs.select(
                    PF.least(a, b).alias("a"), PF.greatest(a, b).alias("b")
                )
                .filter(PF.col("a") != PF.col("b"))
                .distinct()
            )
            if p is not None:
                coin = md5_bigint(
                    PF.concat_ws(":", PF.col("a"), PF.col("b")), salt="tri:"
                )
                und = und.filter((coin % 1_000_000) < int(p * 1_000_000))
            deg = (
                und.select(PF.col("a").alias("v"))
                .unionAll(und.select(PF.col("b").alias("v")))
                .groupBy("v")
                .agg(PF.count("*").alias("d"))
            )
            return int(
                deg.agg(
                    PF.sum(PF.col("d") * (PF.col("d") - 1) / 2)
                ).first()[0]
                or 0
            )

        def _doulion():
            exact_total = None
            for pp in (None, 0.3, 0.1):
                if pp is None and replicas >= 50:
                    print("doulion: exact skipped (>=50x wedge volume)")
                    continue
                t0 = time.time()
                tri = G.triangle_count(
                    pairs, src_col="doc_a", dst_col="doc_b", edge_sample=pp
                )
                tot = tri.agg({"triangles": "sum"}).first()[0] or 0
                w = _wedges(pp)
                secs = time.time() - t0
                if pp is None:
                    exact_total = tot
                    print(
                        f"doulion p=1.0: {secs:.1f}s sum={tot:.0f} wedges={w}"
                    )
                else:
                    err = (
                        abs(tot - exact_total) / exact_total
                        if exact_total
                        else float("nan")
                    )
                    print(
                        f"doulion p={pp}: {secs:.1f}s sum={tot:.0f} "
                        f"rel_err={err:.3f} wedges={w}"
                    )

        _guarded("doulion", _doulion)

    if "ivfpq" in stages:
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators import similarity as SIM
        from realtime_fraud_detection_spark.sources.testdata import load_table

        emb0 = load_table(spark, SF_DIR, "embeddings", fan_out=True)
        parts = []
        for r in range(replicas):
            # per-replica element ROTATION: norm-preserving, replicas
            # share no vectors, cluster structure re-rolls per replica
            rot = r % 64
            e = F.concat(
                F.slice("embedding", rot + 1, 64 - rot),
                F.slice("embedding", 1, rot),
            )
            parts.append(
                emb0.select(
                    (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                    "label",
                    e.alias("embedding"),
                )
            )
        emb = parts[0]
        for p in parts[1:]:
            emb = emb.unionAll(p)
        emb = emb.repartition(max(8, replicas)).localCheckpoint()
        n_vec = emb.count()
        # cells scale ~sqrt(N) (the FAISS rule of thumb), probes with them
        n_cells = max(8, int(n_vec ** 0.5 / 10))
        queries = emb0.filter(F.col("vec_id") < 5)
        # production fit topology: quantizers train on a hash_sample
        # sized to the local-fit gate (FAISS trains on samples; encoding
        # still scans everything) and are INJECTED into the index build
        dim = 64
        frac = min(1.0, (SIM._LOCAL_FIT_CELLS * 0.75 / dim) / n_vec)
        from realtime_fraud_detection_spark.operators.sampling import (
            hash_sample,
        )

        t0 = time.time()
        fit_on = hash_sample(emb, "vec_id", frac) if frac < 1.0 else emb
        coarse = SIM.fit_coarse_quantizer(emb, n_cells, fit_on=fit_on)
        books = SIM.pq_train(fit_on, m=8, ks=16)
        t_fit = time.time() - t0
        t0 = time.time()
        top = SIM.ivf_pq_topk(
            emb, queries, k=3, n_cells=n_cells, n_probe=max(3, n_cells // 8),
            m=8, ks=16, rerank=6, coarse=coarse, codebooks=books,
        )
        n_rows = top.count()
        print(
            f"ivf_pq_fit={t_fit:.1f}s (sample frac={frac:.3f}) "
            f"ivf_pq_topk={time.time() - t0:.1f}s vectors={n_vec} "
            f"cells={n_cells} rows={n_rows}"
        )

    if "seqfeat" in stages:
        # round-10: the M6 trailing-window feature assembly + one
        # decimal-gradient training round at replicated-events scale. The
        # window sort is per-user (users scale with replicas — bounded
        # per-key state), and a gradient round is one map-side-combined
        # aggregation: both should grow ~linearly with events.
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.ml.sequential import (
            lagged_sequence_features,
            train_sequential_scorer,
        )
        from realtime_fraud_detection_spark.sources.testdata import load_table

        ev0 = load_table(spark, SF_DIR, "events", fan_out=True)
        parts = []
        for r in range(replicas):
            parts.append(
                ev0.select(
                    (F.col("event_id") + r * 100_000_000).alias("event_id"),
                    "ts",
                    (F.col("user_id") + r * 10_000_000).alias("user_id"),
                    (F.col("value") * (1.0 + r / 1000.0)).alias("value"),
                )
            )
        sev = parts[0]
        for pp in parts[1:]:
            sev = sev.unionAll(pp)
        sev = sev.repartition(max(8, replicas)).localCheckpoint()
        n_sev = sev.count()

        def _seqfeat():
            t0 = time.time()
            feats = lagged_sequence_features(
                sev, "user_id", "ts", "value", "event_id"
            ).localCheckpoint()
            n = feats.count()
            t1 = time.time()
            feats = feats.withColumn(
                "label",
                ((F.col("seq_gap_s") < 300) & (F.col("seq_n") >= 3)).cast("int"),
            )
            model = train_sequential_scorer(feats, "label", iters=3)
            print(
                f"seqfeat: assemble={t1 - t0:.1f}s rows={n} "
                f"train3={time.time() - t1:.1f}s "
                f"w0={model['weights'][0]:.4f} (events={n_sev})"
            )

        _guarded("seqfeat", _seqfeat)

    if "abeval" in stages:
        # round-11: the streaming A/B + model-eval partial stores at
        # replicated-results scale. Laws under test: (1) per-batch store
        # growth is BOUNDED — ≤ |experiments|×2 moment rows and
        # ≤ 10^decimals+1 rounded-score rows per batch — whatever the
        # batch size, so rollup cost scales with batches×groups, NOT
        # events; (2) the lossless merge reproduces the one-shot batch
        # analysis over the union bit-exactly at every scale.
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.ml.experiments import (
            assign_variants,
            experiment_analysis,
            experiments_table,
        )
        from realtime_fraud_detection_spark.sources.testdata import load_table
        from realtime_fraud_detection_spark.streaming.sinks import (
            eval_partial_writer,
            eval_rollup_view,
            experiment_partial_writer,
            experiment_rollup_view,
        )

        ev0 = load_table(spark, SF_DIR, "events", fan_out=True)
        parts = []
        for r in range(replicas):
            parts.append(
                ev0.select(
                    (F.col("event_id") + r * 100_000_000).alias("transaction_id"),
                    (F.col("user_id") + r * 10_000_000).alias("user_id"),
                )
            )
        res = parts[0]
        for pp in parts[1:]:
            res = res.unionAll(pp)
        pred = F.round(((F.col("transaction_id") * 37) % 1000) / 1000.0, 6)
        res = res.select(
            "transaction_id",
            "user_id",
            F.lit("ensemble").alias("model_used"),
            pred.alias("prediction"),
            F.when(pred >= 0.8, "DECLINE")
            .when(pred >= 0.6, "REVIEW")
            .when(pred >= 0.4, "APPROVE_WITH_MONITORING")
            .otherwise("APPROVE")
            .alias("decision"),
            ((F.col("transaction_id") * 13) % 5 == 0).alias("actual_fraud"),
            (5.0 + (F.col("transaction_id") % 20)).cast("double").alias(
                "processing_time_ms"
            ),
        ).repartition(max(8, replicas)).localCheckpoint()
        n_res = res.count()
        exps = experiments_table(
            spark,
            [
                dict(
                    test_name="rate", control_model="a", treatment_model="b",
                    traffic_split=0.5, success_metric="fraud_detection_rate",
                    min_sample_size=100, significance_level=0.05,
                ),
                dict(
                    test_name="score", control_model="a", treatment_model="c",
                    traffic_split=0.3, success_metric="prediction_score",
                    min_sample_size=100, significance_level=0.05,
                ),
            ],
        )

        def _abeval():
            out = tempfile.mkdtemp(prefix="abeval_probe_")
            try:
                n_batches = 8
                w_exp = experiment_partial_writer(out, exps)
                w_eval = eval_partial_writer(
                    out, score_col="prediction", label_col="actual_fraud",
                    score_decimals=3,
                )
                t0 = time.time()
                for b in range(n_batches):
                    batch = res.filter(
                        F.pmod(F.col("transaction_id"), n_batches) == b
                    )
                    w_exp(batch, b)
                    w_eval(batch, b)
                t1 = time.time()
                roll = {
                    r["test_name"]: r
                    for r in experiment_rollup_view(spark, out).collect()
                }
                ev_roll = eval_rollup_view(spark, out).collect()[0]
                t2 = time.time()
                store_exp = spark.read.parquet(
                    out + "/experiment_partials"
                ).count()
                store_eval = spark.read.parquet(out + "/eval_partials").count()
                # the one-shot batch twin over the SAME union — must be
                # bit-identical to the moment-merge rollup
                batch_rows = {
                    r["test_name"]: r
                    for r in experiment_analysis(
                        assign_variants(res, exps), exps
                    ).collect()
                }
                law = all(
                    roll[k].asDict() == batch_rows[k].asDict()
                    for k in batch_rows
                )
                print(
                    f"abeval: results={n_res} batches={n_batches} "
                    f"write={t1 - t0:.1f}s rollup={t2 - t1:.1f}s "
                    f"store_exp_rows={store_exp} store_eval_rows={store_eval} "
                    f"auc={ev_roll['auc']:.6f} merge_law={'OK' if law else 'FAIL'}"
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)

        _guarded("abeval", _abeval)

    if "mmodal" in stages:
        # round-11: multimodal decode/feature throughput at replicated
        # payload scale. Laws under test: (1) the mapInPandas feature
        # stages are payload-volume-linear (Arrow batching — payload
        # bytes cross the boundary once, features come back columnar);
        # (2) a metadata-only aggregate over the same table NEVER reads
        # a payload byte (column pruning keeps `image` out of
        # ReadSchema), so it stays flat however fat the payloads get.
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators.multimodal import (
            audio_features,
            image_features,
        )
        from realtime_fraud_detection_spark.suite.multimodal_q import (
            multimodal_samples,
        )

        base = multimodal_samples(spark, SF_DIR)  # 192 samples, in-engine
        parts = []
        for r in range(replicas * 8):  # 8x denser base so 10x ≈ 15k rows
            parts.append(
                base.select(
                    (F.col("sample_id") + r * 100_000_000).alias("sample_id"),
                    "image", "image_meta", "audio", "audio_meta",
                )
            )
        mm = parts[0]
        for pp in parts[1:]:
            mm = mm.unionAll(pp)
        mm = mm.repartition(32)
        out = tempfile.mkdtemp(prefix="mmodal_probe_")
        try:
            # persist to parquet so the pruning claim is tested against a
            # real columnar scan, not an in-memory union
            mm.write.mode("overwrite").parquet(out)
            tbl = spark.read.parquet(out)
            n = tbl.count()
            payload_mb = (replicas * 8 * 192 * (128 + 64)) / 1e6

            def _mmodal():
                t0 = time.time()
                img = image_features(tbl)
                aud = audio_features(tbl)
                nf = img.join(aud, "sample_id").count()
                t1 = time.time()
                # metadata-only path: must not touch payload bytes
                meta = (
                    tbl.groupBy("image_meta.width")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                )
                plan = meta._jdf.queryExecution().executedPlan().toString()
                # ReadSchema prints name:type pairs (no #ids) on its own
                # line — "image:" appearing there means payload bytes
                # are being read; attribute lists with #ids precede it
                rs = plan.split("ReadSchema:")[-1].splitlines()[0]
                pruned = "image:" not in rs
                meta.collect()
                t2 = time.time()
                print(
                    f"mmodal: samples={n} payload_mb={payload_mb:.0f} "
                    f"features={t1 - t0:.1f}s rows={nf} "
                    f"meta_only={t2 - t1:.1f}s payload_pruned={pruned}"
                )

            _guarded("mmodal", _mmodal)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    if "sketch" in stages:
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators import (
            heavy_hitters as HH,
        )
        from realtime_fraud_detection_spark.operators import (
            quantile_sketch as QS,
        )
        from realtime_fraud_detection_spark.sources.testdata import load_table

        ev0 = load_table(spark, SF_DIR, "events", fan_out=True)
        parts = []
        for r in range(replicas):
            parts.append(
                ev0.select(
                    (F.col("event_id") + r * 100_000_000).alias("event_id"),
                    "ts",
                    # offset user ids so item cardinality grows with the
                    # data (a pure replica would keep the same heavy set)
                    (F.col("user_id") + r * 10_000_000).alias("user_id"),
                    "event_type",
                    (F.col("value") * (1.0 + r / 1000.0)).alias("value"),
                )
            )
        ev = parts[0]
        for p in parts[1:]:
            ev = ev.unionAll(p)
        ev = ev.repartition(max(8, replicas)).localCheckpoint()
        n_ev = ev.count()

        def _qsk():
            t0 = time.time()
            partials = QS.quantile_sketch_partials(
                ev, "ts", "value", alpha=0.01
            ).localCheckpoint()
            n_p = partials.count()
            day = QS.sketch_quantiles(
                QS.merge_quantile_sketch(partials, "day"),
                [0.5, 0.95, 0.99],
                ["day"],
            )
            n_d = day.count()
            print(
                f"ddsketch={time.time() - t0:.1f}s events={n_ev} "
                f"stored_rows={n_p} days={n_d}"
            )

        _guarded("ddsketch", _qsk)

        def _hh():
            # uniform ids have NO heavy hitters at scale (MG correctly
            # stores nothing once per-item counts fall under the cutoff)
            # — probe a skewed stream instead: half the mass on 16 hot
            # items, half on a long tail whose cardinality grows with
            # the data, so the guarantee (hot items survive every
            # rollup) is actually exercised
            skewed = ev.withColumn(
                "item",
                F.when(
                    F.col("user_id") % 2 == 0,
                    F.concat(F.lit("hot_"), F.col("user_id") % 16),
                ).otherwise(F.concat(F.lit("cold_"), F.col("user_id"))),
            )
            t0 = time.time()
            partials = HH.frequent_items_partials(
                skewed, "ts", "item", capacity=16
            ).localCheckpoint()
            n_p = partials.count()
            daily = HH.merge_frequent_items(partials, "day", capacity=16)
            n_d = daily.count()
            print(
                f"heavy_hitters={time.time() - t0:.1f}s events={n_ev} "
                f"stored_rows={n_p} daily_rows={n_d}"
            )

        _guarded("heavy_hitters", _hh)

        def _cm():
            # the CM grid saturates instead of growing: stored rows per
            # (hour) window are capped at d*w = 4096 however many events
            # land in the window (the replica-offset ids push cell
            # occupancy toward the cap as replicas grow)
            from realtime_fraud_detection_spark.operators import (
                count_min as CM,
            )

            t0 = time.time()
            partials = CM.cm_partials(
                ev, "user_id", ts_col="ts"
            ).localCheckpoint()
            n_p = partials.count()
            cap = (
                partials.groupBy("hour")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            probe = ev.select("user_id").distinct().filter(
                F.col("user_id") % 50 == 0
            )
            daily = CM.cm_estimate(
                CM.merge_cm(partials, "day").withColumnRenamed("day", "hour"),
                probe,
                "user_id",
                ["hour"],
            )
            n_d = daily.count()
            print(
                f"count_min={time.time() - t0:.1f}s events={n_ev} "
                f"stored_rows={n_p} max_cells_per_window={cap} "
                f"(bound 4096) probes={n_d}"
            )

        _guarded("count_min", _cm)

    if "mlprep" in stages:
        # The round-12 training-prep families over a replicated events
        # corpus (user-id offsets so category cardinality grows with the
        # data): PSI drift detail (bucket counts — ONE scan per side
        # after the r12 _proportions window fix) and out-of-fold target
        # encoding (ONE data-sized (cat, fold) agg, everything else
        # derives from the checkpointed per-fold table). Both must scale
        # like a plain aggregation — linear scan, bounded small frames.
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.ml.drift import (
            psi_numeric_detail,
        )
        from realtime_fraud_detection_spark.ml.encoding import target_encode
        from realtime_fraud_detection_spark.sources.testdata import load_table

        ev0 = load_table(spark, SF_DIR, "events", fan_out=True)
        parts = []
        for r in range(replicas):
            parts.append(
                ev0.select(
                    (F.col("event_id") + r * 100_000_000).alias("event_id"),
                    "ts",
                    (F.col("user_id") + r * 10_000_000).alias("user_id"),
                    "event_type",
                    (F.col("value") * (1.0 + r / 1000.0)).alias("value"),
                )
            )
        ev = parts[0]
        for p in parts[1:]:
            ev = ev.unionAll(p)
        ev = ev.repartition(max(8, replicas)).localCheckpoint()
        n_ev = ev.count()

        def _psi():
            t0 = time.time()
            base = ev.filter(F.col("event_id") % 2 == 0)
            cur = ev.filter(F.col("event_id") % 2 == 1)
            det = psi_numeric_detail(base, cur, "value", n_buckets=10)
            n_b = det.count()
            print(f"psi_detail={time.time() - t0:.1f}s events={n_ev} buckets={n_b}")

        _guarded("psi_detail", _psi)

        def _te():
            t0 = time.time()
            enc = target_encode(
                ev.select(
                    "event_id",
                    (F.col("user_id") % 100_003).alias("cat"),
                    (F.col("value") > 100).cast("int").alias("label"),
                ),
                "cat",
                "label",
                "event_id",
                n_folds=5,
            )
            n = enc.count()
            print(f"target_encode={time.time() - t0:.1f}s rows={n}")

        _guarded("target_encode", _te)

    if "hotkey" in stages:
        # The skewed-key shape the co-occurrence graph cap exists for: a
        # synthetic membership table where every id ALSO shares one
        # stopword key (the last-reducer bomb — u members emit u(u-1)/2
        # join rows on that single key before any filter runs). The
        # capped run must stay linear in ids; the uncapped run is only
        # attempted when its exact pair count is small enough to finish.
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators import graph as G

        n_ids = replicas * 5_000
        ids = spark.range(n_ids)
        mem = ids.select(
            F.col("id").alias("user"),
            (F.col("id") % max(n_ids // 20, 1)).alias("k"),  # ~20/key
        ).unionAll(ids.select(F.col("id").alias("user"), F.lit(-1).alias("k")))
        hot_pairs = n_ids * (n_ids - 1) // 2
        for cap in (1000, None):
            if cap is None and hot_pairs > 50_000_000:
                print(
                    f"hotkey uncapped: SKIPPED (hot key alone = "
                    f"{hot_pairs:,} pair rows — the bomb the cap defuses)"
                )
                continue
            t0 = time.time()
            edges, stats = G.shared_key_edges(
                mem, "user", "k", min_shared=1, max_bucket_size=cap
            )
            n_e = edges.count()
            print(
                f"hotkey cap={cap}: {time.time() - t0:.1f}s ids={n_ids} "
                f"edges={n_e} dropped_keys={stats['dropped_keys']} "
                f"est_pairs={stats['est_pairs']:,}"
            )

    if "layout" in stages:
        # Z-order layout at scale: rows grow with replicas, file count
        # grows with data (fixed ~rows-per-file target) — write time must
        # stay linear (one range shuffle + in-task sort) and the footer
        # skip RATE must hold as both grow. Two decorrelated uniform
        # dimensions, the worst case for any single-column sort.
        import glob

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators import layout as LY

        n_rows = replicas * 500_000
        n_files = max(replicas * 4, 8)
        df = spark.range(n_rows).select(
            (F.col("id") % 10_007).alias("a"),
            ((F.col("id") * 7919) % 10_007).alias("b"),
            F.col("id").alias("payload"),
        )
        path = "/tmp/spark_graft_scale_layout"
        t0 = time.time()
        LY.write_zordered(
            df, path, ["a", "b"], n_files=n_files,
            bounds={"a": (0, 10_006), "b": (0, 10_006)},
        )
        wall = time.time() - t0
        lo, hi = 4_000.0, 4_400.0  # ~4% box per dimension
        cands = 0
        files = sorted(glob.glob(f"{path}/*.parquet"))
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            j = names.index("b")
            stats = [
                md.row_group(g).column(j).statistics
                for g in range(md.num_row_groups)
            ]
            if any(s is None for s in stats):
                cands += 1  # stats-less row group: non-prunable, always read
                continue
            mn = min(s.min for s in stats)
            mx = max(s.max for s in stats)
            if mn <= hi and mx >= lo:
                cands += 1
        print(
            f"layout={wall:.1f}s rows={n_rows} files={len(files)} "
            f"b-box candidates={cands} ({cands / len(files):.0%} scanned)"
        )

    if "mixture" in stages:
        # token-budget mixture at replicas x 1M rows with an 80%-hot
        # domain — the skew case the bucket-offset prefix sum exists for.
        # naive1 = n_buckets=1 (the whole hot domain in ONE sort
        # partition); bucketed = the default 256-way decomposition. Both
        # produce identical selections (pinned in tests/test_token_budget);
        # the probe measures the wall-clock gap and that selected token
        # mass lands exactly at the minimal >=budget prefix.
        from pyspark.sql import functions as F

        from realtime_fraud_detection_spark.operators.sampling import (
            token_budget_sample,
        )

        n_rows = replicas * 1_000_000
        corpus = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 10 < 8, "web")
                .when(F.col("id") % 10 < 9, "code")
                .otherwise("wiki")
                .alias("domain"),
                (F.lit(200) + F.col("id") % 800).alias("tokens"),
            )
            .localCheckpoint(eager=True)
        )
        # budgets ~30% of each domain's token mass (mean 599.5 tok/doc)
        budgets = {
            "web": int(0.8 * n_rows * 600 * 0.3),
            "code": int(0.1 * n_rows * 600 * 0.3),
            "wiki": int(0.1 * n_rows * 600 * 0.3),
        }

        def _mix(label, n_buckets):
            t0 = time.time()
            picked = token_budget_sample(
                corpus, budgets, group_col="domain", token_col="tokens",
                id_col="doc_id", n_buckets=n_buckets,
            )
            got = {
                r["domain"]: (r["docs"], r["toks"])
                for r in picked.groupBy("domain")
                .agg(
                    F.count("*").alias("docs"), F.sum("tokens").alias("toks")
                )
                .collect()
            }
            wall = time.time() - t0
            overshoot = max(
                got[d][1] - budgets[d] for d in budgets if d in got
            )
            print(
                f"mixture_{label}={wall:.1f}s rows={n_rows} "
                + " ".join(f"{d}={got[d][0]}/{got[d][1]}" for d in sorted(got))
                + f" max_overshoot={overshoot}"
            )

        _guarded("mixture_bucketed", lambda: _mix("bucketed", 256))
        _guarded("mixture_naive1", lambda: _mix("naive1", 1))

    if "retrieval" in stages:
        # the retrieval-eval panel at growing corpus (VERDICT r12 item 5):
        # FIXED 32-query brute-force cosine top-10 + same-label truth +
        # retrieval_metrics over replicas x 100k synthetic 32-dim vectors
        # (50 labels, so the truth table grows linearly with the corpus).
        # The claim under test: candidates are cut to k BEFORE the truth
        # join, so the probe scales with the corpus SCAN (one broadcast-
        # query cosine pass + one linear truth count) — never with
        # |corpus| x |queries| pairings.
        from realtime_fraud_detection_spark.ml.evaluation import (
            retrieval_metrics,
        )
        from realtime_fraud_detection_spark.operators.similarity import (
            brute_force_topk,
        )
        from pyspark.sql import functions as F

        n_vec = replicas * 100_000

        def _remb():
            # (id+1): the id=0 vector would be all-zeros (sin 0) and its
            # zero norm trips ANSI DIVIDE_BY_ZERO in the cosine.
            # Labels are 50 CONTIGUOUS id blocks: the sin construction
            # makes id-proximal vectors cosine-similar, so same-block
            # neighbors are genuinely retrievable and the truth join has
            # non-degenerate hits (id % 50 gave recall exactly 0 — the
            # metric plumbing exercised nothing)
            return spark.range(n_vec).select(
                F.col("id").alias("vec_id"),
                (F.col("id") * 50 / n_vec).cast("long").alias("label"),
                F.array(
                    *[
                        F.sin((F.col("id") + 1) * float(0.1 + 0.017 * i))
                        for i in range(32)
                    ]
                ).alias("embedding"),
            )

        def _retrieval():
            emb = _remb()
            queries = emb.filter(F.col("vec_id") < 32)
            t0 = time.time()
            results = brute_force_topk(emb, queries, k=10).select(
                F.col("qid").alias("query_id"),
                F.col("nid").alias("doc_id"),
                "rank",
            )
            truth = (
                queries.select(F.col("vec_id").alias("query_id"), "label")
                .join(
                    emb.select(F.col("vec_id").alias("doc_id"), "label"),
                    "label",
                )
                .filter(F.col("query_id") != F.col("doc_id"))
                .select("query_id", "doc_id")
            )
            rows = retrieval_metrics(
                results, truth, k=10, rank_col="rank"
            ).collect()
            wall = time.time() - t0
            mean_rec = sum(r["recall_at_k"] for r in rows) / len(rows)
            mean_ndcg = sum(r["ndcg_at_k"] for r in rows) / len(rows)
            print(
                f"retrieval={wall:.1f}s corpus={n_vec} queries={len(rows)} "
                f"mean_recall@10={mean_rec:.6f} mean_ndcg@10={mean_ndcg:.6f}"
            )

        _guarded("retrieval", _retrieval)

    if "pca" in stages:
        # distributed PCA fit (the Arrow int64-partials path; local gate
        # forced off) + the projection scan, on replicas x 1M synthetic
        # 64-dim vectors generated scan-side (no materialization — the
        # probe measures the operator, not a checkpoint). SCALE.md holds
        # the 3-strategy comparison this path won.
        from realtime_fraud_detection_spark.operators import (
            similarity as SIMX,
        )
        from pyspark.sql import functions as F

        n_rows = replicas * 1_000_000

        def _vecs():
            return spark.range(n_rows).select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[
                        F.sin(F.col("id") * float(0.1 + 0.013 * i))
                        for i in range(64)
                    ]
                ).alias("embedding"),
            )

        def _pca():
            t0 = time.time()
            mean, comps = SIMX.pca_fit(_vecs(), k=16, local_cells=0)
            t_fit = time.time() - t0
            t0 = time.time()
            SIMX.pca_project(_vecs(), mean, comps).write.format(
                "noop"
            ).mode("overwrite").save()
            print(
                f"pca_fit={t_fit:.1f}s pca_project={time.time() - t0:.1f}s "
                f"rows={n_rows} dims=64 k=16"
            )

        _guarded("pca", _pca)

    spark.stop()


if __name__ == "__main__":
    main()
