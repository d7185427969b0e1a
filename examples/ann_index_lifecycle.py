#!/usr/bin/env python3
"""ANN index lifecycle demo — build once, persist, search from a "later
session", keep it fresh under streaming ingest:

  embeddings → train SQ8 grid + PQ codebooks + IVF centroids (model-sized)
             → persist parameters as JSON artifacts (functions/ann_io)
             → encode the corpus (int8 codes / PQ code bytes) → parquet
             → reload everything cold and serve top-k three ways
               (SQ8 asymmetric, PQ-ADC + exact re-rank, IVF-celled)
             → stream new vectors through the embedding ingest sink
               (persisted centroid store, cross-batch near-dup probe)
             → compact the vector store (small-file maintenance)

The point being demonstrated: every index's PARAMETERS are
model-sized JSON (they fold into later plans as literals), while every
CORPUS-sized derivative is an ordinary parquet table — so "the index"
needs no special storage engine, survives sessions, and the serving
query is a plain scan + broadcast probe at any scale.

Usage: python examples/ann_index_lifecycle.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions import ann_io
from realtime_fraud_detection_spark.operators import similarity as SIM
from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming import sinks as SK


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-index-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ann_demo_")
    t0 = time.time()

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    n = emb.count()

    # ---- build + persist the parameter artifacts -----------------------
    mins, scales = SIM.quantization_params(emb)
    ann_io.save_sq8_grid(mins, scales, f"{work}/sq8.json")
    books = SIM.pq_train(emb, m=8, ks=16)
    ann_io.save_pq_codebooks(books, f"{work}/pq.json")
    planes = SIM.make_planes(dim=64, n_planes=8)
    ann_io.save_lsh_planes(planes, f"{work}/planes.json")
    print(f"artifacts: sq8={os.path.getsize(f'{work}/sq8.json')}B "
          f"pq={os.path.getsize(f'{work}/pq.json')}B "
          f"planes={os.path.getsize(f'{work}/planes.json')}B "
          f"(model-sized, corpus={n} vectors)")

    # corpus-side derivatives are plain parquet
    SIM.quantize_embeddings(emb, mins, scales).write.mode("overwrite").parquet(
        f"{work}/codes_sq8"
    )
    SIM.pq_encode(emb, books).write.mode("overwrite").parquet(f"{work}/codes_pq")
    sq8_bytes = sum(
        os.path.getsize(os.path.join(f"{work}/codes_sq8", f))
        for f in os.listdir(f"{work}/codes_sq8") if f.endswith(".parquet")
    )
    pq_bytes = sum(
        os.path.getsize(os.path.join(f"{work}/codes_pq", f))
        for f in os.listdir(f"{work}/codes_pq") if f.endswith(".parquet")
    )
    print(f"stores: sq8={sq8_bytes//1024}KiB pq={pq_bytes//1024}KiB "
          f"(float corpus would be ~{n * 64 * 4 // 1024}KiB raw)")

    # ---- cold reload + serve -------------------------------------------
    lmins, lscales = ann_io.load_sq8_grid(f"{work}/sq8.json")
    assert (lmins, lscales) == (mins, scales)
    lbooks, _ = ann_io.load_pq_codebooks(f"{work}/pq.json")
    queries = emb.filter(F.col("vec_id") < 5)
    k = 3
    # serve from the LOADED artifacts — no retraining in the serving path
    i8 = SIM.int8_topk(emb, queries, k=k, params=(lmins, lscales))
    pq = SIM.pq_topk(emb, queries, k=k, rerank=20, codebooks=lbooks)
    ivf = SIM.ivf_pq_topk(emb, queries, k=k, n_cells=8, n_probe=4, rerank=20, by_residual=True)
    exact = SIM.brute_force_topk(emb, queries, k=k)
    ex = {(r["qid"], r["nid"]) for r in exact.collect()}
    for name, df in (("sq8", i8), ("pq+rerank", pq), ("ivf,pq(res)+rerank", ivf)):
        got = {(r["qid"], r["nid"]) for r in df.collect()}
        print(f"search {name:18s} recall@{k} vs exact: {len(ex & got)/len(ex):.2f}")

    # ---- streaming ingest keeps the store fresh ------------------------
    ingest = f"{work}/ingest"
    writer = SK.embedding_ingest_writer(ingest, n_cells=8, threshold=0.95)
    writer(emb.limit(200), 0)
    near_dup_batch = emb.limit(50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    writer(near_dup_batch, 1)
    dups = spark.read.parquet(f"{ingest}/near_dups").filter("batch_id = 1").count()
    print(f"streaming ingest: batch-2 vectors flagged against stored corpus: {dups}")
    n_compact = SK.compact_store(spark, f"{ingest}/vectors", max_batch_id=1)
    print(f"vector store compacted: {n_compact} rows in one generation")

    print(f"wall clock           {time.time() - t0:.1f}s")
    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
