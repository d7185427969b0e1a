#!/usr/bin/env python3
"""Multimodal curation demo — the binary-column operators end to end:

  payload table (image + audio + video binary columns, typed metadata)
    → metadata-only census (payload bytes NEVER read — column pruning)
    → image features (mapInPandas decode → per-channel stats + thumbnail)
    → audio features (RMS / ZCR / spectral centroid / band energies)
    → video → sampled frames → frame features pooled per clip
    → image embeddings (pooled-grayscale vectors, L2-normalized)
    → embedding near-dup pairs → connected components → survivors
    → resize the survivors' images for the training shard

The deliberate shape (operators/multimodal.py, SCALE.md "multimodal"
table): every feature stage is a single Arrow-batched mapInPandas whose
binary input dies inside it; everything downstream of the kernels moves
only small feature/embedding rows. The decode hooks are seeded
deterministic fakes in this container (no PIL/ffmpeg) — the pipeline
topology, schemas, pruning, and dedup math are the real thing.

Usage: python examples/multimodal_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import multimodal as MM
from realtime_fraud_detection_spark.operators.dedup import (
    embedding_near_dup_pairs,
)
from realtime_fraud_detection_spark.operators.clustering import (
    connected_components,
)
from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.suite.multimodal_q import _payload


def _payload_table(spark, sf_dir: str, n: int = 192, n_distinct: int = 150):
    """Payload table with PLANTED duplicates: the payload seed is
    sample_id % n_distinct, so the last n − n_distinct samples are exact
    byte-duplicates of early ones — the ground truth the dedup stage
    must find (and nothing else: distinct fake payloads decode to
    independent pixels, whose centered-cosine is ~N(0, 8/64))."""
    ev = load_table(spark, sf_dir, "events").select("event_id").orderBy("event_id").limit(n)
    s = F.pmod(F.col("event_id"), F.lit(n_distinct))
    return ev.select(
        F.col("event_id").alias("sample_id"),
        _payload(F.concat(F.lit("img:"), s)).alias("image"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.lit(32) + (s % 3).cast("int") * 16).alias("width"),
            F.lit(32).alias("height"),
        ).alias("image_meta"),
        _payload(F.concat(F.lit("aud:"), s), 4).alias("audio"),
        F.struct(
            F.lit("fake").alias("codec"),
            F.lit(8000).alias("sample_rate"),
            F.lit(250).alias("duration_ms"),
        ).alias("audio_meta"),
        _payload(F.concat(F.lit("vid:"), s), 2).alias("video"),
        F.struct(
            F.lit("fake").alias("codec"),
            F.lit(30.0).alias("fps"),
            (F.lit(60) + (s % 2).cast("int") * 30).alias("n_frames"),
        ).alias("video_meta"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    # 0. the payload table — in-engine deterministic payloads with 42
    # planted exact-duplicate images (a real pipeline reads a parquet/
    # lakehouse payload table; the binary columns and metadata structs
    # are exactly this shape)
    samples = _payload_table(spark, sf_dir).localCheckpoint()
    n = samples.count()
    print(f"payload table: {n} samples")

    # 1. metadata-only census: width histogram without touching a byte
    census = (
        samples.groupBy(F.col("image_meta.width").alias("width"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("width")
        .collect()
    )
    print("width census:", {r["width"]: r["cnt"] for r in census})

    # 2-3. image + audio features (one Arrow kernel each)
    img = MM.image_features(samples)
    aud = MM.audio_features(samples)

    # 4. video → every-30th frame → frame features pooled per clip
    frames = MM.sample_video_frames(samples, every_n=30).select(
        F.col("sample_id"),
        F.col("frame_index"),
        F.col("frame").alias("image"),
        F.col("frame_meta").alias("image_meta"),
    )
    n_frames = frames.count()
    panel = img.join(aud, "sample_id")
    print(f"features: {panel.count()} sample rows, {n_frames} video frames")

    # 5. embeddings → near-dup pairs → components → survivors.
    # center=True: raw pooled-grayscale vectors share a dominant
    # brightness component (unrelated images at cosine ≈ 0.99); centered
    # cosine measures structure — duplicates stay at 1.0, unrelated
    # pairs drop to ~0.1 (the image_embeddings docstring).
    emb = MM.image_embeddings(samples, center=True).select(
        F.col("sample_id").alias("vec_id"),
        F.lit(0).alias("label"),  # one block: the fixture is tiny
        F.col("embedding"),
    )
    pairs = embedding_near_dup_pairs(emb, threshold=0.9)
    n_pairs = pairs.count()
    comp = connected_components(
        pairs.select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        ),
        vertices=emb.select(F.col("vec_id").alias("doc_id")),
        vertex_col="doc_id",
    )
    survivors = comp.groupBy("cluster").agg(F.min("doc").alias("keep"))
    n_keep = survivors.count()
    print(f"near-dup pairs: {n_pairs}; survivors: {n_keep}/{n}")

    # 6. resize the survivors for the training shard (payload → payload)
    kept = samples.join(
        F.broadcast(survivors.select(F.col("keep").alias("sample_id"))),
        "sample_id",
    )
    shard = MM.resize_images(kept, 64, 64)
    n_shard = shard.count()
    w = shard.select(F.col("image_meta.width")).first()[0]
    print(f"training shard: {n_shard} images resized to {w}x64")
    print(f"done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
