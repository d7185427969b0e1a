"""Multimodal-column tests: schema/batch plumbing, determinism of the fake
decode, metadata-only pruning (the binary payload must not be read when only
metadata is queried)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import multimodal as MM
from realtime_fraud_detection_spark.plans.explain import read_schema_columns


def test_image_features_shape_and_determinism(spark):
    df = MM.synthetic_multimodal(spark, n=24)
    out1 = MM.image_features(df).toPandas().sort_values("sample_id").reset_index(drop=True)
    out2 = MM.image_features(df).toPandas().sort_values("sample_id").reset_index(drop=True)
    assert len(out1) == 24
    assert (out1["brightness"] == out2["brightness"]).all()  # same bytes → same pixels
    assert all(len(t) == 64 for t in out1["thumb_8x8_mean"])
    assert ((out1["mean_r"] >= 0) & (out1["mean_r"] <= 255)).all()
    # aspect ratio reflects metadata widths 32/48/64 over height 32
    assert set(np.round(out1["aspect_ratio"], 2)) == {1.0, 1.5, 2.0}


def test_resize_rewrites_payload_and_meta(spark):
    df = MM.synthetic_multimodal(spark, n=6)
    out = MM.resize_images(df, 16, 16).toPandas()
    assert (out["image"].map(len) == 16 * 16 * 3).all()
    meta = out["image_meta"].iloc[0]
    assert meta["width"] == 16 and meta["height"] == 16 and meta["format"] == "raw_rgb"


def test_audio_features(spark):
    df = MM.synthetic_multimodal(spark, n=8)
    out = MM.audio_features(df).toPandas()
    assert len(out) == 8
    assert (out["rms"] > 0).all()
    assert ((out["zero_crossing_rate"] >= 0) & (out["zero_crossing_rate"] <= 1)).all()
    assert all(len(b) == 8 for b in out["band_energy"])
    assert (out["spectral_centroid"] > 0).all()


def test_video_frame_sampling_fanout(spark):
    df = MM.synthetic_multimodal(spark, n=4)
    frames = MM.sample_video_frames(df, every_n=30)
    pdf = frames.toPandas()
    assert len(pdf) == 4 * 3  # 90 frames / every 30 → indices 0,30,60
    assert set(pdf["frame_index"]) == {0, 30, 60}
    # sampled frames feed the image pipeline
    as_images = frames.select(
        "sample_id", F.col("frame").alias("image"), F.col("frame_meta").alias("image_meta")
    )
    feats = MM.image_features(as_images).toPandas()
    assert len(feats) == 12


def test_image_embeddings_feed_ann(spark):
    """Multimodal → similarity-search integration: image embeddings are
    first-class vectors for the ANN operators."""
    from realtime_fraud_detection_spark.operators.similarity import brute_force_topk

    df = MM.synthetic_multimodal(spark, n=30)
    emb = MM.image_embeddings(df).withColumnRenamed("sample_id", "vec_id")
    out1 = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    out2 = MM.image_embeddings(df).withColumnRenamed("sample_id", "vec_id").toPandas().sort_values("vec_id").reset_index(drop=True)
    assert all(len(v) == 64 for v in out1["embedding"])
    assert all((a == b).all() for a, b in zip(out1["embedding"], out2["embedding"]))
    nn = brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=4)
    pdf = nn.toPandas()
    assert len(pdf) == 12
    assert ((pdf["cosine_sim"] >= -1.000001) & (pdf["cosine_sim"] <= 1.000001)).all()


def test_centered_embeddings_separate_duplicates_from_brightness(spark):
    """center=True makes cosine measure structure, not exposure: raw
    pooled-grayscale vectors put UNRELATED images at cosine ≈ 0.99 (the
    shared brightness component), useless under any near-dup threshold;
    centered, byte-duplicate images stay at exactly 1.0 while unrelated
    ones fall well below 0.9."""
    import numpy as np

    df = MM.synthetic_multimodal(spark, n=20)
    # plant one exact duplicate: sample 19's payload = sample 0's
    dup = df.filter(F.col("sample_id") == 0).select(
        F.lit(19).cast("long").alias("sample_id"),
        "image", "image_meta", "audio", "audio_meta", "video", "video_meta",
    )
    planted = df.filter(F.col("sample_id") < 19).unionByName(dup)

    def cos_matrix(emb_df):
        pdf = emb_df.toPandas().sort_values("sample_id")
        mat = np.array([np.array(v) for v in pdf["embedding"]])
        return mat @ mat.T

    raw = cos_matrix(MM.image_embeddings(planted))
    cen = cos_matrix(MM.image_embeddings(planted, center=True))
    off_raw = raw[np.triu_indices(20, 1)]
    assert off_raw.min() > 0.9  # raw: everything looks like a near-dup
    assert cen[0, 19] > 0.999999  # duplicate survives centering at 1.0
    cen_unrelated = [cen[i, j] for i, j in zip(*np.triu_indices(20, 1))
                     if not (i == 0 and j == 19)]
    assert max(cen_unrelated) < 0.9  # unrelated pairs drop out


def test_metadata_query_prunes_binary_payload(spark, tmp_path):
    """The 100 TB property: a metadata-only query reads zero payload bytes —
    the binary column must be absent from the parquet ReadSchema."""
    df = MM.synthetic_multimodal(spark, n=8)
    path = str(tmp_path / "mm.parquet")
    df.write.parquet(path)
    meta_only = spark.read.parquet(path).select("sample_id", "image_meta.width").filter(
        F.col("width") > 32
    )
    cols = read_schema_columns(meta_only)
    assert "image" not in cols and "audio" not in cols and "video" not in cols
    assert meta_only.count() > 0
