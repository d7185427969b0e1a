"""Multimodal feature-extraction query — the driver-visible face of
operators/multimodal.py (binary payload columns + typed metadata +
Arrow-batched mapInPandas decode stages; reference intent: the
bert_text_analyzer's multimodal ambitions, SURVEY §2.8 M7-adjacent).

Rows-only: the decode hooks are seeded deterministic fakes in this
container (PIL/ffmpeg absent — operators/multimodal.py docstring), so
there is no SQL twin; cross-session bit-determinism is covered by
tools/check_determinism.py and the payload-pruning / batch-shape laws by
tests/test_multimodal.py. The payloads here are derived IN-ENGINE from
the events fixture (md5-chained bytes keyed by event_id), so the same
(sf_dir, query) always sees identical binary inputs — the Spark-side
plumbing (schema, Arrow batching, payload pruning) is real; only the
pixel/sample decode is the documented deterministic stand-in.

Scale design: feature extraction runs BEFORE any join/shuffle — the fat
binary columns are born and die inside the four mapInPandas stages
(image, audio, video frame sampling, per-frame features); only small
per-sample feature rows move, and the video pool re-aggregates FEATURE
rows, never frames. The per-sample cap keeps the suite
entry fixture-sized; production would run the same stages over a real
payload table partitioned by sample ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    audio_features,
    image_features,
    sample_video_frames,
)
from ..sources.testdata import load_table

_N_SAMPLES = 192


def _payload(seed_col, n_blocks: int = 8):
    """`n_blocks`·16 deterministic bytes, md5-chained from the seed column
    entirely in-engine (no Python crossing for payload synthesis)."""
    seed = F.md5(seed_col.cast("string"))
    return F.unhex(
        F.concat(*[F.md5(F.concat(seed, F.lit(f":{i}"))) for i in range(n_blocks)])
    )


def multimodal_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = (
        ev.select("event_id")
        .orderBy("event_id")
        .limit(_N_SAMPLES)
    )
    return base.select(
        F.col("event_id").alias("sample_id"),
        _payload(F.concat(F.lit("img:"), F.col("event_id"))).alias("image"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.lit(32) + (F.col("event_id") % 3).cast("int") * 16).alias("width"),
            F.lit(32).alias("height"),
        ).alias("image_meta"),
        _payload(F.concat(F.lit("aud:"), F.col("event_id")), 4).alias("audio"),
        F.struct(
            F.lit("fake").alias("codec"),
            F.lit(8000).alias("sample_rate"),
            F.lit(250).alias("duration_ms"),
        ).alias("audio_meta"),
        _payload(F.concat(F.lit("vid:"), F.col("event_id")), 2).alias("video"),
        F.struct(
            F.lit("fake").alias("codec"),
            F.lit(30.0).alias("fps"),
            (F.lit(60) + (F.col("event_id") % 2).cast("int") * 30).alias("n_frames"),
        ).alias("video_meta"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    samples = multimodal_samples(spark, sf_dir)
    img = image_features(samples)
    aud = audio_features(samples)
    # video: sample every 30th frame, decode-extract per frame (the frame
    # rows reuse the IMAGE feature kernel), pool back to one row/sample —
    # the frame fan-out and the pooled re-aggregation both happen on
    # small feature rows, never on payload bytes
    frames = sample_video_frames(samples, every_n=30).select(
        F.col("sample_id"),
        F.col("frame_index"),
        F.col("frame").alias("image"),
        F.col("frame_meta").alias("image_meta"),
    )
    vid = (
        image_features(
            frames.select(
                # unique id per frame for the kernel, recoverable sample id
                (F.col("sample_id") * 1000 + F.col("frame_index")).alias("sample_id"),
                "image",
                "image_meta",
            )
        )
        .select(
            # integer div: exact for every long (double division loses
            # exactness above ~9e12 and the truncating cast would pool
            # frames into a neighboring sample); the *1000 encode needs
            # ids < 2^63/1000 and RAISES loudly under ANSI beyond that
            F.expr("sample_id div 1000").alias("sample_id"),
            "brightness",
            "contrast",
        )
        .groupBy("sample_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_sampled"),
            # decimal sums: the frame pool must be order-free (suite
            # determinism rule) — float avg would associate by partition
            (
                F.sum(F.col("brightness").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("frame_brightness"),
            (
                F.sum(F.col("contrast").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("frame_contrast"),
        )
    )
    return img.join(aud, "sample_id").join(vid, "sample_id").orderBy("sample_id")


QUERIES = {"multimodal_features": q_multimodal_features}
ORACLES: dict[str, str] = {}
