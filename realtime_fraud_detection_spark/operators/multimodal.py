"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, processed by Arrow-batched mapInPandas stages.

Scale design (the part that matters at 100 TB):
  * Binary payloads ride in `binary` columns next to a typed metadata struct
    — queries that only touch metadata never deserialize a byte (column
    pruning keeps the payload out of ReadSchema entirely).
  * Decode/feature-extract run as mapInPandas over Arrow record batches, so
    payload bytes cross the JVM↔Python boundary once, batched, and features
    come back columnar.
  * Feature extraction happens BEFORE any shuffle: the expensive/fat column
    is projected away at the scan side and only small feature vectors move.

Codec reality: the actual pixel/sample decoders (PIL/ffmpeg/librosa) are not
in this container. Each stage calls a `_decode_*` hook that tries the real
library and otherwise produces a DETERMINISTIC FAKE (seeded from the payload
bytes) clearly marked below — the Spark-side plumbing (schemas, batch
iteration, partitioning, UDF signatures) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)
AUDIO_META = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)
VIDEO_META = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _rng_from_bytes(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return np.random.default_rng(seed)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Return an (h, w, 3) uint8 array. Real decode via PIL when available;
    otherwise a DETERMINISTIC FAKE seeded from the payload (same bytes →
    same pixels, so downstream tests are exact)."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception:
        rng = _rng_from_bytes(payload)
        return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


def _decode_audio(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """float32 mono samples. Real decode would use soundfile/librosa;
    DETERMINISTIC FAKE here (seeded sine mixture)."""
    n = max(1, int(sample_rate * duration_ms / 1000))
    rng = _rng_from_bytes(payload)
    t = np.arange(n, dtype=np.float32) / sample_rate
    freqs = rng.uniform(80, 2000, 3).astype(np.float32)
    amps = rng.uniform(0.1, 0.5, 3).astype(np.float32)
    return (amps[:, None] * np.sin(2 * np.pi * freqs[:, None] * t[None, :])).sum(axis=0)


IMAGE_FEATURES = T.StructType(
    [
        T.StructField("sample_id", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("brightness", T.DoubleType()),
        T.StructField("contrast", T.DoubleType()),
        T.StructField("aspect_ratio", T.DoubleType()),
        T.StructField("thumb_8x8_mean", T.ArrayType(T.DoubleType())),
    ]
)


def image_features(df: DataFrame, id_col: str = "sample_id") -> DataFrame:
    """Decode → per-channel stats + 8×8 average-pooled thumbnail signature.

    One mapInPandas stage; the binary column never survives past it.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload, meta in zip(pdf[id_col], pdf["image"], pdf["image_meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode_image(bytes(payload), w, h).astype(np.float64)
                pooled = _avg_pool(img.mean(axis=2), 8)
                rows.append(
                    {
                        "sample_id": sid,
                        "mean_r": img[:, :, 0].mean(),
                        "mean_g": img[:, :, 1].mean(),
                        "mean_b": img[:, :, 2].mean(),
                        "brightness": img.mean(),
                        "contrast": img.std(),
                        "aspect_ratio": w / h,
                        "thumb_8x8_mean": pooled.ravel().tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "image", "image_meta").mapInPandas(extract, IMAGE_FEATURES)


def _avg_pool(gray: np.ndarray, k: int) -> np.ndarray:
    h, w = gray.shape
    ys = np.linspace(0, h, k + 1).astype(int)
    xs = np.linspace(0, w, k + 1).astype(int)
    out = np.empty((k, k))
    for i in range(k):
        for j in range(k):
            out[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    return out


RESIZED = T.StructType(
    [
        T.StructField("sample_id", T.LongType()),
        T.StructField("image", T.BinaryType()),
        T.StructField("image_meta", IMAGE_META),
    ]
)


def resize_images(df: DataFrame, target_w: int, target_h: int, id_col: str = "sample_id") -> DataFrame:
    """Nearest-neighbor resize, payload→payload (raw RGB bytes out). The
    metadata struct is rewritten so downstream stages trust it."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload, meta in zip(pdf[id_col], pdf["image"], pdf["image_meta"]):
                img = _decode_image(bytes(payload), int(meta["width"]), int(meta["height"]))
                yi = (np.arange(target_h) * img.shape[0] // target_h).clip(0, img.shape[0] - 1)
                xi = (np.arange(target_w) * img.shape[1] // target_w).clip(0, img.shape[1] - 1)
                resized = img[yi][:, xi]
                rows.append(
                    {
                        "sample_id": sid,
                        "image": resized.tobytes(),
                        "image_meta": {"format": "raw_rgb", "width": target_w, "height": target_h},
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "image", "image_meta").mapInPandas(resize, RESIZED)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("sample_id", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("spectral_centroid", T.DoubleType()),
        T.StructField("band_energy", T.ArrayType(T.DoubleType())),
    ]
)


def audio_features(df: DataFrame, id_col: str = "sample_id", n_bands: int = 8) -> DataFrame:
    """RMS / ZCR / spectral centroid / 8-band FFT energies per clip."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload, meta in zip(pdf[id_col], pdf["audio"], pdf["audio_meta"]):
                x = _decode_audio(bytes(payload), int(meta["sample_rate"]), int(meta["duration_ms"]))
                spec = np.abs(np.fft.rfft(x.astype(np.float64)))
                freqs = np.fft.rfftfreq(len(x), 1.0 / meta["sample_rate"])
                bands = np.array_split(spec**2, n_bands)
                rows.append(
                    {
                        "sample_id": sid,
                        "rms": float(np.sqrt((x.astype(np.float64) ** 2).mean())),
                        "zero_crossing_rate": float((np.diff(np.signbit(x)) != 0).mean()),
                        "spectral_centroid": float((freqs * spec).sum() / max(spec.sum(), 1e-12)),
                        "band_energy": [float(b.sum()) for b in bands],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "audio", "audio_meta").mapInPandas(extract, AUDIO_FEATURES)


FRAME_SAMPLE = T.StructType(
    [
        T.StructField("sample_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_meta", IMAGE_META),
    ]
)


def sample_video_frames(
    df: DataFrame, every_n: int = 30, id_col: str = "sample_id",
    frame_w: int = 64, frame_h: int = 64,
) -> DataFrame:
    """Video → one row per sampled frame (every `every_n`-th), fanning a clip
    out into image rows that feed `image_features`/`resize_images`.

    Real frame extraction would be ffmpeg-backed; the frame payload here is a
    DETERMINISTIC FAKE derived from (video bytes, frame index).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload, meta in zip(pdf[id_col], pdf["video"], pdf["video_meta"]):
                for idx in range(0, int(meta["n_frames"]), every_n):
                    frame_seed = bytes(payload) + struct.pack("<i", idx)
                    frame = _decode_image(frame_seed, frame_w, frame_h)
                    rows.append(
                        {
                            "sample_id": sid,
                            "frame_index": idx,
                            "frame": frame.tobytes(),
                            "frame_meta": {"format": "raw_rgb", "width": frame_w, "height": frame_h},
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "video", "video_meta").mapInPandas(sample, FRAME_SAMPLE)


IMAGE_EMBEDDING = T.StructType(
    [
        T.StructField("sample_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def image_embeddings(
    df: DataFrame, id_col: str = "sample_id", k: int = 8, center: bool = False
) -> DataFrame:
    """Image → 64-dim embedding (k×k average-pooled grayscale, L2-normalized)
    — the bridge from multimodal decode to the similarity-search operators
    (operators/similarity.py): dedupe or nearest-neighbor images exactly
    like text embeddings. A real model swaps into the same mapInPandas slot.

    `center=True` subtracts each vector's own mean before normalizing:
    raw pooled-grayscale vectors share a dominant brightness component
    (ANY two images land at cosine ≈ 0.99), so cosine over the raw form
    measures exposure, not structure — duplicates stay at 1.0 under
    centering while unrelated images drop to ~N(0, Θ(1/√(k²))). Use it
    whenever the embeddings feed a cosine-threshold stage (near-dup,
    SemDeDup, ANN).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload, meta in zip(pdf[id_col], pdf["image"], pdf["image_meta"]):
                img = _decode_image(bytes(payload), int(meta["width"]), int(meta["height"]))
                pooled = _avg_pool(img.astype(np.float64).mean(axis=2), k).ravel()
                if center:
                    pooled = pooled - pooled.mean()
                norm = np.linalg.norm(pooled)
                rows.append(
                    {
                        "sample_id": sid,
                        "embedding": (pooled / max(norm, 1e-12)).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "image", "image_meta").mapInPandas(extract, IMAGE_EMBEDDING)


def synthetic_multimodal(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic multimodal fixture: binary payloads + typed metadata.
    Payload bytes are md5-chained from (seed, id) so every stage downstream
    is reproducible."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"{seed}:{i}".encode()).digest() * 8
        rows.append(
            {
                "sample_id": i,
                "image": payload,
                "image_meta": {"format": "fake", "width": 32 + (i % 3) * 16, "height": 32},
                "audio": payload[:64],
                "audio_meta": {"codec": "fake", "sample_rate": 8000, "duration_ms": 250},
                "video": payload[:32],
                "video_meta": {"codec": "fake", "fps": 30.0, "n_frames": 90},
            }
        )
    schema = T.StructType(
        [
            T.StructField("sample_id", T.LongType()),
            T.StructField("image", T.BinaryType()),
            T.StructField("image_meta", IMAGE_META),
            T.StructField("audio", T.BinaryType()),
            T.StructField("audio_meta", AUDIO_META),
            T.StructField("video", T.BinaryType()),
            T.StructField("video_meta", VIDEO_META),
        ]
    )
    return spark.createDataFrame(rows, schema)
