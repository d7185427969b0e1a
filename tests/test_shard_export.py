"""write_training_shards layout guarantees: one file per shard dir, whole
sequences per file, in-file ordering, deterministic shard membership."""

from __future__ import annotations

import glob
import os

import pytest

from realtime_fraud_detection_spark.operators import sampling as SA


@pytest.fixture(scope="module")
def packed(spark):
    rows = [
        (i, "en" if i % 3 else "de", 40 + (i * 7) % 25) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, tokens int")
    return SA.pack_sequences(df, "doc_id", "tokens", budget=100, stratum_col="lang")


def _data_files(d):
    return [
        f
        for f in glob.glob(os.path.join(d, "*"))
        if os.path.basename(f)[0] not in "._"
    ]


def test_parquet_shards_layout(spark, tmp_path, packed):
    path = str(tmp_path / "shards")
    SA.write_training_shards(
        packed, path, stratum_col="lang", seqs_per_shard=2
    )
    back = spark.read.parquet(path)
    assert back.count() == packed.count()
    # shard membership is the deterministic formula
    assert (
        back.filter("shard_id != floor(seq_id / 2)").count() == 0
    )
    for d in glob.glob(os.path.join(path, "lang=*", "shard_id=*")):
        files = _data_files(d)
        assert len(files) == 1, d  # one data file per shard dir
    # a sequence never spans shard dirs: (lang, seq_id) -> 1 shard
    from pyspark.sql import functions as F

    spread = (
        back.groupBy("lang", "seq_id")
        .agg(F.countDistinct("shard_id").alias("n"))
        .filter("n > 1")
    )
    assert spread.count() == 0


def test_jsonl_shards_roundtrip_and_order(spark, tmp_path, packed):
    import json

    path = str(tmp_path / "jshards")
    SA.write_training_shards(
        packed, path, stratum_col="lang", seqs_per_shard=2, fmt="json"
    )
    back = spark.read.json(path)
    assert back.count() == packed.count()
    # in-file order: each JSONL file is sorted by (seq_id, offset)
    for f in glob.glob(os.path.join(path, "lang=*", "shard_id=*", "part-*")):
        rows = [json.loads(l) for l in open(f) if l.strip()]
        keys = [(r["seq_id"], r["offset"]) for r in rows]
        assert keys == sorted(keys), f


def test_unknown_format_raises(packed, tmp_path):
    with pytest.raises(ValueError, match="format"):
        SA.write_training_shards(packed, str(tmp_path / "x"), fmt="csv")
