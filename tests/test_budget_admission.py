"""Budget-capped streaming admission (streaming/sinks.budget_admission_*):
arrival-order admission up to per-group token budgets, the one-document
overshoot law, exhaustion, idempotent replay, and the assembled stream."""

from __future__ import annotations

import time

from realtime_fraud_detection_spark.streaming import sinks as SK

BUDGETS = {"en": 1000, "de": 10000}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, tokens long")


def _b1(spark):
    # en: 600 tokens (under budget); de: 500; fr unlisted
    return _batch(
        spark,
        [(i, "en", 200) for i in range(3)]
        + [(10 + i, "de", 250) for i in range(2)]
        + [(20, "fr", 999)],
    )


def _b2(spark):
    # en: 900 more tokens -> crosses the 1000 budget mid-batch
    return _batch(
        spark,
        [(100 + i, "en", 300) for i in range(3)]
        + [(110, "de", 250)],
    )


def _b3(spark):
    return _batch(spark, [(200, "en", 50), (201, "de", 250)])


def _admitted(spark, out_dir):
    rows = spark.read.parquet(f"{out_dir}/admitted").collect()
    per_group: dict[str, int] = {}
    ids = set()
    for r in rows:
        per_group[r.lang] = per_group.get(r.lang, 0) + r.tokens
        ids.add(r.doc_id)
    return per_group, ids


def test_admits_arrival_order_until_budget(spark, tmp_path):
    out_dir = str(tmp_path / "mix")
    writer = SK.budget_admission_writer(out_dir, BUDGETS)
    writer(_b1(spark), 0)
    toks, ids = _admitted(spark, out_dir)
    # batch 1 fits every listed group's budget -> admitted IN FULL
    # (arrival order, not global hash order), unlisted group dropped
    assert toks == {"en": 600, "de": 500}
    assert ids == {0, 1, 2, 10, 11}

    writer(_b2(spark), 1)
    toks, ids = _admitted(spark, out_dir)
    # en remaining was 400 -> minimal prefix of batch 2's en docs crosses
    # it with exactly 2 docs (300 + 300); overshoot < one doc
    assert toks["en"] == 1200
    assert toks["en"] - BUDGETS["en"] < 300
    assert toks["de"] == 750

    writer(_b3(spark), 2)
    toks, ids = _admitted(spark, out_dir)
    assert toks["en"] == 1200  # exhausted: batch 3 admits no en rows
    assert 200 not in ids
    assert 201 in ids  # de still under budget


def test_replay_is_idempotent(spark, tmp_path):
    out_dir = str(tmp_path / "mix")
    writer = SK.budget_admission_writer(out_dir, BUDGETS)
    writer(_b1(spark), 0)
    writer(_b1(spark), 0)  # crash-replay: same batch id
    toks, ids = _admitted(spark, out_dir)
    assert toks == {"en": 600, "de": 500}
    writer(_b2(spark), 1)
    toks, _ = _admitted(spark, out_dir)
    # replay did not double-count batch 0's tally: en remaining was still
    # 400, so batch 1 admits two docs, not zero
    assert toks["en"] == 1200


def test_assembled_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    _b1(spark).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtime -> second micro-batch
    _b2(spark).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, lang string, tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "mix")
    q = SK.run_budget_admission_stream(
        stream, out_dir, str(tmp_path / "ck"), BUDGETS
    )
    q.awaitTermination(180)  # stateless foreachBatch: availableNow terminates
    toks, ids = _admitted(spark, out_dir)
    assert toks["de"] == 750
    assert toks["en"] in (1200,)  # same crossing law as the direct writer
    assert 20 not in ids
