"""Incremental search-index maintenance (streaming/sinks.search_index_writer
/ search_index_view): the streamed doc-term store equals a batch
doc_term_table bit-exactly, BM25 over the incremental index equals a
from-scratch batch ranking, and replays are idempotent. The indexed corpus
is never re-tokenized — each batch lands only its own terms."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.corpus import (
    bm25_rank,
    doc_term_table,
)
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.streaming.sinks import (
    search_index_view,
    search_index_writer,
)
from tests.conftest import SF_SMOKE


def _queries(docs):
    return docs.filter("doc_id % 97 = 0").selectExpr(
        "doc_id AS q_id",
        "concat_ws(' ', slice(split(trim(regexp_replace(lower(text), "
        "'[^a-z0-9]+', ' ')), ' '), 1, 4)) AS query",
    )


def _rank_rows(docs, dt):
    return {
        tuple(r)
        for r in bm25_rank(docs, _queries(docs), top_k=5, dt=dt).collect()
    }


def test_incremental_index_serves_identical_bm25(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)
    out = str(tmp_path / "out")

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(search_index_writer(out))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    view = search_index_view(spark, out)
    # the stored doc-term rows are bit-identical to a batch tokenize
    # (each doc lives in exactly one batch partition; counts are exact)
    streamed_rows = {tuple(r) for r in view.collect()}
    batch_dt = doc_term_table(docs, "text", "doc_id")
    assert streamed_rows == {tuple(r) for r in batch_dt.collect()}

    # ...so BM25 (N, avgdl, df derived from the store) matches a
    # from-scratch batch ranking exactly, scores included
    assert _rank_rows(docs, view) == _rank_rows(docs, batch_dt)


def test_replay_is_idempotent(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    out = str(tmp_path / "out")
    writer = search_index_writer(out)
    half = docs.filter("doc_id % 2 = 0")
    rest = docs.filter("doc_id % 2 = 1")
    writer(half, 0)
    writer(rest, 1)
    before = {tuple(r) for r in search_index_view(spark, out).collect()}
    writer(rest, 1)  # redelivery of batch 1 overwrites its own partition
    after = {tuple(r) for r in search_index_view(spark, out).collect()}
    assert before == after
    assert before == {
        tuple(r) for r in doc_term_table(docs, "text", "doc_id").collect()
    }
