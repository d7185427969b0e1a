"""Streaming sequence features (streaming/stateful.sequence_feature_stream):
the strongest stream==batch law in the repo — the streamed features must
equal the JVM batch operator (ml/sequential.lagged_sequence_features)
BIT-exactly, which crosses engines (Python decimal replay of Spark's
shortest-repr decimal casts and HALF_UP rounds), not just execution
modes. Chain pinned: stream(applyInPandasWithState) == batch twin
(applyInPandas, same kernel) == JVM Column operator."""

from __future__ import annotations

import pandas as pd
import pytest

from realtime_fraud_detection_spark.ml.sequential import (
    lagged_sequence_features,
    score_sequential,
    train_sequential_scorer,
)
from realtime_fraud_detection_spark.streaming import pipeline as SP
from realtime_fraud_detection_spark.streaming import stateful as ST

FEATS = [
    "seq_log_value", "seq_n", "seq_ratio_to_mean", "seq_std_ratio",
    "seq_lag1_delta", "seq_gap_s", "seq_span_s", "seq_rate",
]


@pytest.fixture(scope="module")
def tx_dir(fraud_data, tmp_path_factory):
    """Transactions as a two-file parquet directory → two micro-batches
    (global event-time split, so per-user arrival order is preserved)."""
    _, _, tx = fraud_data
    path = str(tmp_path_factory.mktemp("txseqstream"))
    half = tx.count() // 2
    tx1 = tx.orderBy("ts", "transaction_id").limit(half)
    tx2 = tx.orderBy("ts", "transaction_id").subtract(tx1)
    tx1.coalesce(1).write.mode("append").parquet(path)
    tx2.coalesce(1).write.mode("append").parquet(path)
    return path


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("transaction_id").reset_index(drop=True)


def _assert_frames_bit_equal(g: pd.DataFrame, w: pd.DataFrame) -> None:
    assert len(g) == len(w)
    for c in FEATS:
        ga, wa = g[c], w[c]
        both_null = ga.isna() & wa.isna()
        eq = (ga == wa) | both_null
        assert eq.all(), (c, g.loc[~eq, ["transaction_id", c]].head(),
                          w.loc[~eq, ["transaction_id", c]].head())


def test_batch_twin_matches_jvm_operator_bit_exact(spark, fraud_data):
    """The Python kernel replays the JVM arithmetic (decimal(…,8) sums
    through the double's shortest repr, 6-dp HALF_UP rounds, IEEE
    derivations) — every feature bit-equal on the full fixture."""
    _, _, tx = fraud_data
    jvm = lagged_sequence_features(
        tx, "user_id", "ts", "amount", "transaction_id"
    ).select("transaction_id", *FEATS)
    twin = ST.sequence_feature_batch(tx).select("transaction_id", *FEATS)
    _assert_frames_bit_equal(_sorted(twin.toPandas()), _sorted(jvm.toPandas()))


def test_stream_matches_batch_twin_bit_exact(
    spark, fraud_data, tx_dir, tmp_path, drain_stream
):
    _, _, tx = fraud_data
    stream = (
        spark.readStream.schema(tx.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tx_dir)
    )
    q = SP.to_memory_sink(
        ST.sequence_feature_stream(stream), "seqfeat_test",
        str(tmp_path / "ck_seq"), "append",
    )
    drain_stream(q, "seqfeat_test", expect=tx.count(), timeout=180)
    got = _sorted(spark.sql("select * from seqfeat_test").toPandas())
    want = _sorted(ST.sequence_feature_batch(tx).toPandas())
    assert len(got) == tx.count()
    _assert_frames_bit_equal(got, want)


def test_streamed_features_score_identically_to_batch(spark, fraud_data):
    """The deployment story: a model trained on the batch features scores
    the feature stream's output identically — train on JVM features,
    score the Python-twin features (bit-equal inputs → bit-equal
    scores)."""
    _, _, tx = fraud_data
    import pyspark.sql.functions as F

    jvm = lagged_sequence_features(
        tx, "user_id", "ts", "amount", "transaction_id"
    ).withColumn("label", F.col("is_fraud").cast("int"))
    model = train_sequential_scorer(jvm.limit(800), "label", iters=3)
    twin = ST.sequence_feature_batch(tx)
    a = {
        r["transaction_id"]: r["seq_score"]
        for r in score_sequential(jvm, model).select(
            "transaction_id", "seq_score"
        ).collect()
    }
    b = {
        r["transaction_id"]: r["seq_score"]
        for r in score_sequential(twin, model).select(
            "transaction_id", "seq_score"
        ).collect()
    }
    assert a == b


def test_kernel_edge_cases_match_jvm_bit_exact(spark):
    """Adversarial shapes the fixture doesn't hit: zero and negative
    amounts (log1p clamps at 0; an all-zero window has mean 0 → NULL
    ratio columns), duplicate timestamps (the id tie-break decides lag),
    single-event users, and histories longer than the n-row window (the
    trim boundary)."""
    rows = []
    # user a: all-zero amounts, duplicate timestamps
    for i in range(5):
        rows.append((f"a{i:02d}", "a", "2024-03-01 10:00:00", 0.0))
    # user b: negatives and a zero, distinct times
    for i, v in enumerate([-5.0, 0.0, -0.25, 7.5]):
        rows.append((f"b{i:02d}", "b", f"2024-03-01 10:0{i}:00", v))
    # user c: single event
    rows.append(("c00", "c", "2024-03-02 00:00:00", 123.456))
    # user d: 25 events → crosses the 10-row trim repeatedly, tiny gaps
    for i in range(25):
        rows.append(
            (f"d{i:02d}", "d", f"2024-03-03 10:00:{i:02d}", float(i * i) / 7)
        )
    import pyspark.sql.functions as F

    tx = spark.createDataFrame(
        rows, "transaction_id string, user_id string, ts string, amount double"
    ).withColumn("ts", F.to_timestamp("ts"))

    jvm = lagged_sequence_features(
        tx, "user_id", "ts", "amount", "transaction_id"
    ).select("transaction_id", *FEATS)
    twin = ST.sequence_feature_batch(tx).select("transaction_id", *FEATS)
    g, w = _sorted(twin.toPandas()), _sorted(jvm.toPandas())
    _assert_frames_bit_equal(g, w)
    # the all-zero window really exercised the NULL branch
    a_rows = g[g["transaction_id"].str.startswith("a")]
    assert a_rows["seq_ratio_to_mean"].isna().all()
