"""Custom stateful operators — SURVEY §4.2's "needs custom work" list.

Three semantics Spark's built-in windows can't express directly, implemented
with applyInPandasWithState (Arrow-batched keyed state):

  * CountTrigger early firing (A6): Flink `CountTrigger.of(10)` on a 5-min
    tumbling window (WindowProcessor.java:132-147) — emit the aggregate every
    N events *within* the window, not just at close.
  * Exact per-event rolling velocity (A8): continuously-current trailing
    5min/1h/24h count+sum per user (RedisTransactionSink.java:87-135) — a
    sliding window only refreshes on slide boundaries; this is exact at every
    event.
  * Capped recency lists (W1): last-N transaction ids per key
    (RedisService.java:296-321's lpush+ltrim).

State is bounded by construction (counts, a 24-h event buffer trimmed on
every batch, an N-capped list) with processing-time timeouts mirroring the
reference's Redis TTLs (RedisService.java:46-49).

The same functions run in batch via `applyInPandas` (no state, grouped
whole-history) — tests verify the streaming output against the batch/SQL
equivalent.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _ts_us(series: pd.Series) -> pd.Series:
    """Epoch microseconds regardless of the incoming datetime64 unit (Arrow
    hands applyInPandas datetime64[us] but applyInPandasWithState datetime64[ns])."""
    return series.astype("datetime64[us]").astype("int64")


WINDOW_5MIN_US = 300 * 1_000_000
WINDOW_1H_US = 3600 * 1_000_000
WINDOW_24H_US = 86400 * 1_000_000


# ---------------------------------------------------------------------------
# A6 — CountTrigger early firing
# ---------------------------------------------------------------------------
COUNT_TRIGGER_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("window_start", T.TimestampType()),
        T.StructField("fire_count", T.LongType()),
        T.StructField("tx_count", T.LongType()),
    ]
)
_COUNT_TRIGGER_STATE = T.StructType(
    [
        T.StructField("window_starts", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("fires", T.ArrayType(T.LongType())),
    ]
)


def count_trigger_fn(n: int = 10, window_s: int = 300):
    """Per-user state: {window_start → (count, fires)}; emit a row each time
    a window's count crosses another multiple of `n` (CountTrigger.of(n)
    FIRE semantics — count resets per fire, window keeps accumulating)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ws, counts, fires = ([], [], []) if not state.exists else [list(x) for x in state.get]
        table: dict[int, list[int]] = {w: [c, f] for w, c, f in zip(ws, counts, fires)}
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            us = _ts_us(pdf["ts"]).tolist()
            for t in us:
                w = int(t // (window_s * 1_000_000)) * (window_s * 1_000_000)
                c, f = table.get(w, [0, 0])
                c += 1
                if c // n > f:
                    f = c // n
                    out.append(
                        {
                            "user_id": key[0],
                            "window_start": pd.Timestamp(w, unit="us"),
                            "fire_count": f,
                            "tx_count": c,
                        }
                    )
                table[w] = [c, f]
        items = sorted(table.items())[-64:]  # bound state: keep recent windows
        state.update(
            ([w for w, _ in items], [v[0] for _, v in items], [v[1] for _, v in items])
        )
        state.setTimeoutDuration(3600 * 1000)  # Redis velocity TTL: 1 h
        if out:
            yield pd.DataFrame(out)

    return fn


def count_trigger_stream(tx: DataFrame, n: int = 10, window: str = "5 minutes") -> DataFrame:
    window_s = {"5 minutes": 300}.get(window, 300)
    return (
        tx.groupBy("user_id")
        .applyInPandasWithState(
            count_trigger_fn(n, window_s),
            COUNT_TRIGGER_OUTPUT,
            _COUNT_TRIGGER_STATE,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# A8 — exact rolling velocity (continuously current 5min/1h/24h)
# ---------------------------------------------------------------------------
ROLLING_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("count_5min", T.LongType()),
        T.StructField("amount_5min", T.DoubleType()),
        T.StructField("count_1h", T.LongType()),
        T.StructField("amount_1h", T.DoubleType()),
        T.StructField("count_24h", T.LongType()),
        T.StructField("amount_24h", T.DoubleType()),
    ]
)
_ROLLING_STATE = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("amounts", T.ArrayType(T.DoubleType())),
    ]
)


def _rolling_emit(ts_us, amounts, new_ts, new_amounts, out_rows, user_id, tx_ids):
    """Merge buffer + new events (ordered), emitting exact trailing windows
    for each new event. Buffer and news are each sorted; a cents-exact sum
    (int64 cents) keeps results order-insensitive."""
    import numpy as np

    all_ts = np.concatenate([ts_us, new_ts])
    all_amt = np.concatenate([amounts, new_amounts])
    order = np.argsort(all_ts, kind="stable")
    all_ts, all_amt = all_ts[order], all_amt[order]
    cents = np.round(all_amt * 100).astype("int64")
    n_old = len(ts_us)
    # positions of the new events in the merged array
    new_pos = np.argsort(order, kind="stable")[n_old:]
    for i, pos in enumerate(new_pos):
        t = all_ts[pos]
        row = {"user_id": user_id, "transaction_id": tx_ids[i], "ts": pd.Timestamp(t, unit="us")}
        # hi includes ALL rows with the same timestamp (SQL RANGE frames
        # include every peer of CURRENT ROW, not just preceding positions)
        hi = np.searchsorted(all_ts, t, side="right")
        for name, w in (("5min", WINDOW_5MIN_US), ("1h", WINDOW_1H_US), ("24h", WINDOW_24H_US)):
            lo = np.searchsorted(all_ts, t - w, side="left")
            row[f"count_{name}"] = int(hi - lo)
            row[f"amount_{name}"] = float(cents[lo:hi].sum()) / 100.0
        out_rows.append(row)
    return all_ts, all_amt


def rolling_velocity_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        return
    ts_us, amounts = (
        (np.array([], dtype="int64"), np.array([], dtype="float64"))
        if not state.exists
        else (np.array(state.get[0], dtype="int64"), np.array(state.get[1], dtype="float64"))
    )
    out: list[dict] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts", kind="mergesort")
        new_ts = _ts_us(pdf["ts"]).to_numpy()
        new_amt = pdf["amount"].to_numpy(dtype="float64")
        ts_us, amounts = _rolling_emit(
            ts_us, amounts, new_ts, new_amt, out, key[0], pdf["transaction_id"].tolist()
        )
    # trim buffer to the widest window behind the newest event
    if len(ts_us):
        keep = ts_us >= ts_us[-1] - WINDOW_24H_US
        ts_us, amounts = ts_us[keep], amounts[keep]
    state.update((ts_us.tolist(), amounts.tolist()))
    state.setTimeoutDuration(24 * 3600 * 1000)  # tx TTL 24 h (RedisService.java:46)
    if out:
        yield pd.DataFrame(out)


def rolling_velocity_stream(tx: DataFrame) -> DataFrame:
    return (
        tx.select("user_id", "transaction_id", "ts", "amount")
        .groupBy("user_id")
        .applyInPandasWithState(
            rolling_velocity_fn,
            ROLLING_OUTPUT,
            _ROLLING_STATE,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def rolling_velocity_batch(tx: DataFrame) -> DataFrame:
    """Batch equivalent via applyInPandas over whole per-user history — the
    oracle for the streaming form, and itself the W2/A8 batch operator with
    Arrow-vectorized per-group compute."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("ts", kind="mergesort")
        out: list[dict] = []
        _rolling_emit(
            np.array([], dtype="int64"),
            np.array([], dtype="float64"),
            _ts_us(pdf["ts"]).to_numpy(),
            pdf["amount"].to_numpy(dtype="float64"),
            out,
            pdf["user_id"].iloc[0],
            pdf["transaction_id"].tolist(),
        )
        return pd.DataFrame(out)

    return (
        tx.select("user_id", "transaction_id", "ts", "amount")
        .groupBy("user_id")
        .applyInPandas(fn, ROLLING_OUTPUT)
    )


# ---------------------------------------------------------------------------
# A8 again on the Spark 4 transformWithState API — the successor to
# applyInPandasWithState (SPARK-45939): explicit typed state handles with
# built-in TTL instead of a monolithic state tuple + manual timeouts. Same
# semantics as rolling_velocity_stream; the equivalence test pins
# stream(transformWithState) == stream(applyInPandasWithState) == batch.
# Runtime note: the transformWithState driver-worker protocol needs
# google.protobuf, which this sandbox lacks — the equivalence test
# self-skips there; applyInPandasWithState remains the default path.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - import shape differs across 4.x minors
    from pyspark.sql.streaming import StatefulProcessor

    class RollingVelocityProcessor(StatefulProcessor):
        """Per-user 24 h event buffer in a ValueState with a 24 h TTL
        (RedisService.java:46's transaction TTL)."""

        def init(self, handle) -> None:
            self._buf = handle.getValueState(
                "buffer", _ROLLING_STATE, ttlDurationMs=24 * 3600 * 1000
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            stored = self._buf.get()
            ts_us, amounts = (
                (np.array([], dtype="int64"), np.array([], dtype="float64"))
                if stored is None
                else (
                    np.array(stored[0], dtype="int64"),
                    np.array(stored[1], dtype="float64"),
                )
            )
            out: list[dict] = []
            for pdf in rows:
                pdf = pdf.sort_values("ts", kind="mergesort")
                ts_us, amounts = _rolling_emit(
                    ts_us,
                    amounts,
                    _ts_us(pdf["ts"]).to_numpy(),
                    pdf["amount"].to_numpy(dtype="float64"),
                    out,
                    key[0],
                    pdf["transaction_id"].tolist(),
                )
            if len(ts_us):
                keep = ts_us >= ts_us[-1] - WINDOW_24H_US
                ts_us, amounts = ts_us[keep], amounts[keep]
            self._buf.update((ts_us.tolist(), amounts.tolist()))
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    def rolling_velocity_tws(tx: DataFrame) -> DataFrame:
        """transformWithStateInPandas form of :func:`rolling_velocity_stream`."""
        return (
            tx.select("user_id", "transaction_id", "ts", "amount")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RollingVelocityProcessor(),
                outputStructType=ROLLING_OUTPUT,
                outputMode="append",
                timeMode="ProcessingTime",
            )
        )

except ImportError:  # pragma: no cover
    RollingVelocityProcessor = None

    def rolling_velocity_tws(tx: DataFrame) -> DataFrame:
        raise NotImplementedError("transformWithStateInPandas requires Spark >= 4.0")


# ---------------------------------------------------------------------------
# Streaming deduplication — the training-pipeline dedup need in streaming
# form (and the reference's implicit at-least-once Kafka redelivery guard):
# exact-key dedup with watermark-bounded state.
# ---------------------------------------------------------------------------
def dedup_stream(
    tx: DataFrame,
    key_cols: list[str] | None = None,
    ts: str = "ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Drop duplicate events by key across micro-batches.

    `dropDuplicatesWithinWatermark` keeps state only until the watermark
    passes the duplicate horizon — bounded state, unlike a naive
    dropDuplicates whose state grows forever on a stream.
    """
    keys = key_cols or ["transaction_id"]
    return tx.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


# ---------------------------------------------------------------------------
# W1 — capped recency lists
# ---------------------------------------------------------------------------
RECENCY_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("recent_transaction_ids", T.ArrayType(T.StringType())),
        T.StructField("list_size", T.IntegerType()),
    ]
)
_RECENCY_STATE = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("tx_ids", T.ArrayType(T.StringType())),
    ]
)


def capped_recency_fn(cap: int = 100):
    """lpush + ltrim (RedisService.java:296-321): newest-first id list capped
    at `cap`; emits the current list once per micro-batch per key."""

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ts, ids = ([], []) if not state.exists else [list(x) for x in state.get]
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="mergesort")
            ts.extend(_ts_us(pdf["ts"]).tolist())
            ids.extend(pdf["transaction_id"].tolist())
        order = sorted(range(len(ts)), key=lambda i: (-ts[i], ids[i]))[:cap]
        ts = [ts[i] for i in order]
        ids = [ids[i] for i in order]
        state.update((ts, ids))
        state.setTimeoutDuration(24 * 3600 * 1000)
        yield pd.DataFrame(
            [{"user_id": key[0], "recent_transaction_ids": ids, "list_size": len(ids)}]
        )

    return fn


def capped_recency_stream(tx: DataFrame, cap: int = 100) -> DataFrame:
    return (
        tx.select("user_id", "transaction_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            capped_recency_fn(cap),
            RECENCY_OUTPUT,
            _RECENCY_STATE,
            "update",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming as-of enrichment — the continuous form of operators/joins.
# asof_join: per key, keep a time-ordered buffer of reference ("right")
# observations and emit each event ("left") row with the latest observation
# at or before its timestamp. This is Flink's temporal-table join shape —
# the reference approximates it with a Redis GET of "the latest profile"
# per record (TransactionProcessor.java:97-138); here the lookup state is
# keyed operator state, bounded by `retention` and a processing-time
# timeout.
#
# Input is the same tagged union the batch operator builds internally:
# (key, ts, is_left, row_id, value) with is_left=0 for reference rows.
# Append-mode caveat (documented, tested): a reference row that arrives in
# a LATER micro-batch than an event row with a larger event-time cannot
# retro-update the already-emitted match — the same no-retraction rule as
# every append-mode stream join; bound disorder with watermarks upstream.
# ---------------------------------------------------------------------------
ASOF_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("row_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("matched_ts", T.TimestampType()),
        T.StructField("matched_value", T.DoubleType()),
    ]
)
_ASOF_STATE = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def asof_enrich_fn(retention_us: int = WINDOW_24H_US):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            buf_ts = np.asarray(state.get[0], dtype="int64")
            buf_val = np.asarray(state.get[1], dtype="float64")
        else:
            buf_ts = np.empty(0, dtype="int64")
            buf_val = np.empty(0, dtype="float64")
        out: list[pd.DataFrame] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # merge ALL of the batch's reference rows into the sorted
            # buffer ONCE (stable sort: existing state sorts before batch
            # rows at equal ts, so a later-arriving observation at the
            # same instant wins under side='right' — the same tie rule as
            # the batch operator's (_t, _is_left) sort). An event only
            # matches rows at-or-BEFORE its ts, so folding same-batch
            # refs with larger ts in first cannot change any match.
            refs = pdf[pdf["is_left"] == 0]
            if len(refs):
                ref_ts = _ts_us(refs["ts"]).to_numpy().astype("int64")
                order = np.argsort(ref_ts, kind="mergesort")
                merged_ts = np.concatenate([buf_ts, ref_ts[order]])
                merged_val = np.concatenate(
                    [buf_val, refs["value"].to_numpy("float64")[order]]
                )
                order = np.argsort(merged_ts, kind="mergesort")
                buf_ts, buf_val = merged_ts[order], merged_val[order]
            events = pdf[pdf["is_left"] == 1]
            if len(events):
                ev_ts = _ts_us(events["ts"]).to_numpy().astype("int64")
                pos = np.searchsorted(buf_ts, ev_ts, side="right")
                hit = pos > 0
                nat = np.int64(np.iinfo("int64").min)  # int64 min IS NaT
                if len(buf_ts):
                    idx = np.maximum(pos - 1, 0)
                    m_ts = np.where(hit, buf_ts[idx], nat)
                    m_val = np.where(hit, buf_val[idx], np.nan)
                else:
                    m_ts = np.full(len(events), nat)
                    m_val = np.full(len(events), np.nan)
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": np.full(len(events), key[0], dtype="int64"),
                            "row_id": events["row_id"].to_numpy("int64"),
                            "ts": events["ts"].to_numpy(),
                            "matched_ts": m_ts.astype("datetime64[us]"),
                            "matched_value": m_val,
                        }
                    )
                )
        if len(buf_ts):
            horizon = buf_ts[-1] - retention_us
            # keep the newest observation at or before the horizon too —
            # it is still the valid match for events near the cutoff
            first_keep = max(
                0, int(np.searchsorted(buf_ts, horizon, side="right")) - 1
            )
            buf_ts, buf_val = buf_ts[first_keep:], buf_val[first_keep:]
        # state tuples must be pure-Python types (no numpy scalars)
        state.update(([int(t) for t in buf_ts], [float(v) for v in buf_val]))
        state.setTimeoutDuration(24 * 3600 * 1000)
        for pdf in out:
            yield pdf

    return fn


def asof_enrich_stream(
    tagged: DataFrame, retention: str = "24 hours"
) -> DataFrame:
    """`tagged`: (user_id, ts, is_left, row_id, value) — see module comment.
    Retention bounds state exactly like the batch `tolerance` bounds match
    staleness. Accepts any "<n> second|minute|hour|day(s)" interval;
    raises ValueError on anything unparseable (no silent default)."""
    import re

    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", retention.strip())
    if not m:
        raise ValueError(f"unrecognized retention interval: {retention!r}")
    retention_us = int(m.group(1)) * {
        "second": 1,
        "minute": 60,
        "hour": 3600,
        "day": 86400,
    }[m.group(2)] * 1_000_000
    return (
        tagged.select("user_id", "ts", "is_left", "row_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            asof_enrich_fn(retention_us),
            ASOF_OUTPUT,
            _ASOF_STATE,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Silence (gap) detection — the dual of CountTrigger: alert when a key that
# has been seen goes QUIET for longer than `gap` in EVENT time. Flink
# expresses this with keyed event-time timers; Spark's equivalent is an
# EventTimeTimeout on keyed state: every event re-arms the key's timeout at
# last_seen + gap, and when the watermark passes that point with no new
# events the group fires with hasTimedOut (no input rows) and emits the
# alert. State is one timestamp per key; the watermark bounds both state
# and alert lateness. Input MUST carry a watermark (withWatermark) —
# EventTimeTimeout requires it.
# ---------------------------------------------------------------------------
SILENCE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("last_seen", T.TimestampType()),
        T.StructField("events_seen", T.LongType()),
    ]
)
_SILENCE_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def silence_alert_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "last_seen": pd.Timestamp(last_us, unit="us"),
                        "events_seen": int(n),
                    }
                ]
            )
            return
        last_us, n = (0, 0) if not state.exists else state.get
        for pdf in pdfs:
            if len(pdf):
                last_us = max(last_us, int(_ts_us(pdf["ts"]).max()))
                n += len(pdf)
        state.update((int(last_us), int(n)))
        # fire when the EVENT-TIME watermark passes last_seen + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)

    return fn


def silence_alert_stream(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "1 minute"
) -> DataFrame:
    """`events`: (user_id, ts[, ...]). Emits one row per key whose silence
    exceeds `gap` in event time, then drops the key's state (a returning
    key starts a fresh episode)."""
    import re

    m = re.match(r"(\d+)\s*(second|minute|hour)s?", gap)
    gap_ms = int(m.group(1)) * {"second": 1, "minute": 60, "hour": 3600}[
        m.group(2)
    ] * 1000
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            silence_alert_fn(gap_ms),
            SILENCE_OUTPUT,
            _SILENCE_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# M6 online — the trained sequential scorer's feature assembly as a
# streaming operator: the SAME eight trailing-window features
# ml/sequential.lagged_sequence_features derives in batch, computed
# per event from ≤ n rows of keyed state, so a deployed sequence model
# (score_sequential / the M9 linear artifact) scores the live stream on
# EXACTLY the features it was trained on. State is bounded by
# construction (the last n (ts, amount) pairs per user — the 10-step
# LSTM buffer the reference's config describes, utils/config.py:145-157).
#
# Bit-parity discipline: the batch operator computes trailing moments
# via cast-to-decimal(…,8) sums and 6-dp HALF_UP rounds; both Spark
# conversions go through the double's SHORTEST decimal representation
# (BigDecimal.valueOf ≡ Python repr()), so the Python kernel replays
# them with the decimal module and the streamed features equal the JVM
# batch operator's bit-for-bit (tests/test_sequence_stream.py — the
# strongest stream==batch law in the repo: it crosses ENGINES, not just
# modes). No timeout is registered: state is n rows/key, and
# timeout-free queries self-terminate under Trigger.AvailableNow.
# ---------------------------------------------------------------------------
SEQFEAT_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("seq_log_value", T.DoubleType()),
        T.StructField("seq_n", T.DoubleType()),
        T.StructField("seq_ratio_to_mean", T.DoubleType()),
        T.StructField("seq_std_ratio", T.DoubleType()),
        T.StructField("seq_lag1_delta", T.DoubleType()),
        T.StructField("seq_gap_s", T.DoubleType()),
        T.StructField("seq_span_s", T.DoubleType()),
        T.StructField("seq_rate", T.DoubleType()),
    ]
)
_SEQFEAT_STATE = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("amounts", T.ArrayType(T.DoubleType())),
    ]
)


def _seq_feature_rows(buf_ts, buf_v, new_ts, new_v, ids, user_id, n):
    """Replay the JVM feature arithmetic per event (see the block comment):
    decimal(…,8) trailing sums via the double's shortest repr, IEEE
    double derivations, 6-dp HALF_UP rounds. Buffers are plain lists
    (state tuples must be pure-Python); returns the emitted rows and the
    trimmed buffers."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    q8 = Decimal("1E-8")
    q6 = Decimal("1E-6")

    def dec8(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(q8, rounding=ROUND_HALF_UP)

    def round6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP))

    rows = []
    for t_us, v, rid in zip(new_ts, new_v, ids):
        prev_t = buf_ts[-1] if buf_ts else None
        prev_v = buf_v[-1] if buf_v else None
        buf_ts.append(int(t_us))
        buf_v.append(float(v))
        if len(buf_ts) > n:
            del buf_ts[0], buf_v[0]
        ts_s = t_us / 1e6
        win_v = buf_v
        cnt = float(len(win_v))
        s1 = float(sum((dec8(x) for x in win_v), Decimal(0)))
        s2 = float(sum((dec8(x * x) for x in win_v), Decimal(0)))
        mean = s1 / cnt
        var = max(s2 / cnt - mean * mean, 0.0)
        gap = (
            86400.0
            if prev_t is None
            else min(ts_s - prev_t / 1e6, 86400.0)
        )
        span = ts_s - min(buf_ts) / 1e6
        rows.append(
            {
                "user_id": user_id,
                "transaction_id": rid,
                "ts": pd.Timestamp(t_us, unit="us"),
                "seq_log_value": round6(math.log1p(max(v, 0.0))),
                "seq_n": cnt,
                "seq_ratio_to_mean": None if mean == 0 else round6(v / mean),
                "seq_std_ratio": None
                if mean == 0
                else round6(math.sqrt(var) / mean),
                "seq_lag1_delta": round6(
                    0.0 if prev_v is None else v - prev_v
                ),
                "seq_gap_s": round6(gap),
                "seq_span_s": round6(span),
                "seq_rate": round6(cnt / max(span, 1.0)),
            }
        )
    return rows


def sequence_feature_fn(n: int = 10):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        buf_ts, buf_v = ([], []) if not state.exists else (
            list(state.get[0]),
            list(state.get[1]),
        )
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(
                ["ts", "transaction_id"], kind="mergesort"
            )
            out.extend(
                _seq_feature_rows(
                    buf_ts,
                    buf_v,
                    _ts_us(pdf["ts"]).tolist(),
                    pdf["amount"].astype("float64").tolist(),
                    pdf["transaction_id"].tolist(),
                    user_id,
                    n,
                )
            )
        state.update((buf_ts, buf_v))
        yield pd.DataFrame(out, columns=[f.name for f in SEQFEAT_OUTPUT])

    return fn


def sequence_feature_stream(tx: DataFrame, n: int = 10) -> DataFrame:
    """(user_id, transaction_id, ts, amount) stream → per-event trailing
    sequence features, bit-identical to the batch
    ml/sequential.lagged_sequence_features (events must arrive in
    per-user event-time order, the Kafka-partition-per-user contract)."""
    return (
        tx.select("user_id", "transaction_id", "ts", "amount")
        .groupBy("user_id")
        .applyInPandasWithState(
            sequence_feature_fn(n),
            SEQFEAT_OUTPUT,
            _SEQFEAT_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def sequence_feature_batch(tx: DataFrame, n: int = 10) -> DataFrame:
    """Batch twin via applyInPandas over whole per-user histories — same
    Python kernel, no state; the bridge in the stream == batch == JVM
    equality chain."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "transaction_id"], kind="mergesort")
        rows = _seq_feature_rows(
            [],
            [],
            _ts_us(pdf["ts"]).tolist(),
            pdf["amount"].astype("float64").tolist(),
            pdf["transaction_id"].tolist(),
            pdf["user_id"].iloc[0],
            n,
        )
        return pd.DataFrame(rows, columns=[f.name for f in SEQFEAT_OUTPUT])

    return (
        tx.select("user_id", "transaction_id", "ts", "amount")
        .groupBy("user_id")
        .applyInPandas(fn, SEQFEAT_OUTPUT)
    )
