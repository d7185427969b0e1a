"""Observability — SURVEY §2.8 M11 (monitoring/metrics.py, 431 LoC of
Prometheus counters in the reference) restated as a StreamingQueryListener:
per-batch input rates, processing latency, and state-store sizes straight
from Spark's progress events, no custom counters to maintain.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class PipelineMetricsListener(StreamingQueryListener):
    """Collects per-batch metrics (the reference's prediction counts /
    latency / error rate per model become input rows / batch duration /
    watermark lag here). `snapshot()` returns the series for dashboards."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state = p.stateOperators[0] if p.stateOperators else None
        self.batches.append(
            {
                "query": p.name,
                "batch_id": p.batchId,
                "input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "batch_duration_ms": p.batchDuration,
                "watermark": p.eventTime.get("watermark") if p.eventTime else None,
                "state_rows": state.numRowsTotal if state else None,
                "rows_dropped_by_watermark": (
                    state.numRowsDroppedByWatermark if state else None
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def snapshot(self) -> list[dict]:
        return list(self.batches)
