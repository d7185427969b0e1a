"""Observability — SURVEY §2.8 M11 (monitoring/metrics.py, 431 LoC of
Prometheus counters in the reference) restated as a StreamingQueryListener:
per-batch input rates, processing latency, and state-store sizes straight
from Spark's progress events, no custom counters to maintain.

`MetricsExporter` mirrors the reference's export surface
(MetricsCollector.get_prometheus_metrics / get_metrics,
services/ml-models/src/monitoring/metrics.py:238-304): Prometheus
text-exposition and JSON renderings of the listener state, plus an
optional stdlib HTTP endpoint — no prometheus_client dependency (the
text format is a published spec and the counters here are few).
"""

from __future__ import annotations

import json
import threading

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


class MetricsExporter:
    """Renders a `PipelineMetricsListener`'s accumulated batches as the
    reference's counter surface: per-query totals (counters) and
    latest-batch readings (gauges), as Prometheus text exposition or JSON,
    optionally served over HTTP (`serve()` → /metrics, /metrics.json)."""

    def __init__(self, listener: PipelineMetricsListener) -> None:
        self._listener = listener
        self._server = None

    def counters(self) -> dict:
        """Aggregate the listener state. Counters accumulate across
        batches; gauges are the most recent batch's readings."""
        per_query: dict[str, dict] = {}
        for b in self._listener.snapshot():
            q = b["query"] or "unnamed"
            c = per_query.setdefault(
                q,
                {
                    "batches_total": 0,
                    "input_rows_total": 0,
                    "rows_dropped_by_watermark_total": 0,
                    "last_batch_duration_ms": None,
                    "last_rows_per_sec": None,
                    "last_state_rows": None,
                },
            )
            c["batches_total"] += 1
            c["input_rows_total"] += b["input_rows"] or 0
            c["rows_dropped_by_watermark_total"] += (
                b["rows_dropped_by_watermark"] or 0
            )
            c["last_batch_duration_ms"] = b["batch_duration_ms"]
            c["last_rows_per_sec"] = b["rows_per_sec"]
            c["last_state_rows"] = b["state_rows"]
        return per_query

    _COUNTER_KEYS = (
        "batches_total",
        "input_rows_total",
        "rows_dropped_by_watermark_total",
    )
    _GAUGE_KEYS = (
        "last_batch_duration_ms",
        "last_rows_per_sec",
        "last_state_rows",
    )

    def prometheus_text(self) -> str:
        """Prometheus text exposition (the format
        `prometheus_client.generate_latest` emits in the reference)."""
        per_query = self.counters()
        lines: list[str] = []
        for key in self._COUNTER_KEYS + self._GAUGE_KEYS:
            kind = "counter" if key in self._COUNTER_KEYS else "gauge"
            name = f"pipeline_{key}"
            lines.append(f"# TYPE {name} {kind}")
            for q, c in sorted(per_query.items()):
                if c[key] is None:
                    continue
                label = q.replace("\\", "\\\\").replace('"', '\\"')
                lines.append(f'{name}{{query="{label}"}} {c[key]}')
        return "\n".join(lines) + "\n"

    def to_json(self) -> str:
        return json.dumps(self.counters(), sort_keys=True)

    def serve(self, port: int = 0) -> int:
        """Start a daemon HTTP server; returns the bound port (pass 0 for
        an ephemeral one). GET /metrics → text exposition, /metrics.json →
        JSON. `close()` stops it."""
        from http.server import BaseHTTPRequestHandler, HTTPServer

        exporter = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802
                if self.path == "/metrics":
                    body = exporter.prometheus_text().encode()
                    ctype = "text/plain; version=0.0.4; charset=utf-8"
                elif self.path == "/metrics.json":
                    body = exporter.to_json().encode()
                    ctype = "application/json"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # noqa: A002
                pass  # keep test/driver stderr clean

        self._server = HTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self._server.server_address[1]

    def close(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
