"""MetricsExporter: the reference's counter-export surface
(monitoring/metrics.py get_prometheus_metrics / get_metrics) off the
listener state — exported values must match the listener exactly.
Pure-Python (no SparkSession): the listener's snapshot() dict format is
the contract, pinned by the streaming test in test_feature_store.py."""

from __future__ import annotations

import json
import urllib.request

from realtime_fraud_detection_spark.streaming.metrics import (
    MetricsExporter,
    PipelineMetricsListener,
)


def _listener_with_batches() -> PipelineMetricsListener:
    listener = PipelineMetricsListener()
    listener.batches = [
        {
            "query": "scoring",
            "batch_id": 0,
            "input_rows": 100,
            "rows_per_sec": 50.0,
            "batch_duration_ms": 2000,
            "watermark": None,
            "state_rows": 7,
            "rows_dropped_by_watermark": 0,
        },
        {
            "query": "scoring",
            "batch_id": 1,
            "input_rows": 40,
            "rows_per_sec": 80.0,
            "batch_duration_ms": 500,
            "watermark": "2024-01-01T00:00:00.000Z",
            "state_rows": 9,
            "rows_dropped_by_watermark": 3,
        },
        {
            "query": "alerts",
            "batch_id": 0,
            "input_rows": 5,
            "rows_per_sec": 10.0,
            "batch_duration_ms": 100,
            "watermark": None,
            "state_rows": None,
            "rows_dropped_by_watermark": None,
        },
    ]
    return listener


def test_counters_match_listener_state():
    exporter = MetricsExporter(_listener_with_batches())
    c = exporter.counters()
    assert c["scoring"]["batches_total"] == 2
    assert c["scoring"]["input_rows_total"] == 140
    assert c["scoring"]["rows_dropped_by_watermark_total"] == 3
    # gauges are the LATEST batch's readings
    assert c["scoring"]["last_batch_duration_ms"] == 500
    assert c["scoring"]["last_rows_per_sec"] == 80.0
    assert c["scoring"]["last_state_rows"] == 9
    assert c["alerts"]["batches_total"] == 1
    assert c["alerts"]["input_rows_total"] == 5
    assert c["alerts"]["last_state_rows"] is None


def test_prometheus_text_exposition():
    exporter = MetricsExporter(_listener_with_batches())
    text = exporter.prometheus_text()
    assert "# TYPE pipeline_batches_total counter" in text
    assert 'pipeline_batches_total{query="scoring"} 2' in text
    assert 'pipeline_input_rows_total{query="scoring"} 140' in text
    assert 'pipeline_input_rows_total{query="alerts"} 5' in text
    assert "# TYPE pipeline_last_batch_duration_ms gauge" in text
    assert 'pipeline_last_batch_duration_ms{query="scoring"} 500' in text
    # None-valued gauges are omitted, not emitted as a bogus sample
    assert 'pipeline_last_state_rows{query="alerts"}' not in text


def test_http_endpoint_serves_both_formats():
    exporter = MetricsExporter(_listener_with_batches())
    port = exporter.serve(0)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
        assert body == exporter.prometheus_text()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics.json"
        ) as r:
            served = json.loads(r.read())
        assert served == exporter.counters()
    finally:
        exporter.close()


def test_empty_listener_exports_cleanly():
    exporter = MetricsExporter(PipelineMetricsListener())
    assert exporter.counters() == {}
    assert exporter.to_json() == "{}"
    assert exporter.prometheus_text().count("# TYPE") == 6
