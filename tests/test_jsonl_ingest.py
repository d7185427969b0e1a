"""JSONL ingest with corrupt-record quarantine (sources/files.py):
lossless split of a dirty drop into typed rows + raw quarantined lines,
mirroring the streaming JSON-ERROR fallback policy for batch files."""

from __future__ import annotations

from realtime_fraud_detection_spark.sources.files import read_jsonl

SCHEMA = "doc_id bigint, text string"


def test_dirty_jsonl_splits_losslessly(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    lines = [
        '{"doc_id": 1, "text": "good row"}',
        "this is not json at all",
        '{"doc_id": 2, "text": "another good row"}',
        '{"doc_id": "NaNsense{',  # truncated object
        '{"doc_id": 3, "text": null}',  # valid: null field is not corrupt
    ]
    p.write_text("\n".join(lines) + "\n")
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    got = {(r["doc_id"], r["text"]) for r in good.collect()}
    assert got == {(1, "good row"), (2, "another good row"), (3, None)}
    raw = {r["raw_line"] for r in quarantine.collect()}
    assert raw == {"this is not json at all", '{"doc_id": "NaNsense{'}
    # lossless: every input line is in exactly one split
    assert good.count() + quarantine.count() == len(lines)


def test_type_mismatch_is_quarantined_not_nulled(spark, tmp_path):
    p = tmp_path / "typed.jsonl"
    p.write_text('{"doc_id": "not-a-number", "text": "x"}\n{"doc_id": 7, "text": "y"}\n')
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    assert [r["doc_id"] for r in good.collect()] == [7]
    assert quarantine.count() == 1


def test_clean_file_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"doc_id": 1, "text": "a"}\n')
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    assert good.count() == 1
    assert quarantine.count() == 0
    assert good.columns == ["doc_id", "text"]


def test_read_jsonl_no_quarantine_path(spark, tmp_path):
    """quarantine=False: no staged materialization — good rows filter
    straight off the scan, bad lines silently excluded, second element
    None."""
    p = tmp_path / "drop.jsonl"
    p.write_text('{"id": 1, "v": "a"}\n{"id": "oops"}\n{"id": 2, "v": "b"}\n')
    good, quar = read_jsonl(spark, str(p), "id bigint, v string", quarantine=False)
    assert quar is None
    assert sorted((r["id"], r["v"]) for r in good.collect()) == [(1, "a"), (2, "b")]
    # no RDD-scan (checkpoint) node: the plan still reads the json source
    plan = good._jdf.queryExecution().toString()
    assert "Scan ExistingRDD" not in plan
