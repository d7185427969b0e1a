"""Delimited (CSV/TSV) ingest with corrupt-record quarantine
(sources/files.read_delimited): the delimited twin of the JSONL drop —
lossless split of a dirty file into typed rows + raw quarantined lines,
TSV separators, headerless mode, and the no-quarantine fast path."""

from __future__ import annotations

from realtime_fraud_detection_spark.sources.files import read_delimited

SCHEMA = "doc_id bigint, text string, score double"


def test_dirty_csv_splits_losslessly(spark, tmp_path):
    p = tmp_path / "drop.csv"
    lines = [
        "doc_id,text,score",
        '1,"good row",0.5',
        "not-a-number,oops,0.1",  # type mismatch -> quarantine
        '2,"another, quoted comma",1.0',
        "3,,0.25",  # empty field is null, not corrupt
    ]
    p.write_text("\n".join(lines) + "\n")
    good, quarantine = read_delimited(spark, str(p), SCHEMA)
    got = {(r["doc_id"], r["text"], r["score"]) for r in good.collect()}
    assert got == {
        (1, "good row", 0.5),
        (2, "another, quoted comma", 1.0),
        (3, None, 0.25),
    }
    raw = {r["raw_line"] for r in quarantine.collect()}
    assert raw == {"not-a-number,oops,0.1"}
    assert good.count() + quarantine.count() == len(lines) - 1  # header


def test_tsv_and_headerless(spark, tmp_path):
    p = tmp_path / "drop.tsv"
    p.write_text("7\tseven\t0.7\n8\teight\t0.8\n")
    good, quarantine = read_delimited(
        spark, str(p), SCHEMA, sep="\t", header=False
    )
    assert {(r["doc_id"], r["text"]) for r in good.collect()} == {
        (7, "seven"),
        (8, "eight"),
    }
    assert quarantine.count() == 0


def test_no_quarantine_fast_path(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text("doc_id,text,score\n1,a,0.1\nbad,b,zzz\n")
    good, quarantine = read_delimited(spark, str(p), SCHEMA, quarantine=False)
    assert quarantine is None
    assert [r["doc_id"] for r in good.collect()] == [1]
    assert good.columns == ["doc_id", "text", "score"]
