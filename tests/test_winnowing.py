"""Winnowing fingerprints (operators/dedup.winnow_*): the SIGMOD'03
guarantee — any shared substring of length >= k + w - 1 yields at least one
shared fingerprint — plus the candidate-pair join shape built on it."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators import dedup as D

K, W = 5, 4
GUARANTEE = K + W - 1  # 8 normalized chars


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {
        r["doc_id"]: set(r["fps"])
        for r in D.winnow_fingerprint_table(df, "text", "doc_id", K, W).collect()
    }


def test_shared_substring_shares_a_fingerprint(spark):
    shared = "a quick brown fox jumps over the lazy dog"
    fps = _fps(
        spark,
        [
            (1, f"first document begins here {shared} and then ends"),
            (2, f"completely different preamble text {shared} other suffix"),
            (3, "nothing in common with either of the others at all"),
        ],
    )
    assert fps[1] & fps[2], "docs sharing a long substring must share a fingerprint"
    assert not (fps[1] & fps[3] and fps[2] & fps[3] and fps[1] & fps[2] <= fps[3])


def test_identical_docs_identical_fingerprints(spark):
    fps = _fps(spark, [(1, "the same text twice"), (2, "the same text twice")])
    assert fps[1] == fps[2]


def test_short_doc_single_whole_text_fingerprint(spark):
    fps = _fps(spark, [(1, "ab"), (2, "cd")])
    assert len(fps[1]) == 1 and len(fps[2]) == 1
    assert fps[1] != fps[2]  # content-dependent, not a constant


def test_normalization_invariance(spark):
    """Punctuation/case changes that normalize identically fingerprint
    identically — the rolling hash runs over normalized_text."""
    fps = _fps(spark, [(1, "Hello, World! Example."), (2, "hello world example")])
    assert fps[1] == fps[2]


def test_candidate_pairs_find_near_dups(spark):
    shared = "one shared passage that is long enough to survive winnowing"
    df = spark.createDataFrame(
        [
            (1, f"alpha { shared } omega"),
            (2, f"beta { shared } psi"),
            (3, "entirely unrelated content goes here with its own words"),
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.winnow_candidate_pairs(df, "text", "doc_id", K, W, min_shared=2).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_max_doc_freq_prunes_corpus_wide_fingerprints(spark):
    """Fingerprints present in more than max_doc_freq docs carry no
    near-dup signal (boilerplate) and are dropped before the self-join;
    rare shared passages still pair."""
    boiler = "standard corporate boilerplate header appears on every page"
    rare = "a rare shared passage only two documents actually contain"
    df = spark.createDataFrame(
        [
            (1, f"{boiler} then {rare} ends one"),
            (2, f"{boiler} then {rare} ends two"),
            (3, f"{boiler} unique middle section three closes"),
            (4, f"{boiler} another distinct body four closes"),
            (5, f"{boiler} yet more unrelated prose five closes"),
        ],
        "doc_id int, text string",
    )
    unpruned = {
        (r["doc_a"], r["doc_b"])
        for r in D.winnow_candidate_pairs(
            df, "text", "doc_id", K, W, min_shared=2, max_doc_freq=None
        ).collect()
    }
    # Boundary windows (selection context straddles the shared-region edge)
    # leak ~1 sub-threshold fingerprint per pair, so min_shared=2 + pruning
    # is what isolates the genuinely-shared rare passage.
    pruned = {
        (r["doc_a"], r["doc_b"])
        for r in D.winnow_candidate_pairs(
            df, "text", "doc_id", K, W, min_shared=2, max_doc_freq=3
        ).collect()
    }
    assert (3, 4) in unpruned  # boilerplate alone pairs everything unpruned
    assert pruned == {(1, 2)}  # only the rare shared passage survives


def test_digest_matches_fingerprint_table(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} about winnowing with filler text {i * 3}") for i in range(6)],
        "doc_id int, text string",
    )
    dig = {r["doc_id"]: r for r in D.winnow_digest(df, "text", "doc_id", K, W).collect()}
    tbl = {r["doc_id"]: r["fps"] for r in D.winnow_fingerprint_table(df, "text", "doc_id", K, W).collect()}
    for i, fps in tbl.items():
        assert dig[i]["n_fingerprints"] == len(fps)
    df2 = df.withColumn("text", F.concat(F.col("text"), F.lit(" changed")))
    dig2 = {r["doc_id"]: r for r in D.winnow_digest(df2, "text", "doc_id", K, W).collect()}
    assert all(dig[i]["fp_digest"] != dig2[i]["fp_digest"] for i in tbl)
