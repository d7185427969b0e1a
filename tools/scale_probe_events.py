#!/usr/bin/env python3
"""Scale probe for the time-domain operators: asof_join and gap_fill at 10x
the sf0.1 events row count.

10x corpus = 10 replicas of the events fixture with disjoint user_id
spaces (user_id + r * 10_000_000) — per-key series structure is identical,
the key count grows 10x. Both operators are one key-partitioned
shuffle+sort, so runtime should grow ~linearly with rows and the output
exactly 10x. Superlinear time or output growth would indicate a pair/spine
blow-up. Results recorded in SCALE.md.

Usage: python3 tools/scale_probe_events.py [replicas] [stages]
  (default 10, asof,gapfill; stages: comma-separated subset of
  asof,gapfill,dims,bloom,evalm — `dims` runs the changelog→compaction→SCD2→
  versioned-enrichment chain on the scaled corpus; `bloom` measures the
  bloom-pruned selective join against the plain join on the same inputs,
  reporting the scan-survivor ratio)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scale_events"


def build_corpus(spark, replicas: int) -> None:
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events", fan_out=True)
    parts = [
        ev.select(
            (F.col("event_id") + r * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for r in range(replicas)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionAll(p)
    corpus.repartition(64).write.mode("overwrite").parquet(OUT)


def _read(spark, src):
    # the 1x fixture is one file -> one partition; fan out so both scales
    # use the full core count and the comparison isolates data volume
    df = spark.read.parquet(src)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def run_asof(spark, src) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.joins import asof_join

    ev = _read(spark, src)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("amount")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(purchases, views, "user_id")
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()  # full materialization
    t = time.time() - t0
    return t, out.count()


def run_gap_fill(spark, src) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators import timeseries as T

    ev = _read(spark, src).filter(F.col("event_type") == "purchase")
    hourly = T.resample(ev, "user_id", "ts", "value", step="1 hour", agg="avg")
    out = T.gap_fill(hourly, "user_id", "bucket", "value", step="1 hour")
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()  # full materialization
    t = time.time() - t0
    return t, out.count()


def run_dims(spark, src) -> list[str]:
    """The q_scd2_enrich chain at scale: signup/error rows are the profile
    changelog, purchases the facts. Times each stage separately so the
    binding one is visible (compaction is one map-side-combined shuffle,
    SCD2 one keyed window sort, enrichment the as-of |facts|+|versions|
    shuffle)."""
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.dimensions import (
        compact_changelog,
        enrich_versioned,
        scd2_history,
    )

    ev = _read(spark, src)
    changelog = ev.filter(
        F.col("event_type").isin("signup", "error")
    ).select(
        "user_id",
        "ts",
        F.col("value").alias("risk_score"),
        F.col("event_type").alias("change_type"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    lines = []
    t0 = time.time()
    snap = compact_changelog(changelog, "user_id", "ts")
    snap.write.format("noop").mode("overwrite").save()
    lines.append(f"compact: {time.time() - t0:.1f}s rows={snap.count()}")
    t0 = time.time()
    hist = scd2_history(changelog, "user_id", "ts")
    hist.write.format("noop").mode("overwrite").save()
    lines.append(f"scd2: {time.time() - t0:.1f}s rows={hist.count()}")
    t0 = time.time()
    enr = enrich_versioned(
        facts, changelog, "user_id", fact_ts="ts", version_ts="ts",
        tie_break=["risk_score", "change_type"],
    )
    enr.write.format("noop").mode("overwrite").save()
    lines.append(f"enrich_versioned: {time.time() - t0:.1f}s rows={enr.count()}")
    return lines


def run_bloom(spark, src) -> list[str]:
    """Bloom-pruned selective join vs the plain join on identical inputs:
    big = the events corpus, small = ~0.1% of users (every 1024th id —
    the md5-free modulus keeps the subset deterministic per scale). The
    probe reports the bloom build+probe time, the plain-join time, and
    the scan-survivor ratio — the number that decides whether the bitmap
    pays for itself (it prunes the JOIN EXCHANGE, so the win scales with
    shuffled bytes per surviving row)."""
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.joins import (
        bloom_pruned_join,
    )

    ev = _read(spark, src)
    small = (
        ev.filter(F.col("user_id") % 1024 == 0)
        .select("user_id")
        .distinct()
        .withColumn("segment", F.lit("vip"))
        .localCheckpoint()  # small side fixed across both measurements
    )
    n_small = small.count()
    lines = [f"small_keys={n_small}"]
    t0 = time.time()
    plain = ev.join(small, "user_id")
    plain.write.format("noop").mode("overwrite").save()
    n_out = plain.count()
    lines.append(f"plain_join: {time.time() - t0:.1f}s rows={n_out}")
    t0 = time.time()
    pruned = bloom_pruned_join(ev, small, "user_id", key_count=n_small)
    pruned.write.format("noop").mode("overwrite").save()
    lines.append(f"bloom_join: {time.time() - t0:.1f}s rows={pruned.count()}")
    total = ev.count()
    from realtime_fraud_detection_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_parameters,
    )

    m_bits, k = bloom_parameters(n_small, 0.01)
    bitmap = bloom_build(
        small.select(F.col("user_id").alias("_bk")), "_bk", m_bits, k,
        portable=False,
    )
    surv = ev.filter(
        bloom_might_contain(bitmap, F.col("user_id"), k, portable=False)
    ).count()
    lines.append(
        f"scan_survivors={surv}/{total} ({surv / total:.4%}) "
        f"m_bits={m_bits} k={k}"
    )
    return lines


def run_evalm(spark, src) -> list[str]:
    """Ranking metrics at scale: binary_eval's only row-scale pass is the
    (keys, score) hash agg; the window runs over |distinct scores| per
    group. Two score shapes probe both regimes: 'bounded' (1000 distinct
    values — the rounded-score production contract, window input constant
    as events grow) and 'hicard' (~1 distinct score per row — the
    worst case the rounding knob exists to prevent). A 100-threshold
    confusion sweep must cost one tiny join over the grouped table."""
    import time as _t

    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.functions.hashing import md5_bigint
    from realtime_fraud_detection_spark.ml.evaluation import (
        binary_eval,
        confusion_at_thresholds,
    )

    ev = _read(spark, src)
    coin = (
        md5_bigint(F.col("event_id").cast("string"), "sp:") % 1_000_000
    ) / 1e6
    out = []
    for tag, score in [
        ("bounded", ((F.col("event_id") * 37) % 1000) / 1000.0),
        # reduce mod BEFORE multiplying: 100x ids * the Knuth constant
        # overflows long under ANSI (the bloom/double-hash rule)
        (
            "hicard",
            (((F.col("event_id") % 999_999_937) * 2654435761) % 999_999_937)
            / 999_999_937.0,
        ),
    ]:
        scored = ev.select(
            "event_type",
            score.alias("score"),
            F.when(coin < score * score, 1).otherwise(0).alias("label"),
        )
        t0 = _t.time()
        m = binary_eval(scored, by=["event_type"]).collect()
        t1 = _t.time()
        sweep = confusion_at_thresholds(
            scored, [i / 100 for i in range(1, 100)], by=["event_type"]
        ).count()
        out.append(
            f"{tag}: binary_eval={t1 - t0:.1f}s groups={len(m)} "
            f"sweep99={_t.time() - t1:.1f}s rows={sweep}"
        )
    return out


def run_evscan(spark, src) -> list[str]:
    """§6 I/O story for the event-scan query families (r14, VERDICT item
    7): every heavy panel reads a FEW columns of the events table, so
    column pruning must reach the parquet scan — `props` (the fat JSON
    payload) and any other unused column must be absent from EVERY scan's
    ReadSchema, or each scan task decompresses payload bytes it never
    uses (the mmodal payload-pruning law, generalized). Asserted per
    family against the formatted plan, alongside the N× runtime. A
    deliberately payload-touching control proves the assertion can fail.

    Families mirror the suite's heaviest event panels: sliding velocity
    (approx NDV — the exact Expand form is the documented scale-flip),
    rolling user profile, hourly type stats, pattern buckets, decayed
    velocity."""
    import re as _re
    import time as _t

    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators import aggregations as A
    from realtime_fraud_detection_spark.operators import windows as W
    from realtime_fraud_detection_spark.operators.timeseries import (
        time_decayed_sum,
    )
    from realtime_fraud_detection_spark.plans.explain import formatted_plan

    # no repartition: keep the scan bare so ReadSchema reflects exactly
    # what each family forces the scan to read; ts cast to the instant
    # type the window operators expect (load_table does the same)
    ev = spark.read.parquet(src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def families():
        yield "velocity", A.velocity_windows(
            ev, "user_id", "ts", "value", ndv_col="event_type",
            size="5 minutes", slide="1 minute", exact=False,
        ), {"props", "event_id"}
        rolled = W.amount_profile(
            W.rolling_ranges(
                ev, "user_id", "ts", "value",
                {"rolling_24h": 86400, "rolling_1h": 3600},
            ),
            "user_id", "value", "ts",
        )
        yield "rolling", rolled.select(
            "user_id", "ts", "value",
            "rolling_24h_count", "rolling_24h_amount",
            "rolling_1h_count", "rolling_1h_amount",
            "amount_pct_rank", "amount_zscore",
        ), {"props", "event_type"}
        yield "hourly", ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(
            F.count("*").alias("tx_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("amount"),
            F.countDistinct("user_id").alias("distinct_users"),
        ), {"props", "event_id"}
        key = F.concat_ws(
            "_", F.lit("pattern"), F.col("event_type"),
            (F.floor(F.col("value") / 100) * 100).cast("long").cast("string"),
        )
        pattern = (
            ev.withColumn("pattern_key", key)
            .groupBy(
                F.window("ts", "10 minutes", "2 minutes").alias("w"),
                "pattern_key",
            )
            .agg(
                F.count("*").alias("tx_count"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("total_amount"),
            )
        )
        yield "pattern", pattern, {"props", "event_id", "user_id"}
        decayed = time_decayed_sum(
            time_decayed_sum(
                ev, "user_id", ts_col="ts", value_col=None,
                half_life="1 hour", out_col="_dc", tiebreak_cols=["event_id"],
            ),
            "user_id", ts_col="ts", value_col="value",
            half_life="1 hour", out_col="_dv", tiebreak_cols=["event_id"],
        )
        yield "decay", decayed.select(
            "user_id", "ts", "event_id", "_dc", "_dv"
        ), {"props", "event_type"}
        # negative control: a payload-touching aggregate MUST show props
        # in ReadSchema — proves the assertion mechanism detects the column
        yield "control_props", ev.groupBy("event_type").agg(
            F.max(F.length("props")).alias("max_props_len")
        ), set()

    out = []
    for tag, df, banned in families():
        plan = formatted_plan(df)
        schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        read_cols = {
            c.split(":")[0].strip() for s in schemas for c in s.split(",") if c
        }
        leaked = read_cols & banned
        if tag == "control_props":
            ok = "props" in read_cols
            out.append(f"{tag}: props_in_readschema={ok} (control)")
            assert ok, plan
            continue
        t0 = _t.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(
            f"{tag}: {_t.time() - t0:.1f}s read_cols={sorted(read_cols)} "
            f"pruned_ok={not leaked}"
        )
        assert not leaked, f"{tag} scan reads {leaked}: {plan}"
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    stages = set(
        (sys.argv[2] if len(sys.argv) > 2 else "asof,gapfill").split(",")
    )
    from realtime_fraud_detection_spark.session import get_spark

    spark = get_spark("scale-probe-events")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = [
        (name, fn)
        for name, stage, fn in [
            ("asof_join", "asof", run_asof),
            ("gap_fill", "gapfill", run_gap_fill),
        ]
        if stage in stages
    ]
    multi = [
        (name, fn)
        for name, stage, fn in [
            ("dims", "dims", run_dims),
            ("bloom", "bloom", run_bloom),
            ("evalm", "evalm", run_evalm),
            ("evscan", "evscan", run_evscan),
        ]
        if stage in stages
    ]

    base = os.path.join(SF_DIR, "events.parquet")
    for _, fn in pairs:
        fn(spark, base)  # warmup: JIT + codegen, discard timings
    for name, fn in pairs:
        t1, n1 = fn(spark, base)
        print(f"{name} 1x: {t1:.1f}s rows={n1}")
    for name, fn in multi:
        for line in fn(spark, base):
            print(f"{name} 1x: {line}")

    build_corpus(spark, replicas)
    for name, fn in pairs:
        tn, nn = fn(spark, OUT)
        print(f"{name} {replicas}x: {tn:.1f}s rows={nn}")
    for name, fn in multi:
        for line in fn(spark, OUT):
            print(f"{name} {replicas}x: {line}")

    spark.stop()


if __name__ == "__main__":
    main()
