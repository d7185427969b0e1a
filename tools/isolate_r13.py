#!/usr/bin/env python3
"""Round-13 component isolation: time individual subtrees of the top
compute-heavy queries through the noop sink (guide §1.4), labeled
(guide §1.5), so optimization targets the real cost, not the query total.

Usage: python3 tools/isolate_r13.py [stage ...]   (default: all)
Run SOLO (no concurrent Spark session).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark, label, df, n=1):
    best = []
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"  {label:44s} {' '.join(f'{x:6.2f}' for x in best)}")
    return min(best)


def stage_docsig(spark):
    """doc_signatures components: minhash vs simhash vs winnow."""
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators import dedup as D
    from realtime_fraud_detection_spark.sources.testdata import load_table

    docs = load_table(spark, SF_DIR, "documents", fan_out=True)
    print("docsig:")
    t(spark, "docsig: minhash only", D.minhash_signatures(docs, "text", "doc_id", num_perm=4), n=2)
    t(spark, "docsig: simhash 16+64 only",
      D.simhash_signatures(docs, "text", "doc_id", bits=(16, 64)), n=2)
    t(spark, "docsig: winnow_digest only", D.winnow_digest(docs, "text", "doc_id", k=5, w=4), n=2)


def stage_merchant(spark):
    """merchant_updates: join without final sort; sort separately."""
    from pyspark.sql import functions as F

    from realtime_fraud_detection_spark.operators.joins import merchant_update_join
    from realtime_fraud_detection_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    mid = (F.col("user_id") % 50).alias("merchant_id")
    tx = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("tx_id"), mid, "ts", "value"
    )
    updates = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("update_id"),
        mid,
        "ts",
        (F.col("event_id") % 3 == 0).alias("risk_level_increased"),
        (F.col("event_id") % 11 == 0).alias("newly_blacklisted"),
        (F.col("event_id") % 5 == 0).alias("fraud_rate_increased"),
    )
    print("merchant_updates:")
    joined = merchant_update_join(tx, updates, window="10 minutes")
    sel = joined.select(
        F.col("l.tx_id").alias("tx_id"),
        F.col("l.merchant_id").alias("merchant_id"),
        F.col("r.update_id").alias("update_id"),
        F.round("merchant_risk_delta", 6).alias("merchant_risk_delta"),
    )
    t(spark, "merchant: join only (no sort)", sel, n=2)
    t(spark, "merchant: join + orderBy", sel.orderBy("tx_id", "update_id"), n=2)
    print("  join output rows:", sel.count())


def stage_ensemble(spark):
    from realtime_fraud_detection_spark.suite.mlops_q import q_ensemble_explain

    print("ensemble_explain:")
    t(spark, "ensemble_explain (current)", q_ensemble_explain(spark, SF_DIR), n=3)


def stage_embdup(spark):
    from realtime_fraud_detection_spark.suite.dedup_q import q_embedding_near_dups

    print("embedding_near_dups:")
    t(spark, "embedding_near_dups (current)", q_embedding_near_dups(spark, SF_DIR), n=3)


def stage_retrieval(spark):
    from realtime_fraud_detection_spark.suite.mlops_q import q_retrieval_eval

    print("retrieval_eval:")
    t(spark, "retrieval_eval (current)", q_retrieval_eval(spark, SF_DIR), n=3)


STAGES = {
    "docsig": stage_docsig,
    "merchant": stage_merchant,
    "ensemble": stage_ensemble,
    "embdup": stage_embdup,
    "retrieval": stage_retrieval,
}


def main():
    from realtime_fraud_detection_spark.session import get_spark

    names = sys.argv[1:] or list(STAGES)
    spark = get_spark("isolate-r13")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        STAGES[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
