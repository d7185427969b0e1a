"""A/B the round-13 Arrow simhash kernel vs the explode+agg expression
form, fresh session per arm, noop sink, solo. Usage:
    python3 tools/ab_simhash_r13.py {arrow|expr} [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources.testdata import load_table
from realtime_fraud_detection_spark.operators import dedup as D


def main() -> None:
    arm = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_simhash")
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    docs.count()  # warm the scan
    use_arrow = arm == "arrow"
    for trial in range(4):
        t0 = time.monotonic()
        sig = D.simhash_signatures(docs, "text", "doc_id", bits=(16, 64),
                                   use_arrow=use_arrow)
        sig.write.format("noop").mode("overwrite").save()
        print(f"{arm} trial{trial}: {time.monotonic() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
