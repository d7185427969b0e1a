#!/usr/bin/env python3
"""Value-level determinism check for the ROWS-ONLY suite queries.

The driver's correctness gate hash-compares the 50 oracled queries but
only row-counts the rows-only tail — their VALUES are pinned by per-op
pytest parity files, not by any whole-query check. This tool closes that
gap: every rows-only query runs in TWO independent SparkSessions (fresh
applicationId, so every session cache — simhash signatures, quantizers,
BM25 doc-term table, graph edges — rebuilds from scratch) and the
results must match bit-exactly under check_oracle's comparator. A
mismatch means hidden run-to-run nondeterminism (float accumulation
order, unseeded model fits, cache-vs-fresh divergence).

Usage: python tools/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from tools.check_oracle import compare  # noqa: E402


def _run_all(sf_dir: str, names: list[str]) -> dict:
    """One fresh session: run each query, collect as pandas, stop."""
    import __spark_entry__ as entry_mod
    from realtime_fraud_detection_spark.session import get_spark

    spark = get_spark("check-determinism", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out = {}
    for name in names:
        try:
            out[name] = qs[name](spark, sf_dir).toPandas()
        except Exception:
            out[name] = traceback.format_exc()
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    names = [
        n
        for n in entry_mod.queries()
        if n not in oracles and (not only or n in only)
    ]
    t0 = time.time()
    a = _run_all(sf_dir, names)
    b = _run_all(sf_dir, names)
    failed = []
    for name in names:
        ra, rb = a[name], b[name]
        if isinstance(ra, str) or isinstance(rb, str):
            print(f"FAIL  {name}: raised\n{ra if isinstance(ra, str) else rb}")
            failed.append(name)
            continue
        problems = compare(name, ra, rb)
        if problems:
            print(f"FAIL  {name}: two fresh sessions disagree")
            for p in problems:
                print(f"      {p}")
            failed.append(name)
        else:
            print(f"OK    {name}: rows={len(ra)} identical across sessions")
    print(f"\n{len(names) - len(failed)}/{len(names)} deterministic "
          f"[{time.time() - t0:.0f}s]")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
