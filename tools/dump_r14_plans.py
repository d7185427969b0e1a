#!/usr/bin/env python3
"""Dump `.explain("formatted")` for every headline query into
plans/r14/<query>_<tag>.txt (tag = before/after), plus a one-line-per-query
summary (Exchange count, join strategies, Python boundary nodes) to stdout.

Usage: python3 tools/dump_r14_plans.py [before|after] [names...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r14"


def summarize(plan: str) -> str:
    # node-id based counts (formatted plans print every node twice: tree+detail)
    ex = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
    reused = len(set(re.findall(r"\((\d+)\) ReusedExchange", plan)))
    smj = len(set(re.findall(r"\((\d+)\) SortMergeJoin", plan)))
    bhj = len(set(re.findall(r"\((\d+)\) BroadcastHashJoin", plan)))
    shj = len(set(re.findall(r"\((\d+)\) ShuffledHashJoin", plan)))
    bnl = len(set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan)))
    cart = len(set(re.findall(r"\((\d+)\) CartesianProduct", plan)))
    py = len(set(re.findall(r"\((\d+)\) (?:BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)", plan)))
    gen = len(set(re.findall(r"\((\d+)\) Generate", plan)))
    sorts = len(set(re.findall(r"\((\d+)\) Sort", plan)))
    return (
        f"Exchange={ex} Reused={reused} SMJ={smj} BHJ={bhj} SHJ={shj} "
        f"BNLJ={bnl} Cartesian={cart} PyNodes={py} Generate={gen} Sort={sorts}"
    )


def main() -> None:
    from bench import EXTRA, HEADLINE

    from realtime_fraud_detection_spark.plans.explain import formatted_plan
    from realtime_fraud_detection_spark.session import get_spark
    from realtime_fraud_detection_spark.suite import all_queries

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-r14-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in HEADLINE:
        if only and name not in only:
            continue
        fn = qs.get(name) or EXTRA[name]
        try:
            plan = formatted_plan(fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:200])
            continue
        with open(f"{OUT}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(f"{name}: {summarize(plan)}")
    spark.stop()


if __name__ == "__main__":
    main()
