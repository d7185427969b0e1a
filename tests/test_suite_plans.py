"""Suite-wide plan hygiene: every driver-facing query is pure JVM-side
expression code — no row-at-a-time Python UDFs and no Arrow boundary
anywhere in the declared suite (the three sanctioned Python crossings —
stateful ops, model scoring, multimodal decode — are streaming/ML surfaces,
not suite queries). This is the "stay inside whole-stage codegen" design
position, asserted rather than assumed."""

from __future__ import annotations

import pytest

from realtime_fraud_detection_spark.plans.explain import formatted_plan
from realtime_fraud_detection_spark.suite import all_queries

SF_SMOKE = "/root/testdata/sf0.001"

# python-execution operators that must never appear in a suite query plan
PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")

# ann_ivf trains an MLlib KMeans eagerly (seconds) — covered by its own
# recall test; excluded here to keep this sweep fast.
EXCLUDE = {"ann_ivf"}


@pytest.mark.parametrize("name", [n for n in all_queries() if n not in EXCLUDE])
def test_suite_query_is_jvm_side(spark, name):
    df = all_queries()[name](spark, SF_SMOKE)
    plan = formatted_plan(df)
    for node in PY_NODES:
        assert node not in plan, f"{name}: {node} in physical plan"
