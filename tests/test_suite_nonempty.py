"""Non-emptiness pins for rows-only suite queries (round-7 verdict
finding 3): a rows-only query outside the driver's first-50 window gets
no correctness check at all, so a silently-empty result is a breakage
window. tools/check_oracle.py now FAILS on an unexpected zero-row
rows-only result at every SF (EXPECTED_EMPTY allowlist); this test pins
the one allowlisted case — `communities` is expectedly empty at sf0.001
(the >=2-shared-affinity graph has no edges at that scale) — as
NON-empty at the sf0.01 gate scale, so the operator is exercised on at
least one checked fixture."""

from __future__ import annotations

from realtime_fraud_detection_spark.suite import all_queries
from tests.conftest import SF_CORRECTNESS


def test_communities_nonempty_at_gate_scale(spark):
    df = all_queries()["communities"](spark, SF_CORRECTNESS)
    assert df.limit(1).count() == 1
