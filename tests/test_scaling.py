"""scaled_shuffle (operators/scaling.py): raises the shuffle-partition
conf from a row-count target, never lowers it, and always restores the
caller's setting — including on error."""

from __future__ import annotations

import pytest

from realtime_fraud_detection_spark.operators.scaling import scaled_shuffle

_KEY = "spark.sql.shuffle.partitions"


def test_raises_and_restores(spark):
    before = spark.conf.get(_KEY)
    with scaled_shuffle(spark, 250_000_000) as parts:
        assert parts == 250
        assert spark.conf.get(_KEY) == "250"
    assert spark.conf.get(_KEY) == before


def test_small_input_keeps_session_conf(spark):
    before = spark.conf.get(_KEY)
    with scaled_shuffle(spark, 1_000) as parts:
        assert parts == int(before)
        assert spark.conf.get(_KEY) == before
    assert spark.conf.get(_KEY) == before


def test_restores_on_error(spark):
    before = spark.conf.get(_KEY)
    with pytest.raises(RuntimeError):
        with scaled_shuffle(spark, 250_000_000):
            raise RuntimeError("boom")
    assert spark.conf.get(_KEY) == before


def test_custom_budget(spark):
    with scaled_shuffle(spark, 1_000_000, rows_per_partition=250_000) as parts:
        assert parts == max(4, int(spark.conf.get(_KEY)))
