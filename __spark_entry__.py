"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (sliding-window user velocity, SURVEY §2.5 A1)
                 on /root/testdata/sf0.001.
queries()      — every implemented operator from SURVEY §2 + the
                 training-data-pipeline operators, one callable per query.
oracle_sql()   — DuckDB-equivalent SQL for each (omitted only for
                 approximate-by-construction ops, e.g. LSH-bucketed ANN).

Implementations live in realtime_fraud_detection_spark/ (operators/,
functions/, suite/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_fraud_detection_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from realtime_fraud_detection_spark.suite.eventtime_q import q_velocity_sliding

    return q_velocity_sliding(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.all_queries()


def oracle_sql() -> dict[str, str]:
    return suite.all_oracles()
