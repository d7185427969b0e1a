"""Graph-analytics queries (rows-only tail: iterative algorithms have no
single-statement SQL form; the algorithms are pinned by exact-replay
tests — tests/test_pagerank.py, tests/test_fraud_rings.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table


# PageRank over the customer→supplier purchase graph (who funnels demand
# to whom): deterministic ranks (decimal-summed power iteration), top-25
# by rank with id tie-break.
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_suppkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            # suppliers offset into their own id space (customer and
            # supplier keys overlap numerically)
            (F.col("l_suppkey") + F.lit(10_000_000)).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iters=8)
    return (
        pr.select(
            "v",
            F.when(F.col("v") >= 10_000_000, "supplier").otherwise("customer").alias("side"),
            F.round("rank", 9).alias("rank"),
        )
        .orderBy(F.desc("rank"), "v")
        .limit(25)
    )


QUERIES = {
    "pagerank": q_pagerank,
}

ORACLES: dict[str, str] = {}
