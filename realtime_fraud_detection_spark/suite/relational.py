"""Relational operator surface — SURVEY §2.2 (filters/projections/CASE),
§2.3 (joins incl. semi/anti), §2.6 (sort/limit/top-k/set ops), and the
batch GROUP BY shapes underlying §2.5.

The reference only ever filters on fraud_score and joins via Redis lookups;
the full relational surface is exercised here against the TPC-H-ish fixtures
because a user of this engine gets it from Spark SQL (SURVEY §2.6: "we still
get them free from Spark and must still expose them").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import dec_sum
from ..sources.testdata import load_table


# ---------------------------------------------------------------------------
# q_pricing_summary — TPC-H Q1 shape: scan + pushed filter + groupBy agg with
# exact decimal measures (the batch form of A2's measure list).
# ---------------------------------------------------------------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q_top_customers — join + groupBy + deterministic top-k (sort/limit, §2.6;
# the "top-10" shape of ensemble_predictor.py:426-431).
# ---------------------------------------------------------------------------
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dec_sum("o_totalprice").alias("revenue"), F.count("*").alias("order_cnt"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS order_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q_profile_enrich — J5: broadcast LEFT join enrichment with missing-profile
# defaults (TransactionProcessor.java:97-138,489-508). The dimension is
# restricted so ~10% of events hit the default path.
# ---------------------------------------------------------------------------
def q_profile_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 7)
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .select(
            "event_id",
            "user_id",
            "value",
            F.coalesce("c_name", F.lit("unknown_user")).alias("cust_name"),
            F.coalesce("c_acctbal", F.lit(0.5)).alias("acctbal"),
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            F.col("c_custkey").isNotNull().alias("is_known_user"),
        )
    )


SQL_PROFILE_ENRICH = """
SELECT event_id, user_id, value,
       COALESCE(c_name, 'unknown_user') AS cust_name,
       COALESCE(c_acctbal, 0.5) AS acctbal,
       COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
       c_custkey IS NOT NULL AS is_known_user
FROM events LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 10 <> 7) c
  ON user_id = c_custkey
"""


# ---------------------------------------------------------------------------
# q_set_membership — EXISTS / NOT-EXISTS shapes (the J5 "profile found /
# not found" split as first-class operators) AND the §2.6 set operations
# (UNION DISTINCT + EXCEPT, INTERSECT), all tagged and unioned into one
# frame so all five plans land in a single driver correctness row (the
# driver checks at most 50 queries; set-op rows carry c_name = NULL).
# ---------------------------------------------------------------------------
def q_set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    semi_anti = q_semi_anti_join(spark, sf_dir)
    sets = q_set_ops(spark, sf_dir).withColumn(
        "c_name", F.lit(None).cast("string")
    )
    return semi_anti.unionByName(sets)


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    semi = (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("op", F.lit("semi"))
    )
    anti = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("op", F.lit("anti"))
    )
    return semi.unionByName(anti)


SQL_SEMI_ANTI_JOIN = """
SELECT c_custkey, c_name, 'semi' AS op FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
UNION ALL
SELECT c_custkey, c_name, 'anti' AS op FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# q_set_ops — set operations (§2.6): UNION DISTINCT + EXCEPT and INTERSECT,
# tagged into one frame (one driver correctness row for the family).
# ---------------------------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich5k = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    rich3k = cust.filter(F.col("c_acctbal") > 3000).select("c_custkey")
    spenders = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    union_except = (
        building.union(rich5k).distinct().subtract(spenders)
        .withColumn("op", F.lit("union_except"))
    )
    intersect = building.intersect(rich3k).withColumn("op", F.lit("intersect"))
    return union_except.unionByName(intersect)


SQL_SET_OPS = """
SELECT c_custkey, 'union_except' AS op FROM (
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION
   SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
)
UNION ALL
SELECT c_custkey, 'intersect' AS op FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_acctbal > 3000
)
"""

SQL_SET_MEMBERSHIP = f"""
SELECT c_custkey, c_name, op FROM ({SQL_SEMI_ANTI_JOIN})
UNION ALL
SELECT c_custkey, NULL AS c_name, op FROM ({SQL_SET_OPS})
"""


# ---------------------------------------------------------------------------
# q_case_decision — the method-tagged F-family panel (merged round 13 to
# free an oracle-window slot for the k_core promotion; both branches are
# trivial scans over the same events table, so a union weakens nothing —
# each branch stays hash-checked):
#   method='decision' — F6 decision thresholds as a CASE expression
#     (TransactionProcessor.java:444-473) aggregated per band;
#   method='filter'   — F1/F2 predicate + projection; the filter and the
#     column read both reach the parquet scan (PushedFilters/ReadSchema).
# Columns the other branch lacks are NULL.
# ---------------------------------------------------------------------------
def q_case_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    score = F.col("value") / 500.0
    blacklisted = F.col("event_type") == "error"
    risk = (
        F.when(blacklisted, "CRITICAL")
        .when(score >= 0.9, "CRITICAL")
        .when(score >= 0.7, "HIGH")
        .when(score >= 0.5, "MEDIUM")
        .otherwise("LOW")
    )
    decision = (
        F.when(blacklisted, "DECLINE")
        .when(score >= 0.9, "DECLINE")
        .when(score >= 0.7, "REVIEW")
        .otherwise("APPROVE")
    )
    bands = (
        ev.withColumn("risk_level", risk)
        .withColumn("decision", decision)
        .groupBy("risk_level", "decision")
        .agg(F.count("*").alias("cnt"), dec_sum("value").alias("total_value"))
        .select(
            F.lit("decision").alias("method"),
            "risk_level",
            "decision",
            "cnt",
            "total_value",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    filtered = (
        ev.filter(
            (F.col("value") > 250) & F.col("event_type").isin("purchase", "error")
        )
        .select(
            F.lit("filter").alias("method"),
            F.lit(None).cast("string").alias("risk_level"),
            F.lit(None).cast("string").alias("decision"),
            F.lit(None).cast("long").alias("cnt"),
            F.lit(None).cast("double").alias("total_value"),
            "event_id",
            "user_id",
            "event_type",
            "value",
        )
    )
    return bands.unionByName(filtered)


SQL_CASE_DECISION = """
WITH scored AS (
  SELECT value,
    CASE WHEN event_type = 'error' THEN 'CRITICAL'
         WHEN value/500.0 >= 0.9 THEN 'CRITICAL'
         WHEN value/500.0 >= 0.7 THEN 'HIGH'
         WHEN value/500.0 >= 0.5 THEN 'MEDIUM'
         ELSE 'LOW' END AS risk_level,
    CASE WHEN event_type = 'error' THEN 'DECLINE'
         WHEN value/500.0 >= 0.9 THEN 'DECLINE'
         WHEN value/500.0 >= 0.7 THEN 'REVIEW'
         ELSE 'APPROVE' END AS decision
  FROM events)
SELECT 'decision' AS method, risk_level, decision, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS user_id,
       CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS DOUBLE) AS value
FROM scored GROUP BY risk_level, decision
UNION ALL
SELECT 'filter' AS method, CAST(NULL AS VARCHAR) AS risk_level,
       CAST(NULL AS VARCHAR) AS decision, CAST(NULL AS BIGINT) AS cnt,
       CAST(NULL AS DOUBLE) AS total_value,
       event_id, user_id, event_type, value
FROM events
WHERE value > 250 AND event_type IN ('purchase', 'error')
"""


# ---------------------------------------------------------------------------
# q_revenue_by_nation — TPC-H Q5 shape: 6-table join; the dimension chain
# (region→nation) broadcasts, the fact joins shuffle on their keys.
# ---------------------------------------------------------------------------
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count("*").alias("line_cnt"))
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_cnt
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q_rollup — multi-grain aggregation (beyond the reference — SURVEY §2.5
# notes it has no grouping sets; Spark gives rollup free) WITH exact
# distinct counting at every grain (the reference's HashSet counting,
# WindowProcessor.java:496-510; two-phase distinct under Expand here) — the
# former standalone distinct_agg query's per-type rows are this rollup's
# event_type grain, merged to keep the driver's 50-query window.
# ---------------------------------------------------------------------------
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    return ev.rollup("event_type", "user_bucket").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("user_id").alias("distinct_users"),
        dec_sum("value").alias("total_value"),
    )


SQL_ROLLUP = """
SELECT event_type, user_bucket, COUNT(*) AS cnt,
       COUNT(DISTINCT user_id) AS distinct_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM (SELECT event_type, user_id, user_id % 10 AS user_bucket, value FROM events)
GROUP BY ROLLUP (event_type, user_bucket)
"""


# ---------------------------------------------------------------------------
# q_promo_share — TPC-H Q14 shape: join + conditional aggregation into a
# ratio (the reference's "% of decisions by band" reporting generalized).
# ---------------------------------------------------------------------------
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = load_table(spark, sf_dir, "part")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
            / F.sum(revenue).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.count("*").alias("line_cnt"),
    )


SQL_PROMO_SHARE = """
SELECT ROUND(100.0
         * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
       6) AS promo_revenue_pct,
       COUNT(*) AS line_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# q_above_segment_avg — correlated-subquery shape (customers above their own
# market segment's average balance); Catalyst decorrelates this into a
# broadcast join against the per-segment aggregate.
# ---------------------------------------------------------------------------
def q_above_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    seg = cust.groupBy("c_mktsegment").agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count("*")).alias(
            "seg_avg"
        )
    )
    return (
        cust.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .select("c_custkey", "c_mktsegment", "c_acctbal", F.round("seg_avg", 6).alias("seg_avg"))
    )


SQL_ABOVE_SEGMENT_AVG = """
WITH seg AS (
  SELECT c_mktsegment,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS seg_avg
  FROM customer GROUP BY 1)
SELECT c_custkey, c.c_mktsegment, c_acctbal, ROUND(seg_avg, 6) AS seg_avg
FROM customer c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
WHERE c_acctbal > seg_avg
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "profile_enrich": q_profile_enrich,
    "set_membership": q_set_membership,
    "case_decision": q_case_decision,
    "revenue_by_nation": q_revenue_by_nation,
    "rollup": q_rollup,
    "promo_share": q_promo_share,
    "above_segment_avg": q_above_segment_avg,
}

ORACLES = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_customers": SQL_TOP_CUSTOMERS,
    "profile_enrich": SQL_PROFILE_ENRICH,
    "set_membership": SQL_SET_MEMBERSHIP,
    "case_decision": SQL_CASE_DECISION,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "rollup": SQL_ROLLUP,
    "promo_share": SQL_PROMO_SHARE,
    "above_segment_avg": SQL_ABOVE_SEGMENT_AVG,
}
