"""Beyond-ledger TPC-H shapes: the decorrelation zoo.

The 50-query driver ledger (SURVEY.md §2.3) already carries Q1/Q3/Q5/
Q6/Q10 shapes (queries/tpch.py).  This module adds the remaining
CLASSES of relational query a reference migrant could bring — EXISTS /
NOT EXISTS, correlated scalar subqueries, grouped-HAVING IN, left-join
distributions — adapted to the driver's trimmed star schema.  They are
NOT registered in the bounded ledger; tests/test_tpch_extra.py runs
them against DuckDB oracles with the driver's exact normalization, so
they are differential-tested with the same rigor, just pytest-gated.

Every implementation decorrelates the textbook subquery the way a
100 TB plan must:

* EXISTS → left-semi hash join (never a per-row probe);
* NOT EXISTS / NOT IN (null-safe by construction here) → left-anti;
* correlated scalar aggregate → groupBy + equi-join of the aggregate
  side (computed once, not per outer row);
* HAVING-IN → the grouped aggregate as a join input.

Fact tables are never broadcast; dimension sides are left to AQE's
size-based broadcast decisions, same policy as queries/tpch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

QueryFn = "Callable[[SparkSession, str], DataFrame]"

EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict[str, str] = {}


def _extra(name: str, oracle: str):
    def deco(fn):
        EXTRA_QUERIES[name] = fn
        EXTRA_ORACLES[name] = oracle
        return fn

    return deco


@_extra(
    "q_tpch_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_tpch_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a LEFT-SEMI join: orders
    (date-filtered at the scan) semi-joined to returned line items, then
    one small aggregation.  The semi join's build side is the filtered
    fact projection (l_orderkey only) — the probe never materializes
    matches, so a hot order with 1000 returned lines costs one hit."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@_extra(
    "q_tpch_order_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q_tpch_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the left-join count distribution: customers
    (including order-less ones, hence LEFT) joined to orders, grouped
    twice.  count(o_orderkey) counts non-null matches only — the LEFT
    join's null row contributes 0, which is what distinguishes this
    from an inner-join count.  Two shuffles by necessity (per-customer,
    then per-count); the second input is one row per customer."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_extra(
    "q_tpch_parts_supp",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 2, 3, 4, 5)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_parts_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — NOT IN decorrelated to a LEFT-ANTI join (the
    subquery's key is non-null by schema, so anti-join ≡ NOT IN with no
    null trap), plus a distinct-count aggregate over the join result.
    The excluded-supplier set is tiny and broadcasts; part filters sit
    on the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_extra(
    "q_tpch_small_qty",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cap
          FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_cap
    """,
)
def q_tpch_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — the correlated scalar subquery (per-part
    average quantity) decorrelated into ONE grouped aggregate computed
    over the fact table and equi-joined back: the textbook plan
    re-evaluates the subquery per outer row; this plan pays one extra
    aggregation shuffle, total cost two fact scans regardless of
    matches.  (Half the average as the small-quantity cap, per spec.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    caps = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(caps, "l_partkey")
        .join(p, li["l_partkey"] == p["p_partkey"])
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_extra(
    "q_tpch_big_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def q_tpch_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — IN over a grouped-HAVING subquery: the large-
    order keys come from one aggregate over the fact table and feed a
    LEFT-SEMI join (the IN set is already distinct by construction of
    GROUP BY, so semi ≡ IN).  At scale the semi join's build side is
    the small qualifying-key set, not the fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(big, "o_orderkey", "left_semi")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@_extra(
    "q_tpch_idle_customers",
    oracle="""
    SELECT substr(c.c_name, -1, 1) AS name_bucket,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY name_bucket
    """,
)
def q_tpch_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — global scalar subquery + NOT EXISTS: the
    positive-balance average is ONE uncorrelated scalar (computed once,
    a 1-row broadcast — the same scalar-subquery shape as
    q_stream_windows' cutoff), and NOT EXISTS decorrelates to a
    LEFT-ANTI join against the order keys.  Grouped by the last
    character of the customer name (the trimmed schema's stand-in for
    the phone country code)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.substring(F.col("c_name"), -1, 1).alias("name_bucket"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
