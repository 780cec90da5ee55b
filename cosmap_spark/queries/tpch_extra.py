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


@_extra(
    "q_tpch_min_cost_supplier",
    oracle="""
    WITH offers AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT p.p_partkey, s.s_name, round(o.unit_cost, 4) AS unit_cost
    FROM offers o
    JOIN part p ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    WHERE p.p_size <= 5
      AND o.unit_cost = (SELECT min(o2.unit_cost) FROM offers o2
                         WHERE o2.l_partkey = o.l_partkey)
    """,
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated scalar MIN (cheapest supplier
    per part within a region; the trimmed schema's lineitem stands in
    for partsupp, unit cost for ps_supplycost).  The textbook plan
    re-runs the min per outer row; the 100 TB plan computes the
    region-restricted offer table ONCE, takes ONE grouped min per
    part, and equi-joins back on (part, cost) — two aggregations and a
    hash join, no re-evaluation.  The double-equality join is safe
    cross-engine: both sides derive from the identical IEEE division
    and an order-independent MIN."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    region_supp = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name")
    )
    offers = (
        li.join(
            region_supp.select(F.col("s_suppkey").alias("l_suppkey")),
            "l_suppkey", "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("unit_cost"))
    )
    # rename the grouped side's key: best derives from offers' own
    # lineage, so a same-name join condition is an ambiguous self-join
    best = offers.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("best_cost")
    ).select(F.col("l_partkey").alias("best_partkey"), "best_cost")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    return (
        offers.join(
            best,
            (offers["l_partkey"] == F.col("best_partkey"))
            & (offers["unit_cost"] == F.col("best_cost")),
        )
        .join(p, offers["l_partkey"] == p["p_partkey"])
        .join(region_supp,
              offers["l_suppkey"] == region_supp["s_suppkey"])
        .select(
            "p_partkey", "s_name",
            F.round(offers["unit_cost"], 4).alias("unit_cost"),
        )
    )


@_extra(
    "q_tpch_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l.l_shipdate) AS INT) AS l_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate BETWEEN DATE '1995-01-01'
                                 AND DATE '1996-12-31') t
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — the multi-way star join with date arithmetic
    and a symmetric nation-pair predicate: lineitem joins supplier,
    orders, customer and nation TWICE (aliased dimension reuse), the
    ship-date range sits on the fact scan (pushed filter), the
    nation-pair disjunction evaluates after the two tiny dimension
    joins, and one grouped sum per (supp, cust, year) finishes it.
    Both nation sides broadcast; the fact table shuffles once for the
    orders join and once for the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"),
                  F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1")
         & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2")
           & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("nk1"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("nk2"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"))
    )


@_extra(
    "q_tpch_market_share",
    oracle="""
    SELECT l_year,
           round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                          ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM (SELECT CAST(year(o.o_orderdate) AS INT) AS l_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n1.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n2.n_regionkey
          WHERE r.r_name = 'ASIA' AND p.p_size <= 10
            AND o.o_orderdate BETWEEN DATE '1995-01-01'
                                  AND DATE '1996-12-31') t
    GROUP BY l_year
    """,
)
def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — market share: one nation's fraction of the
    total qualifying volume per year.  The share's numerator is a
    CONDITIONAL SUM inside the same groupBy as the denominator (the
    bm25 variants= lesson: sibling agg columns above one exchange,
    never two aggregations), so the whole query is the star join plus
    ONE aggregate.  The customer-side region restriction reuses the
    aliased-nation trick from Q7."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("nk1"),
                  F.col("n_name").alias("supp_nation"))
    n2 = (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("nk2"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"], "left_semi")
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("nk1"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("nk2"),
              "left_semi")
        .groupBy(F.year("o_orderdate").alias("l_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", vol)
                  .otherwise(F.lit(0.0)))
            / F.sum(vol), 4
        ).alias("mkt_share"))
    )


@_extra(
    "q_tpch_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           round(r.total_revenue, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the view/CTE max: per-supplier quarterly
    revenue, keep the supplier(s) at the maximum.  The CTE computes
    ONCE and feeds both the outer join and the scalar max (Catalyst
    sees one aggregation lineage; the max is a 1-row broadcast — the
    intended constant-size BroadcastNestedLoopJoin class, same as
    q_tpch_idle_customers' scalar).  The max-equality filter is
    self-consistent per engine (the max is of its OWN sums), so the
    selected supplier set matches cross-engine even though a double
    sum is order-dependent in its last ulp."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(
        F.col("l_suppkey").alias("supplier_no")
    ).agg(F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).alias("total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        s.join(revenue, s["s_suppkey"] == revenue["supplier_no"])
        .join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .select(
            "s_suppkey", "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
    )


@_extra(
    "q_tpch_bulk_suppliers",
    oracle="""
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_size <= 5)
          AND l.l_shipdate >= DATE '1996-01-01'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 100)
      AND s.s_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_name IN ('NATION_1', 'NATION_2',
                                             'NATION_3'))
    """,
)
def q_tpch_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — the NESTED IN chain (part-IN inside a grouped
    lineitem-IN inside supplier, plus a nation IN): each IN
    decorrelates to a LEFT-SEMI hash join, innermost first — parts
    semi-restrict the fact scan, one grouped HAVING produces the
    qualifying supplier keys, and supplier semi-joins that set and the
    (tiny, broadcast) nation selection.  Three semi joins, one
    aggregate, zero subquery re-evaluation."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    small_parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    bulk = (
        li.join(small_parts, "l_partkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    nkeys = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select(F.col("n_nationkey").alias("s_nationkey"))
    )
    return (
        s.join(bulk, "s_suppkey", "left_semi")
        .join(F.broadcast(nkeys), "s_nationkey", "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@_extra(
    "q_tpch_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the EXISTS + NOT-EXISTS chain with an
    INEQUALITY correlation (another supplier in the same order /
    no OTHER supplier also at fault): the inequality means a plain
    semi/anti on the order key is wrong, and the textbook plan is a
    per-row re-probe.  The published decorrelation is per-ORDER
    supplier statistics computed once —

      EXISTS other supplier        ≡ n_suppliers(order) ≥ 2
      NOT EXISTS other at fault    ≡ n_fault_suppliers(order) = 1
                                     (l1's own supplier is at fault
                                      and in the set, so "only me")

    — ONE distinct-count aggregate per order, equi-joined back; the
    fact table shuffles by order key once for the stats and once for
    the probe join."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fault"),
    )
    l1 = li.where(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1["l_orderkey"] == o["o_orderkey"])
        .join(per_order, "l_orderkey")
        .where((F.col("n_supps") >= 2) & (F.col("n_fault") == 1))
        .join(s, l1["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@_extra(
    "q_tpch_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.8 * p.p_retailprice * l.l_quantity), 2)
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-type profit by (nation, year): a
    four-way star join with a substring predicate on the part
    dimension and an arithmetic measure (the trimmed schema's
    ``0.8 * p_retailprice * l_quantity`` stands in for
    ``ps_supplycost * l_quantity``).  The part filter sits on the
    dimension scan (substring predicates don't prune row groups, but
    the filtered dimension broadcasts); the fact table shuffles only
    for the orders join and the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("red")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


@_extra(
    "q_tpch_important_parts",
    oracle="""
    WITH pv AS (
        SELECT l.l_partkey,
               sum(l.l_extendedprice * l.l_quantity) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2')
        GROUP BY l.l_partkey)
    SELECT l_partkey, round(val, 2) AS val
    FROM pv
    WHERE val > (SELECT 0.001 * sum(val) FROM pv)
    """,
)
def q_tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — the scalar-subquery-in-HAVING: per-part value
    within a nation group, keeping parts above a FRACTION of the
    group's total.  The per-part aggregate computes once; the total is
    ONE further aggregation of it (never a second fact scan) joined
    back as a 1-row broadcast — the intended constant-size
    BroadcastNestedLoopJoin class."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    pv = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"],
              "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(
            F.col("l_extendedprice") * F.col("l_quantity")
        ).alias("val"))
    )
    total = pv.agg((F.lit(0.001) * F.sum("val")).alias("cut"))
    return (
        pv.join(F.broadcast(total))
        .where(F.col("val") > F.col("cut"))
        .select("l_partkey", F.round("val", 2).alias("val"))
    )


@_extra(
    "q_tpch_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    GROUP BY linestatus
    """,
)
def q_tpch_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — the conditional-count pivot after a fact-fact
    join: per line status (the trimmed schema's ship-mode stand-in),
    urgent and non-urgent order counts as SIBLING conditional sums of
    one aggregate (the bm25 variants= rule), date range pushed to the
    lineitem scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0))
            .cast("long").alias("low_line_count"),
        )
    )


@_extra(
    "q_tpch_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'
    """,
)
def q_tpch_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion revenue share: a conditional-sum
    NUMERATOR over the same rows as the denominator, both sibling agg
    columns of ONE month-filtered join (two aggregations over one scan
    would be the naive translation).  Date range on the fact scan;
    the part dimension joins broadcast-sized."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-03-01", "1996-03-31")
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol)
                    .otherwise(F.lit(0.0)))
            / F.sum(vol), 4,
        ).alias("promo_revenue"))
    )


@_extra(
    "q_tpch_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — the three-way DISJUNCTION of conjunctive
    (brand, size, quantity) envelopes: the classic predicate-
    normalization test.  The common superset predicates (size >= 1,
    quantity within the union envelope) are factored ONTO THE SCANS so
    both sides prune before the join; the exact disjunction remains as
    the post-join residual.  One equi-join, one global sum — never a
    union of three scans."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(1, 15)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    arm = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2")
           & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .where(arm)
        .agg(F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            2,
        ).alias("revenue"))
    )
