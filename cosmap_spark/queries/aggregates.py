"""Aggregation queries (SURVEY.md §2.2 "Aggregations").

The reference's only aggregation is the per-sample count+sum (O27,
covered by q_sample_agg).  Spark gives partial/final aggregation (map-side
combine) automatically — every ``groupBy().agg()`` below ships partial
states, not rows, through the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_cust,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate alongside plain aggregates (two-phase expand)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query("q_agg_approx_distinct")  # rows-only: HLL estimate is engine-specific
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the sketch path for 100 TB where
    exact distinct would shuffle every key.  Checked rows-only (estimates
    are engine-specific); a unit test bounds the relative error."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("n_cust_approx"))
    )


@query(
    "q_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (subtotals + grand total);
    the dimension joins broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two independent dimensions (all 4 grouping sets)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT l_suppkey,
           count(*) AS n,
           round(sum(l_quantity), 2) AS total_qty,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py): partial agg
    per (key, salt) then final combine per key.  The oracle is the PLAIN
    single-phase groupBy — salting must be invisible in the result; this
    query is the proof.  At scale, the salt spreads a hot key over
    n_salts reducers; the second shuffle moves only n_salts rows per
    key."""
    from cosmap_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_suppkey"],
        {
            "n": (F.count("*"), F.sum("n")),
            "total_qty": (F.sum("l_quantity"), F.sum("total_qty")),
            "max_price": (F.max("l_extendedprice"), F.max("max_price")),
        },
        n_salts=16,
        salt_source="l_orderkey",
    )
    return out.select(
        "l_suppkey",
        F.col("n").cast("long").alias("n"),
        F.round("total_qty", 2).alias("total_qty"),
        F.round("max_price", 2).alias("max_price"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is order-nondeterministic
    under partitioning, so the deterministic form is array_sort THEN
    concat — the required pattern for reproducible string aggs on any
    cluster (same reason the sampler avoids rand())."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names")
    )


@query(
    "q_arg_max",
    oracle="""
    SELECT o_orderstatus, o_orderkey AS top_order, price AS top_price
    FROM (
      SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS price,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY round(o_totalprice, 2) DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped arg-max via ``max_by`` on a (value, id) struct — the
    aggregation form of per-group top-1: partial/final combine moves ONE
    row per group per partition through the shuffle, vs a window sort of
    every row.  The struct tie-break makes ties deterministic (bare
    max_by is not); the oracle is the equivalent window top-1."""
    o = load_table(spark, sf_dir, "orders")
    key = F.struct(F.round("o_totalprice", 2).alias("p"), F.col("o_orderkey").alias("k"))
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", key).alias("top_order"),
        F.max(F.round("o_totalprice", 2)).alias("top_price"),
    )
