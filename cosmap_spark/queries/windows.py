"""Window-function queries (SURVEY.md §2.2 "Window functions") + top-k.

Absent from the reference (samples are independent); stock Spark here,
with deterministic tie-breaks everywhere so the oracle hash matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


@query(
    "q_window_rank",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk
    FROM ranked WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number + rank per group: each customer's top-3 orders."""
    o = load_table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_rk = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).alias("rnk"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "q_window_running",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM lineitem
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per order over line numbers (explicit ROWS frame).
    (l_orderkey, l_linenumber) is not unique in the corpus, so the frame
    order adds l_extendedprice as tiebreak — remaining ties are identical
    rows, for which any order yields the same output multiset."""
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("running_total"),
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead along each user's event timeline."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
    FROM orders
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing over a total order (id tie-break keeps the bucket
    assignment deterministic across engines)."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.ntile(4).over(w).cast("long").alias("quartile")
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           first_value(l_extendedprice) OVER w AS first_price,
           last_value(l_extendedprice) OVER w AS last_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value with an explicit full-partition frame (the
    default frame would make last_value ≡ current row)."""
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap
    + driver merge — no full sort, no shuffle of non-winners)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_window_pct",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, 2), o_orderkey)
    """,
)
def q_window_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics: percent_rank + cume_dist per status group,
    ordered on the ROUNDED price with id tie-break (ulp-stable ranks)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.round("o_totalprice", 2), "o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
