"""Set-operation queries (SURVEY.md §2.2 "Set ops") — absent in the
reference; stock Spark with ANSI bag/set semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


@query(
    "q_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, duplicates preserved)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): customers that placed orders."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with set semantics (dedup across both inputs)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "q_cross_join",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (tiny dims only — the engine's plans
    never cross-join large tables; see the cone search's equi-join
    design for why)."""
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(r2).where(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
    )


@query(
    "q_not_in_null",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (
      SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey ELSE NULL END
      FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def q_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with NULLs in the subquery — the classic three-valued-logic
    trap: any NULL in the IN-list makes NOT IN never-true, so the result
    is customers only when the null-producing branch is absent.  Both
    engines must agree on the (often surprising) ANSI semantics."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__nn_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__nn_orders")
    return spark.sql(
        """
        SELECT c_custkey FROM __nn_customer
        WHERE c_custkey NOT IN (
          SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey ELSE NULL END
          FROM __nn_orders WHERE o_orderstatus = 'F'
        )
        """
    )


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): customers that never ordered."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)
