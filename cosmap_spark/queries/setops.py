"""Set-operation + membership-subquery queries (SURVEY.md §2.2 "Set ops"
/ "Subqueries") — absent in the reference; stock Spark with ANSI bag/set
semantics.

Consolidated (round 2) into ONE tagged-union ledger query: every branch
produces ``(op, k, side)`` rows, so the driver's multiset hash verifies
each operator's exact output while consuming a single slot of the
bounded correctness window.  The branches stay independent plans —
Spark unions are bag concatenation, no cross-branch shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table

_SETOPS_ORACLE = """
    SELECT 'union_all' AS op, c_nationkey AS k, 'customer' AS side FROM customer
    UNION ALL
    SELECT 'union_all', s_nationkey, 'supplier' FROM supplier
    UNION ALL
    SELECT 'union_distinct', k, NULL FROM (
      SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', k, NULL FROM (
      SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'except', k, NULL FROM (
      SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'cross', NULL, r1.r_name || '->' || r2.r_name
    FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey <> r2.r_regionkey
    UNION ALL
    SELECT 'not_in_null', c_custkey, NULL FROM customer
    WHERE c_custkey NOT IN (
      SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey ELSE NULL END
      FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT 'above_mean', c_custkey, NULL FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
"""


@query("q_setops", oracle=_SETOPS_ORACLE)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The set-op / membership surface as one tagged union:

    * ``union_all``       — bag union, duplicates preserved;
    * ``union_distinct``  — set union (dedup across both inputs);
    * ``intersect``       — set intersect: customers that placed orders;
    * ``except``          — set difference: customers that never ordered;
    * ``cross``           — explicit cartesian product (tiny dims only —
      the engine's plans never cross-join large tables; see the cone
      search's equi-join design for why);
    * ``not_in_null``     — NOT IN with NULLs in the subquery, the classic
      three-valued-logic trap: any NULL in the IN-list makes NOT IN
      never-true, so rows survive only when the null-producing branch is
      absent.  Both engines must agree on the (often surprising) ANSI
      semantics;
    * ``above_mean``      — scalar subquery: customers above the global
      mean balance, the 1-row aggregate broadcast + filter — the same
      plan Catalyst builds for the SQL subquery.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    r = load_table(spark, sf_dir, "region")

    def tag(df: DataFrame, op: str, k, side) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            (k if k is not None else F.lit(None)).cast("long").alias("k"),
            (side if side is not None else F.lit(None)).cast("string").alias("side"),
        )

    union_all = tag(c, "union_all", F.col("c_nationkey"), F.lit("customer")).unionByName(
        tag(s, "union_all", F.col("s_nationkey"), F.lit("supplier"))
    )
    union_distinct = tag(
        c.select(F.col("c_nationkey").alias("k"))
        .unionByName(s.select(F.col("s_nationkey").alias("k")))
        .distinct(),
        "union_distinct", F.col("k"), None,
    )
    intersect = tag(
        c.select(F.col("c_custkey").alias("k"))
        .intersect(o.select(F.col("o_custkey").alias("k"))),
        "intersect", F.col("k"), None,
    )
    except_ = tag(
        c.select(F.col("c_custkey").alias("k"))
        .subtract(o.select(F.col("o_custkey").alias("k"))),
        "except", F.col("k"), None,
    )
    r1 = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("n1"))
    r2 = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("n2"))
    cross = tag(
        r1.crossJoin(r2).where(F.col("k1") != F.col("k2")),
        "cross", None, F.concat(F.col("n1"), F.lit("->"), F.col("n2")),
    )
    c.createOrReplaceTempView("__so_customer")
    o.createOrReplaceTempView("__so_orders")
    not_in = tag(
        spark.sql(
            """
            SELECT c_custkey FROM __so_customer
            WHERE c_custkey NOT IN (
              SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey ELSE NULL END
              FROM __so_orders WHERE o_orderstatus = 'F')
            """
        ),
        "not_in_null", F.col("c_custkey"), None,
    )
    mean = c.agg(F.avg("c_acctbal").alias("__mean"))
    above_mean = tag(
        c.crossJoin(F.broadcast(mean)).where(F.col("c_acctbal") > F.col("__mean")),
        "above_mean", F.col("c_custkey"), None,
    )
    out = union_all
    for branch in (union_distinct, intersect, except_, cross, not_in, above_mean):
        out = out.unionByName(branch)
    return out
