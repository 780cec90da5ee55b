"""Additional relational surface: pivot, heavy hitters, correlated
LATERAL subqueries.

All absent from the reference (whose only relational ops are the spatial
scan/filter/agg chain); this is the "general relational surface" half of
the engine (SURVEY.md intro paragraph) exercised against the oracle.
(Grouping sets, percentiles, scalar subqueries, CASE aggregation, range
frames, and VARIANT moved into the consolidated suites in round 2 —
see SURVEY.md §2.3 for the mapping.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table

_STATUSES = ("F", "O", "P")


@query(
    "q_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(
               f"nullif(count(*) FILTER (WHERE o_orderstatus = '{s}'), 0) AS {s}"
               for s in _STATUSES
           )}
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order counts per priority by status.  The
    oracle's NULLIF matches Spark's null-for-empty-cell convention."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .count()
    )


@query(
    "q_heavy_hitters",
    oracle="""
    SELECT o_orderpriority AS item, count(*) AS est_count
    FROM orders GROUP BY 1 ORDER BY est_count DESC, item LIMIT 3
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k sketch (Spark 4) — frequent-item
    detection without a full groupBy shuffle: partial sketches merge
    associatively, the map-side combine IS the algorithm.  The oracle is
    the EXACT top-3: with 5 distinct items the sketch (default capacity
    10k) is provably exact, and top-3 membership is deterministic at the
    gate SFs (the only count tie sits inside the top 3).  Also
    exactness-tested in tests/test_properties.py."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.explode(F.expr("approx_top_k(o_orderpriority, 3)")).alias("hit")
    ).select(
        F.col("hit.item").alias("item"),
        F.col("hit.count").cast("long").alias("est_count"),
    )


@query(
    "q_lateral_topn",
    oracle="""
    SELECT o.o_orderkey, t.l_linenumber, t.price
    FROM orders o,
    LATERAL (
      SELECT l_linenumber, round(l_extendedprice, 2) AS price
      FROM lineitem
      WHERE l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber
      LIMIT 2
    ) t
    WHERE o.o_orderdate >= DATE '1997-03-01' AND o.o_orderdate < DATE '1997-04-01'
    """,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 lineitems per March-1997 order.
    Catalyst decorrelates this into a window-ranked join (same physical
    shape as the explicit row_number form in q_window_ranks) — declared to
    pin the decorrelation path, not as a new physical operator."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.price
        FROM v_orders o,
        LATERAL (
          SELECT l_linenumber, round(l_extendedprice, 2) AS price
          FROM v_lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber
          LIMIT 2
        ) t
        WHERE o.o_orderdate >= DATE '1997-03-01' AND o.o_orderdate < DATE '1997-04-01'
        """
    )
