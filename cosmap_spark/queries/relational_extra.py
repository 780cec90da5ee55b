"""Additional relational surface: grouping sets, pivot, subqueries,
percentiles, range-frame windows, conditional aggregation.

All absent from the reference (whose only relational ops are the spatial
scan/filter/agg chain); this is the "general relational surface" half of
the engine (SURVEY.md intro paragraph) exercised against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


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
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the global mean balance.
    DataFrame form: broadcast the 1-row aggregate and filter — the same
    plan Catalyst builds for the SQL subquery."""
    c = load_table(spark, sf_dir, "customer")
    mean = c.agg(F.avg("c_acctbal").alias("__mean"))
    return (
        c.crossJoin(F.broadcast(mean))
        .where(F.col("c_acctbal") > F.col("__mean"))
        .select("c_custkey", "c_acctbal")
    )


@query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(min(l_quantity), 6) AS min_qty,
           round(max(l_quantity), 6) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``: both linear-interpolation on the sorted
    multiset).  The sketch-based scale path is q_approx_percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.min("l_quantity"), 6).alias("min_qty"),
        F.round(F.max("l_quantity"), 6).alias("max_qty"),
    )


@query("q_approx_percentile")  # rows-only: sketch estimates are engine-specific
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch) — the 100 TB path where exact
    percentile's full sort/shuffle is prohibitive.  The two quantiles are
    projected out as SCALAR columns (not an array) so the driver's
    canonicalizer can sort/hash the rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, array(0.5, 0.9), 1000)").alias("__q")
    ).select(
        "l_returnflag",
        F.col("__q")[0].alias("approx_p50"),
        F.col("__q")[1].alias("approx_p90"),
    )


@query(
    "q_window_range",
    oracle="""
    SELECT event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 4) AS rolling_10m
    FROM events
    """,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per user, rolling 10-minute value sum.
    Range frames are tie-safe (the frame is a value interval, not a row
    interval), so equal-second events need no tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, Window.currentRow)
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 4).alias("rolling_10m")
    )


@query(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice ELSE 0.0 END), 2) AS urgent_total
    FROM orders GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE bucketing + conditional aggregation (FILTER / sum-CASE)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.round(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
                .otherwise(0.0)
            ), 2,
        ).alias("urgent_total"),
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
    "q_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4):
    parse_json once, typed variant_get extraction — the modern
    replacement for per-path get_json_object re-parsing (q_json_funcs
    covers the classic form).  Columnar-shredded at rest when written;
    here it exercises parse + typed path extraction."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_val"),
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
    shape as the explicit row_number form in q_window_rank) — declared to
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
