"""Window-function queries (SURVEY.md §2.2 "Window functions") + top-k.

Absent from the reference (samples are independent); stock Spark here,
with deterministic tie-breaks everywhere so the oracle hash matches.
Consolidated (round 2) into three suites — rank-family, frame-family,
offset/range-family — so the whole surface fits the driver's bounded
correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


@query(
    "q_window_ranks",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS rnk,
             CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
             round(percent_rank() OVER w_pct, 6) AS pct_rank,
             round(cume_dist() OVER w_pct, 6) AS cume
      FROM orders
      WINDOW w_pct AS (PARTITION BY o_orderstatus
                       ORDER BY round(o_totalprice, 2), o_orderkey)
    )
    SELECT * FROM ranked WHERE rn <= 3
    """,
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank family in one pass: row_number + rank per customer,
    global ntile quartile, percent_rank + cume_dist per status group
    (ordered on the ROUNDED price with id tie-break — ulp-stable ranks).
    The rn filter keeps each customer's top-3 orders; the other
    analytics are computed over the FULL partition first, as in the
    oracle's CTE.

    The GLOBAL quartile deliberately avoids ``ntile(4).over(
    Window.orderBy(...))`` — an unpartitioned window serializes the
    whole table through ONE task (the exact hazard the plan audit
    bans).  Instead the scale path: sharded-prefix-sum global rank
    (operators/packing.py::global_rank — O(shards) driver rows, window
    keyed by shard) + exact ntile arithmetic from (rank, n), which the
    DuckDB ``ntile`` oracle hash-verifies row for row."""
    from cosmap_spark.operators.packing import global_rank, ntile_from_rank

    o = load_table(spark, sf_dir, "orders")
    ranked, n = global_rank(
        o, ["o_totalprice", "o_orderkey"], out_col="__grn"
    )
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_rk = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w_pct = Window.partitionBy("o_orderstatus").orderBy(
        F.round("o_totalprice", 2), "o_orderkey"
    )
    return (
        ranked.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).alias("rnk"),
            ntile_from_rank(F.col("__grn"), n, 4).alias("quartile"),
            F.round(F.percent_rank().over(w_pct), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w_pct), 6).alias("cume"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "q_window_frames",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           first_value(l_extendedprice) OVER w_full AS first_price,
           last_value(l_extendedprice) OVER w_full AS last_price
    FROM lineitem
    WINDOW w_full AS (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_extendedprice
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames: cumulative running sum plus first/last_value
    over the full partition (the default frame would make last_value ≡
    current row).  (l_orderkey, l_linenumber) is not unique in the
    corpus, so the frame order adds l_extendedprice as tiebreak —
    remaining ties are identical rows, for which any order yields the
    same output multiset."""
    base = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    w_run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w_run), 2).alias("running_total"),
        F.first("l_extendedprice").over(w_full).alias("first_price"),
        F.last("l_extendedprice").over(w_full).alias("last_price"),
    )


@query(
    "q_window_lag_range",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w_seq AS prev_value,
           lead(value) OVER w_seq AS next_value,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 4) AS rolling_10m,
           round((value - avg(value) OVER w_all)
                 / stddev_samp(value) OVER w_all, 6) AS zscore
    FROM events
    WINDOW w_seq AS (PARTITION BY user_id ORDER BY ts, event_id),
           w_all AS (PARTITION BY user_id)
    """,
)
def q_window_lag_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset + value-range window family along each user's event
    timeline: lag/lead, a rolling 10-minute RANGE-frame sum (range
    frames are tie-safe — the frame is a value interval, not a row
    interval), and a per-user z-score (the window-analytic anomaly
    detector: |z| > k flags outliers without a second pass over the
    data).  Single-event users get a NULL z-score in both engines
    (stddev_samp of one row is NULL)."""
    ev = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rng = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, Window.currentRow)
    )
    w_all = Window.partitionBy("user_id")
    return ev.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w_seq).alias("prev_value"),
        F.lead("value").over(w_seq).alias("next_value"),
        F.round(F.sum("value").over(w_rng), 4).alias("rolling_10m"),
        F.round(
            (F.col("value") - F.avg("value").over(w_all))
            / F.stddev_samp("value").over(w_all), 6,
        ).alias("zscore"),
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
