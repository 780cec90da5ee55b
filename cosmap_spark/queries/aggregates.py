"""Aggregation queries (SURVEY.md §2.2 "Aggregations").

The reference's only aggregation is the per-sample count+sum (O27,
covered by q_sample_agg).  Spark gives partial/final aggregation (map-side
combine) automatically — every ``groupBy().agg()`` below ships partial
states, not rows, through the shuffle.

Consolidated (round 2): one suite per aggregation *family* — plain/
distinct/bitwise/arg-max/conditional (FILTER-clause) in ``q_agg_suite``,
the grouping-set lattice in ``q_grouping_multi``, order-statistics +
moments in ``q_stats_suite``, sketches in ``q_approx_sketches`` — so the
whole surface fits the driver's bounded correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


_BUCKET_SQL = """CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END"""


@query(
    "q_agg_suite",
    oracle=f"""
    WITH base AS (
      SELECT o_orderstatus,
             {_BUCKET_SQL} AS bucket,
             count(DISTINCT o_custkey) AS n_cust,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total,
             bit_and(o_orderkey) AS k_and,
             bit_or(o_orderkey)  AS k_or,
             bit_xor(o_orderkey) AS k_xor,
             max(round(o_totalprice, 2)) AS top_price,
             count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
             round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN o_totalprice ELSE 0.0 END), 2) AS urgent_total,
             round(avg(CASE WHEN o_orderpriority = '5-LOW'
                            THEN o_totalprice END), 2) AS low_avg
      FROM orders GROUP BY 1, 2
    ),
    top AS (
      SELECT o_orderstatus, bucket, o_orderkey AS top_order FROM (
        SELECT o_orderstatus, {_BUCKET_SQL} AS bucket, o_orderkey,
               row_number() OVER (PARTITION BY o_orderstatus, {_BUCKET_SQL}
                 ORDER BY round(o_totalprice, 2) DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
    )
    SELECT b.o_orderstatus, b.bucket, b.n_cust, b.n_orders, b.total,
           b.k_and, b.k_or, b.k_xor, t.top_order, b.top_price,
           b.n_urgent, b.urgent_total, b.low_avg
    FROM base b JOIN top t USING (o_orderstatus, bucket)
    """,
)
def q_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plain-aggregation family in one grouped pass over orders,
    keyed by (status, CASE price bucket) — a derived-expression group
    key, evaluated once pre-shuffle:

    * distinct aggregate alongside plain aggregates (two-phase expand);
    * bitwise aggregates — fully associative/commutative, so the
      partial/final split is exact (no ordering sensitivity at all);
    * grouped arg-max via ``max_by`` on a (value, id) struct — the
      aggregation form of per-group top-1: partial/final combine moves
      ONE row per group per partition through the shuffle, vs a window
      sort of every row.  The struct tie-break makes ties deterministic
      (bare max_by is not);
    * conditional aggregation (FILTER-clause semantics): ``count_if`` +
      CASE-guarded sum/avg — NULLs fall out of avg exactly as FILTER
      excludes rows.  One pass, one shuffle for all thirteen columns."""
    o = load_table(spark, sf_dir, "orders")
    key = F.struct(F.round("o_totalprice", 2).alias("p"), F.col("o_orderkey").alias("k"))
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return o.groupBy("o_orderstatus", bucket.alias("bucket")).agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.bit_and("o_orderkey").alias("k_and"),
        F.bit_or("o_orderkey").alias("k_or"),
        F.bit_xor("o_orderkey").alias("k_xor"),
        F.max_by("o_orderkey", key).alias("top_order"),
        F.max(F.round("o_totalprice", 2)).alias("top_price"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.round(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
                .otherwise(0.0)
            ), 2,
        ).alias("urgent_total"),
        F.round(
            F.avg(F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice"))),
            2,
        ).alias("low_avg"),
    )


_GROUPING_ORACLE = """
    SELECT 'rollup' AS mode, r.r_name AS d1, n.n_name AS d2,
           count(*) AS n, round(sum(c.c_acctbal), 2) AS total
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    UNION ALL
    SELECT 'cube', o_orderstatus, o_orderpriority,
           count(*), round(sum(o_totalprice), 2)
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'sets', o_orderstatus, o_orderpriority,
           count(*), round(sum(o_totalprice), 2)
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    UNION ALL
    SELECT 'string_agg', CAST(n_regionkey AS VARCHAR),
           string_agg(n_name, ',' ORDER BY n_name), count(*), NULL
    FROM nation GROUP BY n_regionkey
"""


@query("q_grouping_multi", oracle=_GROUPING_ORACLE)
def q_grouping_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouping-set lattice as one tagged union:

    * ``rollup`` — subtotals + grand total over the region→nation
      hierarchy (the dimension joins broadcast);
    * ``cube`` — all 4 grouping sets over two independent dimensions;
    * ``sets`` — explicit GROUPING SETS (the general form behind both);
    * ``string_agg`` — ordered string aggregation: collect_list is
      order-nondeterministic under partitioning, so the deterministic
      form is array_sort THEN concat — the required pattern for
      reproducible string aggs on any cluster (same reason the sampler
      avoids rand())."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))

    def shape(df: DataFrame, mode: str, d1, d2, n_col, total) -> DataFrame:
        return df.select(
            F.lit(mode).alias("mode"),
            d1.cast("string").alias("d1"),
            d2.cast("string").alias("d2"),
            n_col.cast("long").alias("n"),
            total.cast("double").alias("total"),
        )

    rollup = shape(
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total")),
        "rollup", F.col("r_name"), F.col("n_name"), F.col("n"), F.col("total"),
    )
    o = load_table(spark, sf_dir, "orders")
    cube = shape(
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")),
        "cube", F.col("o_orderstatus"), F.col("o_orderpriority"),
        F.col("n"), F.col("total"),
    )
    o.createOrReplaceTempView("__gm_orders")
    sets = shape(
        spark.sql(
            """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM __gm_orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            """
        ),
        "sets", F.col("o_orderstatus"), F.col("o_orderpriority"),
        F.col("n"), F.col("total"),
    )
    nat = load_table(spark, sf_dir, "nation")
    string_agg = shape(
        nat.groupBy("n_regionkey").agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"),
            F.count("*").alias("n"),
        ),
        "string_agg", F.col("n_regionkey"), F.col("names"),
        F.col("n"), F.lit(None),
    )
    return rollup.unionByName(cube).unionByName(sets).unionByName(string_agg)


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
    "q_stats_suite",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(min(l_quantity), 6) AS min_qty,
           round(max(l_quantity), 6) AS max_qty,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 2) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS trend_slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS trend_icept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS trend_r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_fit
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics + second moments + OLS trend per group: exact
    interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: both linear-interpolation on the sorted
    multiset), sample stddev/variance, correlation/covariance between
    quantity and price, and the per-group least-squares fit of price
    against quantity via operators/tseries.py::grouped_trend (the
    ``regr_*`` closed-form co-moment aggregates; the moment columns
    ride grouped_trend's ``extra`` hook so the whole suite stays ONE
    scan + ONE shuffle).  All moments use one-pass co-moment
    accumulation in both engines; outputs are rounded below the
    accumulation-order noise floor.  The sketch-based scale path is
    q_approx_sketches."""
    from cosmap_spark.operators.tseries import grouped_trend

    li = load_table(spark, sf_dir, "lineitem")
    out = grouped_trend(
        li,
        ["l_returnflag"],
        x="l_quantity",
        y="l_extendedprice",
        extra={
            "median_qty": F.round(F.expr("percentile(l_quantity, 0.5)"), 6),
            "p90_qty": F.round(F.expr("percentile(l_quantity, 0.9)"), 6),
            "min_qty": F.round(F.min("l_quantity"), 6),
            "max_qty": F.round(F.max("l_quantity"), 6),
            "sd_qty": F.round(F.stddev_samp("l_quantity"), 4),
            "var_qty": F.round(F.var_samp("l_quantity"), 2),
            "corr_qty_price": F.round(
                F.corr("l_quantity", "l_extendedprice"), 6
            ),
            "covar_qty_price": F.round(
                F.covar_samp("l_quantity", "l_extendedprice"), 2
            ),
        },
    )
    return out.select(
        "l_returnflag",
        "median_qty", "p90_qty", "min_qty", "max_qty",
        "sd_qty", "var_qty", "corr_qty_price", "covar_qty_price",
        F.round("slope", 4).alias("trend_slope"),
        F.round("intercept", 2).alias("trend_icept"),
        F.round("r2", 6).alias("trend_r2"),
        F.col("n_fit"),
    )


@query("q_approx_sketches")  # rows-only: sketch estimates are engine-specific
def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch family — the 100 TB path where exact computation would
    shuffle every key or fully sort every group:

    * KLL-style ``approx_percentile`` per lineitem return flag (scalar
      columns, projected out of the quantile array);
    * HyperLogLog++ ``approx_count_distinct`` per order status;
    * Misra-Gries heavy hitters (operators/sketch.py::
      heavy_hitters_sketch) over a deliberately SKEWED derived key —
      ``-1`` for every first-line item (~¼ of rows: the heavy hitter),
      ``l_suppkey`` otherwise (a ~100-key uniform tail, far above
      ``k=8``, so the per-partition decrement path genuinely runs) —
      bounded summaries + broadcast exact-verify; counts are EXACT for
      every key above the N/(k+1) guarantee, so this branch is
      deterministic.  It lives here because the sketch FAMILY is the
      query's subject;
    * HLL sketch-column rollup (operators/sketch.py::distinct_rollup)
      — distinct orderkeys at (returnflag, linestatus), (returnflag)
      and grand-total levels from ONE scan, coarser levels merged from
      persisted leaf sketches by ``hll_union_agg`` (never a re-scan);
      rolled-up estimates carry the same accuracy bound as direct
      sketching — NOT bit-equality; merge order can flip coupon/dense
      representations (pinned as a tolerance in tests/test_sketch.py);
    * quantile rollup (operators/sketch.py::quantile_rollup) — the
      quantile member of the same cube family: leaf equi-rank grids
      merged as weighted ECDF atoms per coarser level, rank error
      bounded in tests/test_sketch.py;
    * KMV rollup (operators/sketch.py::kmv_rollup) — the
      k-minimum-values twin of the HLL cube: bounded per-partition
      partials, JVM-side merge, and — unlike HLL — merge-order
      BIT-STABLE estimates (asserted equal, not within tolerance, in
      tests/test_sketch.py);
    * KMV segment overlap (operators/sketch.py::segment_overlap) —
      the set-algebra payoff HLL lacks: pairwise Jaccard +
      intersection-NDV estimates between return-flag segments over
      the orderkey universe, one corpus scan + a sketch self-join.

    All are mergeable-summary algorithms: partial states combine
    associatively, so the map-side combine IS the algorithm.  Checked
    rows-only (the first two estimates are engine-specific); unit
    tests bound the relative error vs the exact values
    (tests/test_sketch.py pins MG equal to exact above threshold)."""
    from cosmap_spark.operators.sketch import (
        distinct_rollup,
        heavy_hitters_sketch,
        kmv_rollup,
        quantile_rollup,
        segment_overlap,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, array(0.5, 0.9), 1000)").alias("__q")
    ).select(
        F.lit("approx_percentile").alias("sketch"),
        F.col("l_returnflag").alias("grp"),
        F.col("__q")[0].cast("double").alias("p50_or_ndv"),
        F.col("__q")[1].cast("double").alias("p90"),
    )
    o = load_table(spark, sf_dir, "orders")
    ndv = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("n_cust_approx")
    ).select(
        F.lit("approx_count_distinct").alias("sketch"),
        F.col("o_orderstatus").alias("grp"),
        F.col("n_cust_approx").cast("double").alias("p50_or_ndv"),
        F.lit(None).cast("double").alias("p90"),
    )
    skewed_key = F.when(
        F.col("l_linenumber") == 1, F.lit(-1).cast("long")
    ).otherwise(F.col("l_suppkey"))
    mg = heavy_hitters_sketch(
        li.select(skewed_key.alias("hh_key")), "hh_key", k=8
    ).select(
        F.lit("mg_heavy_hitters").alias("sketch"),
        F.col("hh_key").cast("string").alias("grp"),
        F.col("n").cast("double").alias("p50_or_ndv"),
        F.lit(None).cast("double").alias("p90"),
    )
    hll = distinct_rollup(
        li, ["l_returnflag", "l_linestatus"], "l_orderkey", lg_k=12
    ).select(
        F.lit("hll_rollup").alias("sketch"),
        F.concat_ws(
            "/",
            F.col("level"),
            F.coalesce(F.col("l_returnflag"), F.lit("*")),
            F.coalesce(F.col("l_linestatus"), F.lit("*")),
        ).alias("grp"),
        F.col("ndv").cast("double").alias("p50_or_ndv"),
        F.lit(None).cast("double").alias("p90"),
    )
    qr = quantile_rollup(
        li, ["l_returnflag", "l_linestatus"], "l_quantity",
        probs=(0.5, 0.9), grid=128,
    ).select(
        F.lit("quantile_rollup").alias("sketch"),
        F.concat_ws(
            "/",
            F.col("level"),
            F.coalesce(F.col("l_returnflag"), F.lit("*")),
            F.coalesce(F.col("l_linestatus"), F.lit("*")),
        ).alias("grp"),
        F.col("p5").cast("double").alias("p50_or_ndv"),
        F.col("p9").cast("double").alias("p90"),
    )
    kmv = kmv_rollup(
        li, ["l_returnflag", "l_linestatus"], "l_orderkey", k=256
    ).select(
        F.lit("kmv_rollup").alias("sketch"),
        F.concat_ws(
            "/",
            F.col("level"),
            F.coalesce(F.col("l_returnflag"), F.lit("*")),
            F.coalesce(F.col("l_linestatus"), F.lit("*")),
        ).alias("grp"),
        F.col("ndv").cast("double").alias("p50_or_ndv"),
        F.lit(None).cast("double").alias("p90"),
    )
    ov = segment_overlap(li, "l_returnflag", "l_orderkey", k=256).select(
        F.lit("kmv_overlap").alias("sketch"),
        F.concat_ws("<", "seg_a", "seg_b").alias("grp"),
        F.col("ndv_inter").cast("double").alias("p50_or_ndv"),
        F.col("jaccard").cast("double").alias("p90"),
    )
    return (
        pct.unionByName(ndv).unionByName(mg)
        .unionByName(hll).unionByName(qr)
        .unionByName(kmv).unionByName(ov)
    )
