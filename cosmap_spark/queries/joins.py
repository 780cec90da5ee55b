"""Join queries (SURVEY.md §2.2 "Joins").

The reference implements exactly one join — the cone search (a broadcast
theta-join, covered in spatial.py).  Everything here is the general join
zoo our engine inherits from Spark, each with a scale-aware physical
strategy: broadcast hints for dimension tables, bucket-style equi-joins
for the range join, and a union+window forward-fill (single shuffle, no
theta-join) for the as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


_VARIANTS_ORACLE = """
    SELECT 'inner' AS op, o.o_orderkey AS a, c.c_custkey AS b, o.o_totalprice AS x
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT 'broadcast', l.l_orderkey, p.p_partkey, CAST(l.l_linenumber AS DOUBLE)
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_size < 10
    UNION ALL
    SELECT 'left', c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    UNION ALL
    SELECT 'semi', c_custkey, NULL, NULL FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    UNION ALL
    SELECT 'anti', c_custkey, NULL, NULL FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'full', c.c_custkey, s.s_suppkey,
           CAST(coalesce(c.c_nationkey, s.s_nationkey) AS DOUBLE)
    FROM (SELECT * FROM customer WHERE c_custkey < 200) c
    FULL OUTER JOIN (SELECT * FROM supplier WHERE s_suppkey >= 50) s
      ON c.c_custkey = s.s_suppkey
"""


@query("q_join_variants", oracle=_VARIANTS_ORACLE)
def q_join_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi-join zoo as one tagged union — every branch an
    independent plan, value-verified through the shared (op, a, b, x)
    schema:

    * ``inner``     — Catalyst picks broadcast-hash (customer stays
      \u226a orders after the segment filter; the same plan holds at
      100 TB);
    * ``broadcast`` — explicit ``broadcast()`` hint: fact \u22c8 small dim
      with zero shuffle of the fact side;
    * ``left``      — left outer with a join-side predicate (nulls
      preserved);
    * ``semi``      — EXISTS: customers with at least one big order;
    * ``anti``      — NOT EXISTS: customers with no orders at all;
    * ``full``      — full outer with null-filling coalesce on both
      unmatched sides."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def tag(df: DataFrame, op: str, a, b, x) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            a.cast("long").alias("a"),
            (b if b is not None else F.lit(None)).cast("long").alias("b"),
            (x if x is not None else F.lit(None)).cast("double").alias("x"),
        )

    c_bld = c.where(F.col("c_mktsegment") == "BUILDING")
    inner = tag(
        o.join(c_bld, o["o_custkey"] == c_bld["c_custkey"]),
        "inner", F.col("o_orderkey"), F.col("c_custkey"), F.col("o_totalprice"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") < 10)
    bcast = tag(
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]),
        "broadcast", F.col("l_orderkey"), F.col("p_partkey"), F.col("l_linenumber"),
    )
    left = tag(
        c.join(o, (o["o_custkey"] == c["c_custkey"]) & (o["o_orderstatus"] == "F"), "left"),
        "left", F.col("c_custkey"), F.col("o_orderkey"), F.col("o_totalprice"),
    )
    o_big = o.where(F.col("o_totalprice") > 300000.0)
    semi = tag(
        c.join(o_big, c["c_custkey"] == o_big["o_custkey"], "left_semi"),
        "semi", F.col("c_custkey"), None, None,
    )
    anti = tag(
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti"),
        "anti", F.col("c_custkey"), None, None,
    )
    c_small = c.where(F.col("c_custkey") < 200)
    s_big = load_table(spark, sf_dir, "supplier").where(F.col("s_suppkey") >= 50)
    full = tag(
        c_small.join(s_big, c_small["c_custkey"] == s_big["s_suppkey"], "full_outer"),
        "full", F.col("c_custkey"), F.col("s_suppkey"),
        F.coalesce("c_nationkey", "s_nationkey"),
    )
    out = inner
    for branch in (bcast, left, semi, anti, full):
        out = out.unionByName(branch)
    return out


@query(
    "q_join_range",
    oracle="""
    SELECT e1.event_id, count(*) AS n_next_day
    FROM events e1 JOIN events e2
      ON e2.user_id = e1.user_id
     AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 DAY
    WHERE e1.event_type = 'purchase'
    GROUP BY e1.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join — the relational twin of the cone search
    (SURVEY.md §2.2): per purchase, count same-user events in the
    following 24 h.  Scale path: bucketize time to 1-day grid and join on
    ``(user_id, bucket ∈ {b, b+1})`` — an EQUI-join a hash join can
    execute — with the exact range predicate as residual.  Identical to
    the zone trick in the cone search; no O(n²) theta-join at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    day = 86_400
    e1 = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id"), F.col("user_id").alias("u1"),
            F.col("ts").alias("ts1"),
            # F.floor (toward -inf), matching e2's bucketing exactly:
            # cast("long") truncates toward zero, which diverges from
            # floor for pre-1970 epochs — the candidate buckets would
            # miss the probe side's and silently drop pairs
            F.explode(
                F.array(
                    F.floor(F.unix_timestamp("ts") / day),
                    F.floor(F.unix_timestamp("ts") / day) + 1,
                )
            ).alias("bucket"),
        )
    )
    e2 = ev.select(
        F.col("user_id").alias("u2"), F.col("ts").alias("ts2"),
        F.floor(F.unix_timestamp("ts") / day).alias("bucket"),
    )
    joined = e1.join(
        e2,
        (e1["u1"] == e2["u2"]) & (e1["bucket"] == e2["bucket"])
        & (e2["ts2"] > e1["ts1"])
        & (e2["ts2"] <= e1["ts1"] + F.expr("INTERVAL 1 DAY")),
    )
    return joined.groupBy("event_id").agg(F.count("*").alias("n_next_day"))


@query(
    "q_join_asof",
    oracle="""
    WITH j AS (
      SELECT p.event_id, c.event_id AS last_click_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events p JOIN events c
        ON c.user_id = p.user_id AND c.ts < p.ts AND c.event_type = 'click'
      WHERE p.event_type = 'purchase'
    )
    SELECT event_id, last_click_id FROM j WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent strictly-earlier
    click by the same user.

    Scale-first plan (now the reusable operator
    ``operators/asof.py::asof_join`` — the pandas ``merge_asof``
    analog, differential-tested against it in tests/test_asof.py):
    instead of a theta-join + per-key top-1 (quadratic in
    events-per-user), tag and UNION both streams, sort once per user,
    and forward-fill the right payload with ``last(..., ignorenulls)``
    — one shuffle on user_id, linear work, no join node.  Strict
    ``<`` semantics: a same-instant click is not visible to the
    purchase, matching the oracle's ``c.ts < p.ts``.
    """
    from cosmap_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return (
        asof_join(
            purchases, clicks, on="ts", by=["user_id"],
            direction="backward", allow_exact=False,
        )
        .where(F.col("asof_click_id").isNotNull())
        .select(
            F.col("purchase_id").alias("event_id"),
            F.col("asof_click_id").alias("last_click_id"),
        )
    )


@query(
    "q_join_overlap",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 7 + 1) * 3600 AS e
      FROM events
    )
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_s
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def q_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join (two interval sets, not point-in-range):
    derive per-event intervals of 1-7 h, find same-user overlapping
    pairs — now bound to the reusable
    ``operators/intervals.py::interval_overlap_join``, which
    generalizes the day-grid trick: each interval explodes to EVERY
    grid cell it spans (``sequence``), candidates come from an
    equi-join on (user, cell), cross-cell duplicates fold on the pair
    key, and the exact overlap predicate runs as residual.  Work
    scales with cells-per-interval × events-per-cell, never |A|×|B|
    (brute-force parity is unit-tested in tests/test_intervals.py)."""
    from cosmap_spark.operators.intervals import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("event_id").alias("id"),
        F.unix_timestamp("ts").alias("start"),
        (F.unix_timestamp("ts") + (F.col("event_id") % 7 + 1) * 3600).alias("end"),
    )
    return interval_overlap_join(iv, by=["user_id"], grid=86_400).select(
        "user_id", "id_a", "id_b", F.col("overlap").alias("overlap_s")
    )
