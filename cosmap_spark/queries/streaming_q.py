"""Streaming-semantics queries, batch-mode twins (SURVEY.md §2.2
"Streaming").

The reference is batch-only with incremental collection (O22).  Our
engine's real streaming surface lives in cosmap_spark/streaming/ and is
exercised by tests/test_streaming.py with actual readStream sources; the
oracle can't run streams, so the ledger declares the batch-equivalent
aggregations (identical window semantics — Spark's window()/
session_window() functions behave the same in batch and streaming).

All window starts surface as epoch seconds (bigint): Spark's windows are
epoch-aligned, so ``unix_timestamp(window.start) ==
floor(epoch(ts)/slide)*slide`` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


_STREAM_WINDOWS_ORACLE = """
    WITH slide AS (
      SELECT CAST(floor(epoch(ts) / 600) * 600 - off AS BIGINT) AS window_start,
             count(*) AS n, round(sum(value), 4) AS total
      FROM events CROSS JOIN (SELECT unnest([0, 600, 1200]) AS off) offs
      GROUP BY 1
    )
    SELECT 'tumble' AS op,
           CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
           event_type AS key, count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'slide', window_start, NULL, n, total FROM slide
    UNION ALL
    SELECT 'late', NULL, event_type, count(*), NULL
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 5 DAY FROM events)
    GROUP BY 3
"""


@query("q_stream_windows", oracle=_STREAM_WINDOWS_ORACLE)
def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window aggregation semantics as one tagged union (each
    branch the batch twin of a Structured Streaming query; the real
    readStream paths run in tests/test_streaming.py):

    * ``tumble`` — 10-minute tumbling windows per event type
      (``groupBy(window(ts, '10 minutes'), type)``);
    * ``slide``  — 30-minute windows sliding every 10 minutes: each
      event lands in 3 windows; the oracle reproduces Spark's
      epoch-aligned starts with an explicit offset unnest;
    * ``late``   — watermark semantics: drop rows older than
      (max event time − 5 days) — what ``withWatermark('ts', '5 days')``
      retains at end-of-stream; the 1-row cutoff broadcasts (the
      correct scalar-subquery shape, not a real cross join)."""
    ev = load_table(spark, sf_dir, "events")

    def shape(df: DataFrame, op: str, start, key, n_col, total) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            (start if start is not None else F.lit(None)).cast("long").alias("window_start"),
            (key if key is not None else F.lit(None)).cast("string").alias("key"),
            n_col.cast("long").alias("n"),
            (total if total is not None else F.lit(None)).cast("double").alias("total"),
        )

    tumble = shape(
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")),
        "tumble", F.unix_timestamp(F.col("w.start")), F.col("event_type"),
        F.col("n"), F.col("total"),
    )
    slide = shape(
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")),
        "slide", F.unix_timestamp(F.col("w.start")), None, F.col("n"), F.col("total"),
    )
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 5 DAY")).alias("cut"))
    late = shape(
        ev.crossJoin(F.broadcast(cutoff))
        .where(F.col("ts") >= F.col("cut"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n")),
        "late", None, F.col("event_type"), F.col("n"), None,
    )
    return tumble.unionByName(slide).unionByName(late)


@query(
    "q_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user
    (streaming twin: ``session_window`` + watermark).  A gap of exactly
    30 min closes the session in Spark (window end = last_ts + gap,
    half-open), hence the ``>=`` in the oracle's sessionization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
        )
    )


