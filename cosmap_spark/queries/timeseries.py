"""Time-series resampling queries (round-2 extension; SURVEY.md §2.3).

The reference has no time axis at all; a training-data / telemetry
pipeline at 100 TB needs regular-grid resampling (the input to feature
windows and downsampled dashboards).  Everything here is DataFrame ops:
``sequence``+``explode`` for the grid (rows generated executor-side,
proportional to each user's span — never a driver loop), one groupBy for
the per-bucket aggregate, and window functions for the fills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table

_STEP = 21_600  # 6-hour buckets over the 30-day corpus

# Interpolated values are computed in exact integer MICRO-UNITS with an
# explicit half-up integer formula, floor((2*num + den) / (2*den)), and
# only converted to double at the end (integer / 10^6).  A naive
# ``round(prev + (next-prev)*frac, 6)`` hits decimal-midpoint knife-edges
# (frac = 1/2 of two 6-dp values ends exactly in ...5), where Spark's
# BigDecimal half-up and DuckDB's FP rounding disagree; integer
# arithmetic is bit-identical in both engines by construction.
_RESAMPLE_ORACLE = f"""
    WITH agg AS (
      SELECT user_id, CAST(floor(epoch(ts) / {_STEP}) * {_STEP} AS BIGINT) AS bucket,
             -- mean quantized at 4 dp (the repo's aggregate-rounding
             -- band: a 6-dp quantization of an ORDER-DEPENDENT avg
             -- leaves a last-ulp knife edge where the two engines'
             -- summation orders disagree), then scaled to micro-units
             -- for the exact integer interpolation
             CAST(round(avg(value) * 10000) AS BIGINT) * 100 AS vi
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id,
             CAST(floor(epoch(min(ts)) / {_STEP}) * {_STEP} AS BIGINT) AS b0,
             CAST(floor(epoch(max(ts)) / {_STEP}) * {_STEP} AS BIGINT) AS b1
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT user_id, CAST(unnest(range(b0, b1 + {_STEP}, {_STEP})) AS BIGINT) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.bucket, a.vi,
             last_value(a.vi IGNORE NULLS) OVER w_prev AS prev_vi,
             first_value(a.vi IGNORE NULLS) OVER w_next AS next_vi,
             last_value(CASE WHEN a.vi IS NOT NULL THEN g.bucket END IGNORE NULLS)
               OVER w_prev AS prev_b,
             first_value(CASE WHEN a.vi IS NOT NULL THEN g.bucket END IGNORE NULLS)
               OVER w_next AS next_b
      FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.bucket = g.bucket
      WINDOW w_prev AS (PARTITION BY g.user_id ORDER BY g.bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY g.user_id ORDER BY g.bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    k AS (
      SELECT user_id, bucket, vi, prev_vi, next_vi,
             CAST((bucket - prev_b) / {_STEP} AS BIGINT) AS s1,
             CAST((next_b - bucket) / {_STEP} AS BIGINT) AS s2
      FROM j
    )
    SELECT user_id, bucket,
           vi IS NULL AS is_gap,
           CAST(prev_vi AS DOUBLE) / 1000000.0 AS v_locf,
           CAST(CASE WHEN vi IS NOT NULL THEN vi
                     WHEN next_vi IS NULL THEN prev_vi
                     ELSE CAST(floor((2 * (prev_vi * s2 + next_vi * s1) + (s1 + s2))
                                     / (2.0 * (s1 + s2))) AS BIGINT)
                END AS DOUBLE) / 1000000.0 AS v_interp
    FROM k
"""


@query("q_resample", oracle=_RESAMPLE_ORACLE)
def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling per user: 6-hour buckets spanning each
    user's [min, max] event time, per-bucket mean value, empty buckets
    gap-filled two ways — last-observation-carried-forward (``v_locf``)
    and linear interpolation between the neighboring observed buckets
    (``v_interp``; trailing gaps fall back to LOCF).

    Scale shape: the grid is ``sequence``+``explode`` per user (work
    proportional to output rows, generated executor-side), the bucket
    aggregate is one shuffle, and both fills are window functions over
    the SAME (user, bucket) ordering — one sort serves all four fill
    inputs.  Interpolation runs in integer micro-units (see the oracle
    comment) so the result is bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    bucket = ((F.unix_timestamp("ts") / _STEP).cast("long") * _STEP).alias("bucket")
    agg = ev.groupBy("user_id", bucket).agg(
        # 4-dp quantization then micro-unit scaling (see oracle comment)
        (F.round(F.avg("value") * 10_000).cast("long") * 100).alias("vi")
    )
    bounds = ev.groupBy("user_id").agg(
        ((F.unix_timestamp(F.min("ts")) / _STEP).cast("long") * _STEP).alias("b0"),
        ((F.unix_timestamp(F.max("ts")) / _STEP).cast("long") * _STEP).alias("b1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("b0", "b1", F.lit(_STEP))).alias("bucket"),
    )
    j = grid.join(agg, ["user_id", "bucket"], "left")
    w_prev = (
        Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("vi").isNotNull(), F.col("bucket"))
    prev_vi = F.last("vi", ignorenulls=True).over(w_prev)
    next_vi = F.first("vi", ignorenulls=True).over(w_next)
    prev_b = F.last(obs_bucket, ignorenulls=True).over(w_prev)
    next_b = F.first(obs_bucket, ignorenulls=True).over(w_next)
    s1 = ((F.col("bucket") - prev_b) / _STEP).cast("long")
    s2 = ((next_b - F.col("bucket")) / _STEP).cast("long")
    num = prev_vi * s2 + next_vi * s1
    den = s1 + s2
    interp_micro = (
        F.when(F.col("vi").isNotNull(), F.col("vi"))
        .when(next_vi.isNull(), prev_vi)
        .otherwise(F.floor((2 * num + den) / (2.0 * den)).cast("long"))
    )
    return j.select(
        "user_id",
        "bucket",
        F.col("vi").isNull().alias("is_gap"),
        (prev_vi.cast("double") / 1_000_000.0).alias("v_locf"),
        (interp_micro.cast("double") / 1_000_000.0).alias("v_interp"),
    )
