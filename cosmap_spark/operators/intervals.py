"""Interval coalescing: merge overlapping/adjacent intervals per key.

The compaction primitive behind sessionization, downtime reports, byte-
range dedup, and time-range indexes.  Intervals sort within their key
partition, a running maximum of ``end`` detects gaps, and the gap
flags' prefix sum numbers the merged groups — the classic
gaps-and-islands plan.  Both window passes share ONE (key, start)
Sort + Exchange; the final groupBy of merged runs adds a second, much
smaller exchange (merged-group cardinality, not input rows).  No
self-join, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(
    df: DataFrame,
    *,
    key_cols: list[str],
    start_col: str = "start",
    end_col: str = "end",
    min_gap: int = 0,
) -> DataFrame:
    """One row per maximal run of overlapping intervals:
    ``key_cols…, start, end, n_merged``.

    Intervals are half-open ``[start, end)``; two intervals merge when
    the next ``start`` is within ``min_gap`` of the running maximum
    ``end`` (``min_gap=0`` merges touching intervals; a positive gap
    bridges small holes, the session-gap analog).  Work per key is the
    sort; state per row is one running max — no buffering of whole
    groups, so a key with 10⁹ intervals streams through the window
    operator.
    """
    w_sort = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w_sort.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_run = F.when(
        prev_max_end.isNull()
        | (F.col(start_col) > prev_max_end + F.lit(min_gap)),
        1,
    ).otherwise(0)
    runs = df.withColumn(
        "__run",
        F.sum(new_run).over(
            w_sort.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy(*key_cols, "__run")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count("*").alias("n_merged"),
        )
        .drop("__run")
    )
