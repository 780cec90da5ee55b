"""Bucketed tables: pre-shuffled storage for co-located joins.

The reference has no storage-layout control at all (its one writer is an
append CSV, reference src/cosmap/output/writer.py:23-35); at 100 TB the
single biggest shuffle in a pipeline is usually the fact⋈fact equi-join,
and bucketing is Spark's mechanism for paying that shuffle ONCE at write
time instead of on every query: two tables bucketed by the same key into
the same bucket count join with zero Exchange on either side (SortMerge
over pre-bucketed files).

``write_bucketed`` uses ``saveAsTable`` (bucket metadata lives in the
session catalog — path-based ``parquet(path)`` writes cannot record
bucket specs), so callers address the result by table name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    Sizing rule at scale: pick ``n_buckets`` so one bucket of the LARGER
    table fits an executor's memory (e.g. 100 TB / 8192 buckets ≈ 12 GB);
    both join sides must use the same ``bucket_cols`` and ``n_buckets``
    or Spark re-shuffles the mismatched side.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    *,
    how: str = "inner",
) -> DataFrame:
    """Join two same-spec bucketed tables.

    With ``bucket_cols == on`` on both sides, the physical plan contains
    NO Exchange (verified in tests by plan inspection): each task reads
    bucket i of both tables and sort-merges locally.  AQE cannot help
    here — bucketing is a storage-time decision."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
