"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in the ``cosmap_spark`` package; this module is a
thin adapter over its query registry (cosmap_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cosmap_spark.queries import all_oracles, all_queries
from cosmap_spark.session import ensure_conf


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the cosmap-shaped
    end-to-end — uniform sphere sampling is replaced by the deterministic
    samples fixture; cone-search join; per-sample filter+count+sum
    (reference README.md:55-174 as ONE lazy plan)."""
    ensure_conf(spark)
    from cosmap_spark.queries.spatial import q_sample_agg

    return q_sample_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted ⇒ rows-only check)."""
    return all_oracles()
