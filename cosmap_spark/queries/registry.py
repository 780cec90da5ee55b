"""Registry binding each declared query (SURVEY.md §2.3) to its oracle.

Each query is registered twice: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) the DuckDB oracle SQL the driver
runs side-by-side.  Conventions that keep the differential check exact:

* every computed/aggregate column is aliased identically in both;
* float columns produced by libm-dependent math (trig, exp) or by
  order-dependent aggregation are ``round``-ed in BOTH engines — per-row
  math to 6 dp, multi-row aggregates to 2-4 dp — so last-ulp differences
  between JVM and C libm / summation orders can't flip the value hash;
* timestamps are surfaced as epoch seconds (bigint) or formatted strings,
  never raw timestamp values (Spark is µs, the files are ns).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` ⇒ rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver owns the SparkSession; normalize runtime conf
            # (UTC, AQE, arrow, sane shuffle partitions) on every call.
            from cosmap_spark.session import ensure_conf

            ensure_conf(spark)
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return wrapped

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    # Import order IS registration order (dict insertion).  The driver's
    # correctness gate checks queries in registration order under a bounded
    # budget (50 queries in round 1), so the ledger is consolidated to
    # EXACTLY 50 queries (round 2) — every registered query gets a driver
    # correctness row; there is no unchecked tail.
    from cosmap_spark.queries import (  # noqa: F401
        spatial,
        windows,
        setops,
        streaming_q,
        udfs,
        tpch,
        relational_extra,
        joins,
        aggregates,
        functions_q,
        llm_ops,
        timeseries,
    )

    _LOADED = True
