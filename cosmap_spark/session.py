"""SparkSession factory.

Defaults are chosen for the engine's workload shape: mostly-broadcastable
dimension joins, AQE for runtime re-planning (skew join splitting +
partition coalescing), Arrow for any pandas-UDF path, and UTC session time
so timestamp semantics match the DuckDB oracle.

``spark.sql.legacy.parquet.nanosAsLong`` is required: the driver's
``events`` table stores TIMESTAMP(NANOS) which Spark 4 otherwise refuses
to read; ``tables.load_table`` converts the raw nanos to a proper
TimestampType column.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    # Correctness-critical
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: runtime shuffle-partition coalescing and
    # skew-join splitting — the knob that keeps plans healthy at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas_udf / applyInPandas paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast joins: dimension tables and the samples table are small;
    # 64 MiB lets Catalyst broadcast aggressively without OOM risk.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}

# Runtime bloom-filter join reduction
# (spark.sql.optimizer.runtime.bloomFilter.enabled +
# runtimeFilter.semiJoinReduction.enabled) is deliberately NOT in
# ENGINE_CONF: at 100 TB it is the cheapest shuffle-bytes win available
# (non-matching fact rows die before the exchange), but it makes every
# join — including the dozens of tiny dimension joins in the test
# ledger — pay an extra aggregation pass to build its filter, measured
# ~10× wall-clock on the sf0.01 differential gate.  Enable it per-job
# on real fact-scale workloads via ``get_spark(extra_conf=...)``; the
# creation-side thresholds only start paying for themselves when the
# probe side is orders of magnitude past test scale.


def get_spark(app_name: str = "cosmap_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master=None`` (the default) resolves to
    ``local[$SPARK_GRAFT_CPUS]`` — the driver's test-harness shape.  On
    a real cluster pass ``master=""`` (empty string): the builder then
    never sets a master, spark-submit's ``--master`` wins, and this
    factory only applies SQL-level conf.  (``None`` deliberately does
    NOT defer: a laptop user calling ``get_spark()`` with no
    spark-submit in sight should get a working local session, not a
    missing-master error.)
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally-created session.

    The driver owns SparkSession creation in the verify harness; static
    conf (like ``nanosAsLong``) must be set there, but everything
    runtime-settable we re-assert here so query behavior is stable.
    """
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf on a live session — best effort
            pass
    return spark
