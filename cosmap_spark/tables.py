"""Table loaders: the driver's star schema + derived cosmap-shaped fixtures.

The driver provides ten parquet tables per scale factor
(``/root/testdata/sf*/``, see TESTDATA.md).  Two additional *derived*
fixtures reproduce the reference's data model (FIXTURES.md §11-12):

* ``catalog``  — the sky-survey catalog analog (cosmap "catalog" dtype,
  reference src/cosmap/dataset/__init__.py:20-27): one object per
  customer, with deterministic area-uniform (ra, dec) sky positions.
* ``samples``  — the sample-region table (cosmap sample = circle
  center + radius, reference src/cosmap/analysis/sampler.py:132-140):
  one circular region per supplier.

Both are pure functions of key columns, expressible identically in Spark
and ANSI SQL, so the DuckDB oracle can re-derive them bit-for-bit.  The
SQL text used by oracles lives here too (``CATALOG_CTE`` / ``SAMPLES_CTE``)
to keep the two derivations visibly in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table; normalize ``events.ts`` to TimestampType.

    ``events`` is written with TIMESTAMP(NANOS) which Spark reads only as
    a raw long (``spark.sql.legacy.parquet.nanosAsLong``); we convert to
    microsecond TimestampType here so downstream code sees the FIXTURES.md
    schema. Sub-microsecond precision is dropped — acceptable because all
    declared queries compare at second granularity or coarser.
    """
    if name == "events":
        conf_err = None
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception as e:  # locked-down conf — remember, don't mask
            conf_err = e
        try:
            df = spark.read.parquet(f"{sf_dir}/events.parquet")
        except Exception as e:
            if conf_err is not None:
                # without the legacy conf Spark refuses TIMESTAMP(NANOS)
                # with an opaque "Illegal Parquet type" — say WHY the
                # conf it needed could not be applied
                raise RuntimeError(
                    "load_table('events'): reading failed AND the "
                    "required spark.sql.legacy.parquet.nanosAsLong=true "
                    f"conf could not be set on this session ({conf_err!r})"
                    " — set it at session build time"
                ) from e
            raise
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- Derived fixtures -----------------------------------------------------
# Golden-angle RA spread + area-uniform dec (uniform in sin(dec)) give a
# deterministic, well-spread synthetic sky.  The SQL text and the
# DataFrame expressions below MUST stay semantically identical: the
# correctness gate re-derives these in DuckDB from the same parquet.

CATALOG_CTE = """catalog AS (
  SELECT c_custkey AS object_id,
         mod(CAST(c_custkey AS DOUBLE) * 137.508, 360.0) AS ra,
         degrees(asin(2.0 * mod(CAST(c_custkey AS DOUBLE) * 0.61803398875, 1.0) - 1.0)) AS dec,
         20.0 + mod(CAST(c_custkey AS DOUBLE), 5.0) AS mag_r,
         mod(CAST(c_custkey AS DOUBLE) * 0.001, 1.5) AS z
  FROM customer
)"""

SAMPLES_CTE = """samples AS (
  SELECT s_suppkey AS sample_id,
         mod(CAST(s_suppkey AS DOUBLE) * 222.492, 360.0) AS ra,
         degrees(asin(2.0 * mod(CAST(s_suppkey AS DOUBLE) * 0.38196601125, 1.0) - 1.0)) AS dec,
         0.5 + mod(CAST(s_suppkey AS DOUBLE), 3.0) AS radius_deg
  FROM supplier
)"""


def catalog_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived sky-catalog fixture (see CATALOG_CTE for the oracle twin)."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("double")
    return c.select(
        F.col("c_custkey").alias("object_id"),
        ((k * 137.508) % 360.0).alias("ra"),
        F.degrees(F.asin(2.0 * ((k * 0.61803398875) % 1.0) - 1.0)).alias("dec"),
        (F.lit(20.0) + (k % 5.0)).alias("mag_r"),
        ((k * 0.001) % 1.5).alias("z"),
    )


def samples_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived sample-region fixture (see SAMPLES_CTE for the oracle twin)."""
    s = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("double")
    return s.select(
        F.col("s_suppkey").alias("sample_id"),
        ((k * 222.492) % 360.0).alias("ra"),
        F.degrees(F.asin(2.0 * ((k * 0.38196601125) % 1.0) - 1.0)).alias("dec"),
        (F.lit(0.5) + (k % 3.0)).alias("radius_deg"),
    )


def with_fixture_ctes(select_sql: str) -> str:
    """Prepend the catalog+samples CTEs to an oracle SELECT."""
    return f"WITH {CATALOG_CTE}, {SAMPLES_CTE}\n{select_sql}"
