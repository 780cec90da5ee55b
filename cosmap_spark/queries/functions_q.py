"""Scalar-function queries (SURVEY.md §2.2 "Scalar functions").

In-reference scalar math is spherical trig + unit rescale (covered in
spatial.py); string/date/JSON/array functions are absent there and come
from the Spark function surface.  Float outputs of libm-backed functions
are rounded to 6 dp in both engines (JVM vs C libm may differ in the last
ulp).

Consolidated (round 2): one suite per input shape — math+string+regex
over part, calendar+arithmetic over orders, classic-JSON+VARIANT over
events, array ops over embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


@query(
    "q_part_scalars",
    oracle="""
    SELECT p_partkey,
           round(sin(radians(p_retailprice)), 6) AS sin_price,
           round(cos(radians(p_retailprice)), 6) AS cos_price,
           round(sqrt(CAST(p_size AS DOUBLE)), 6) AS sqrt_size,
           round(ln(p_retailprice), 6) AS ln_price,
           round(atan2(CAST(p_size AS DOUBLE), p_retailprice), 6) AS at2,
           round(pow(p_retailprice, 0.5), 6) AS pow_half,
           lower(p_name) AS lname,
           upper(p_type) AS utype,
           substr(p_name, 1, 8) AS prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           p_name || '/' || p_brand AS tagged,
           p_name LIKE '%an%' AS has_an,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
           regexp_matches(p_name, 'a.*e') AS has_ae,
           regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked
    FROM part WHERE p_retailprice > 0
    """,
)
def q_part_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row scalar surface in one projection over part:

    * trig/log/power math (reference O10/O11 use the same family:
      cos/arccos/degrees/radians, src/cosmap/analysis/sampler.py:87-113);
    * lower/upper/substr/length/concat + LIKE predicate (as a boolean
      column, so the semantics are value-verified, not just row-count);
    * regex extract/match/replace parity (note DuckDB needs the 'g'
      flag to match Spark's replace-all semantics)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_retailprice") > 0)
    return p.select(
        "p_partkey",
        F.round(F.sin(F.radians("p_retailprice")), 6).alias("sin_price"),
        F.round(F.cos(F.radians("p_retailprice")), 6).alias("cos_price"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("sqrt_size"),
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.col("p_retailprice")), 6).alias("at2"),
        F.round(F.pow("p_retailprice", 0.5), 6).alias("pow_half"),
        F.lower("p_name").alias("lname"),
        F.upper("p_type").alias("utype"),
        F.substring("p_name", 1, 8).alias("prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_name", "p_brand").alias("tagged"),
        F.col("p_name").like("%an%").alias("has_an"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
        F.col("p_name").rlike("a.*e").alias("has_ae"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(day(o_orderdate) AS BIGINT) AS o_day,
           CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date_str,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS o_month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
           CAST(last_day(o_orderdate) AS VARCHAR) AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction, truncation, formatting, and date arithmetic:
    day diffs from an epoch date, fixed-interval shift, month-end.
    Dates surface as strings/ints (never raw timestamps) for exact
    cross-engine hashing."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date_str"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("o_month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.date_add(F.col("o_orderdate"), 30).cast("string").alias("due_date"),
        F.last_day(F.col("o_orderdate")).cast("string").alias("month_end"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           CAST(props->>'$.k' AS BIGINT) % 7 AS k_mod,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_variant
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) > 50
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access, classic and modern: per-path
    ``get_json_object`` re-parsing alongside the VARIANT type (Spark 4)
    — parse_json once, typed variant_get extraction, columnar-shredded
    at rest when written.  Both paths must agree on the same payload."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 7).alias("k_mod"),
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_variant"),
    ).where(F.col("k") > 50)


@query(
    "q_array_funcs",
    oracle="""
    WITH el AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT e.vec_id,
           len(e.embedding) AS dim,
           round(CAST(e.embedding[1] AS DOUBLE), 6) AS first_el,
           round(s.sum_el, 4) AS sum_el,
           round(s.max_el, 6) AS max_el
    FROM embeddings e
    JOIN (SELECT vec_id, sum(x) AS sum_el, max(x) AS max_el
          FROM el GROUP BY vec_id) s USING (vec_id)
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the embedding column: size, index, explode+agg.
    Exercises explode → groupBy (the unnest path) plus direct indexing."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "vec_id", F.explode(F.col("embedding").cast("array<double>")).alias("x")
    )
    sums = exploded.groupBy("vec_id").agg(
        F.round(F.sum("x"), 4).alias("sum_el"),
        F.round(F.max("x"), 6).alias("max_el"),
    )
    return (
        e.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_el"),
        )
        .join(sums, "vec_id")
        .select("vec_id", "dim", "first_el", "sum_el", "max_el")
    )
