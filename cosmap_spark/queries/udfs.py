"""UDF/UDAF/UDTF queries (SURVEY.md §2.2 "UDF surface").

User transformations are the reference's ENTIRE compute model — arbitrary
Python over per-sample tables invoked by getattr (reference
src/cosmap/analysis/task.py:178-187).  The Spark mapping is exactly the
Arrow-vectorized trio below: scalar ``pandas_udf``, GROUPED_AGG
``pandas_udf``, and grouped-map ``applyInPandas``.  Rounding is applied
JVM-side (``F.round``) after the UDF so the half-up rule matches the
oracle (numpy rounds half-to-even).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 6) AS charged
    FROM lineitem
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches); the arithmetic is
    pure IEEE multiply/add in float64 so it is bit-identical to the SQL
    expression oracle."""

    @F.pandas_udf(DoubleType())
    def charged(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ep * (1.0 - disc) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(charged("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_quantity), 6) AS mean_qty,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (custom per-group aggregate) checked
    against the built-in ``avg`` oracle."""

    @F.pandas_udf("double")
    def mean_qty(qty: pd.Series) -> float:  # GROUPED_AGG via usage in agg()
        return float(qty.mean())

    @F.pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        return int(qty.shape[0])

    li = load_table(spark, sf_dir, "lineitem")
    # Spark disallows mixing pandas grouped-agg UDFs with JVM aggregates
    # in one agg(); both aggregates are pandas UDFs instead.
    return li.groupBy("l_returnflag").agg(
        F.round(mean_qty("l_quantity"), 6).alias("mean_qty"),
        n_rows("l_quantity").alias("n_rows"),
    )


@query(
    "q_udtf_grouped_map",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_suppkey AS BIGINT) AS l_suppkey,
           round((l_extendedprice - avg(l_extendedprice) OVER w)
                 / stddev_samp(l_extendedprice) OVER w, 6) AS zscore
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey)
    """,
)
def q_udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` — the per-sample "whole small table
    in, table out" shape of a reference transformation (reference
    src/cosmap/analysis/task.py:168-188) — computing a per-group z-score;
    oracle is the equivalent window SQL.

    Grouped by ``l_suppkey`` (high cardinality: ~SF*10k groups of ~60
    rows), matching the reference's many-small-samples shape.  A
    low-cardinality key here (e.g. 3 return flags) would funnel the whole
    table through 3 Python workers — the grouped-map path only scales
    when groups outnumber cores."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["l_extendedprice"].mean()
        s = pdf["l_extendedprice"].std(ddof=1)
        out = pdf[["l_orderkey", "l_linenumber", "l_suppkey"]].copy()
        # singleton / zero-variance groups: pandas yields NaN (0/NaN or
        # 0/0) where the oracle's stddev_samp is NULL — surface NULL so
        # the twin stays exact on any group-size distribution
        if pd.isna(s) or s <= 0:
            out["zscore"] = None
        else:
            out["zscore"] = (pdf["l_extendedprice"] - m) / s
        return out

    li = load_table(spark, sf_dir, "lineitem")
    # Project BEFORE the grouped-map boundary (guide §4.1): Spark
    # cannot see which columns the Python function touches, so an
    # un-projected applyInPandas shuffles and ships every lineitem
    # column (11) to the workers; the explicit select narrows the
    # scan's ReadSchema, the exchange, and the Arrow transfer to the
    # 4 columns the kernel reads — same rows, same output.
    result = (
        li.select("l_orderkey", "l_linenumber", "l_suppkey",
                  "l_extendedprice")
        .groupBy("l_suppkey")
        .applyInPandas(
            normalize,
            schema="l_orderkey long, l_linenumber int, l_suppkey long,"
                   " zscore double",
        )
    )
    return result.withColumn("zscore", F.round("zscore", 6))


def sentence_udtf():
    """Python UDTF (Spark 4 table function): explode a document into
    (sentence_id, sentence, n_chars) rows — the LATERAL-join member of
    the UDF family, complementing the Arrow trio above.

    Registered Arrow-optimized (``useArrow=True``) but still
    fundamentally the Python path: fine as API-surface coverage and for
    driver-side tooling, NOT for a 100 TB hot loop — the engine's
    sentence/chunk splitting at scale is the pure-JVM
    ``functions.text.chunk_text``.  Beyond-ledger: differential-tested
    in tests/test_udtf.py against an equivalent JVM expression."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_id int, sentence string, n_chars int",
          useArrow=True)
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            import re

            parts = [
                s.strip() for s in re.split(r"(?<=[.!?])\s+", text)
                if s.strip()
            ]
            for i, s in enumerate(parts):
                yield i, s, len(s)

    return SplitSentences
