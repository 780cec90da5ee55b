"""Oracle ↔ Spark type-parity lint.

The driver's correctness gate hashes values after a pandas round-trip on
both sides.  DuckDB surfaces `sum()` over integers as HUGEINT (→ pandas
float64) and exact division as DECIMAL — either silently breaks the
value hash against Spark's bigint/double even when every value is equal
(this burned q_approx_percentile in round 1 and q_passage_dedup in
round 2).  This lint runs every oracle through DuckDB ``DESCRIBE`` and
the Spark query through schema analysis only (no job), classifies both
sides into numeric families, and fails on any mismatch or on any
HUGEINT/DECIMAL surfacing at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cosmap_spark.queries import all_oracles, all_queries

from .conftest import SF_DIR

ORACLES = all_oracles()
QUERIES = all_queries()

#: DuckDB types that pandas may widen/objectify — never allowed in an
#: oracle projection; CAST them (BIGINT/DOUBLE) in the SQL instead.
_FORBIDDEN_DUCK = ("HUGEINT", "DECIMAL", "UHUGEINT")


def _duck_family(t: str) -> str:
    t = t.upper()
    for bad in _FORBIDDEN_DUCK:
        if t.startswith(bad):
            return "FORBIDDEN:" + t
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "BLOB"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    return "other:" + t


def _spark_family(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return "FORBIDDEN:DECIMAL"
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        return "nested"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "str"  # both sides fetch as bytes
    return "other:" + dt.simpleString()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_type_parity(name, spark, duck):
    duck_desc = duck.execute("DESCRIBE " + ORACLES[name]).fetchall()
    duck_types = {row[0]: _duck_family(row[1]) for row in duck_desc}
    spark_schema = QUERIES[name](spark, SF_DIR).schema
    spark_types = {f.name: _spark_family(f.dataType) for f in spark_schema.fields}

    assert sorted(duck_types) == sorted(spark_types), (
        f"{name}: column sets differ — oracle {sorted(duck_types)} "
        f"vs spark {sorted(spark_types)}"
    )
    problems = []
    for col in sorted(duck_types):
        dfam, sfam = duck_types[col], spark_types[col]
        if dfam.startswith("FORBIDDEN") or sfam.startswith("FORBIDDEN"):
            problems.append(f"{col}: oracle={dfam} spark={sfam} (cast it)")
        elif dfam != sfam:
            problems.append(f"{col}: oracle family {dfam} != spark {sfam}")
    assert not problems, f"{name}: " + "; ".join(problems)
