"""Expectations validator: counts vs hand-computed, NULL-as-violation,
threshold semantics, enforce/quarantine contracts, one-job plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.expectations import (
    ExpectationError,
    enforce,
    quarantine,
    validate,
)

RULES = [
    {"name": "id_nonneg", "expr": "id >= 0"},
    {"name": "v_bounded", "expr": "v BETWEEN 0 AND 100",
     "max_violation_frac": 0.05},
    {"name": "tag_known", "expr": "tag IN ('a', 'b')"},
]


@pytest.fixture(scope="module")
def table(spark):
    return spark.range(1_000).select(
        "id",
        F.when(F.col("id") % 50 == 0, F.lit(None)).otherwise(
            (F.col("id") % 120).cast("double")
        ).alias("v"),  # 20 NULLs + ids where v in (100,120) exceed bound
        F.when(F.col("id") % 100 == 99, F.lit("zzz"))
        .otherwise(F.when(F.col("id") % 2 == 0, "a").otherwise("b"))
        .alias("tag"),
    ).cache()


def test_validate_counts(spark, table):
    rows = {r["rule"]: r for r in validate(table, RULES).collect()}
    assert rows["id_nonneg"]["n_violations"] == 0
    assert rows["id_nonneg"]["passed"]
    # violations: NULL v (20 rows) + v in (101..119 by %120 mapping)
    want_v = table.where(
        ~F.coalesce(F.expr("v BETWEEN 0 AND 100"), F.lit(False))
    ).count()
    assert rows["v_bounded"]["n_violations"] == want_v
    assert rows["tag_known"]["n_violations"] == 10
    assert not rows["tag_known"]["passed"]
    for r in rows.values():
        assert r["n_rows"] == 1_000


def test_threshold_semantics(spark, table):
    frac = {r["rule"]: r for r in validate(table, RULES).collect()}[
        "v_bounded"
    ]["violation_frac"]
    rules = [
        {"name": "loose", "expr": "v BETWEEN 0 AND 100",
         "max_violation_frac": frac + 0.01},
        {"name": "tight", "expr": "v BETWEEN 0 AND 100",
         "max_violation_frac": frac - 0.01},
    ]
    got = {r["rule"]: r["passed"] for r in validate(table, rules).collect()}
    assert got == {"loose": True, "tight": False}


def test_enforce_raises_with_detail(spark, table):
    with pytest.raises(ExpectationError, match="tag_known"):
        enforce(table, RULES)
    enforce(table, [RULES[0]])  # passing rule set: no raise


def test_quarantine_splits_exactly(spark, table):
    clean, bad = quarantine(table, RULES)
    n_clean, n_bad = clean.count(), bad.count()
    assert n_clean + n_bad == 1_000
    assert bad.where(F.expr(
        "id >= 0 AND coalesce(v BETWEEN 0 AND 100, false) "
        "AND tag IN ('a','b')"
    )).count() == 0
    assert clean.where(~F.coalesce(
        F.expr("v BETWEEN 0 AND 100"), F.lit(False)
    )).count() == 0


def test_validation_errors(spark, table):
    with pytest.raises(ValueError):
        validate(table, [])
    with pytest.raises(ValueError):
        validate(table, [{"name": "x", "expr": "1=1"}] * 2)


def test_single_aggregation_job(spark, table):
    """All rules fold into ONE aggregate: the plan has exactly one
    pair of partial/final aggregates over the scan, no joins."""
    from cosmap_spark.operators.report import plan_summary

    df = validate(table, RULES)
    s = plan_summary(df)
    assert s["python_evals"] == 0 and s["arrow_evals"] == 0
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    # exactly one partial/final aggregate pair — a union-of-selects
    # formulation would plan the aggregate once per rule
    assert simple.count("HashAggregate") == 2
    assert (
        s["broadcast_joins"] + s["sortmerge_joins"]
        + s["shuffled_hash_joins"] + s["nested_loop_joins"] == 0
    )


def test_empty_table_reports_zero_not_null(spark):
    e = spark.createDataFrame([], "id long")
    r = validate(e, [{"name": "x", "expr": "id >= 0"}]).collect()[0]
    assert r["n_violations"] == 0 and r["n_rows"] == 0 and r["passed"]
