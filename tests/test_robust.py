"""Winsorize / robust-outlier tests: clipping semantics vs exact numpy
quantiles on a known distribution, planted-outlier detection, grouped
parameters, constant columns, and map-side-after-parameters plans."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.robust import robust_outliers, winsorize


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(10, 2, 2000), [1e6, -1e6, 5e5]])
    return spark.createDataFrame(
        [(i, float(v), "a" if i % 2 else "b") for i, v in enumerate(vals)],
        "id long, x double, grp string",
    ).cache()


def test_winsorize_bounds_and_interior(skewed):
    out = winsorize(skewed, ["x"], lower=0.01, upper=0.99).cache()
    vals = np.array([r["x"] for r in skewed.select("x").collect()])
    lo, hi = np.quantile(vals, [0.01, 0.99])
    got = {r["id"]: (r["x"], r["x_w"]) for r in out.collect()}
    # sketch quantiles at accuracy 10k on 2k rows are near-exact; allow
    # one rank of slack by checking against the data's neighborhood
    for _, (x, xw) in got.items():
        assert xw == pytest.approx(min(max(x, lo), hi), rel=1e-3, abs=1e-2) or (
            lo * 0.9 <= xw <= hi * 1.1
        )
    # the planted extremes must be clipped hard
    assert all(abs(xw) < 1e5 for x, xw in got.values())
    # interior points untouched
    untouched = [1 for x, xw in got.values() if lo < x < hi and x == xw]
    assert len(untouched) > 1800


def test_robust_outliers_find_planted(skewed):
    out = robust_outliers(skewed, "x", threshold=3.5)
    flagged = {r["id"] for r in out.where(F.col("x_outlier")).collect()}
    n = skewed.count()
    # the three planted extremes are the last three ids
    assert {n - 3, n - 2, n - 1} <= flagged
    # and the bulk is not flagged (normal tail at 3.5 modified-z ≈ 0)
    assert len(flagged) < 0.02 * n


def test_robust_outliers_grouped(spark):
    rows = [(i, 1.0 + (i % 5) * 0.1, "lo") for i in range(100)]
    rows += [(100 + i, 1000.0 + (i % 5) * 10, "hi") for i in range(100)]
    rows += [(200, 1e9, "lo"), (201, -1e9, "hi")]
    df = spark.createDataFrame(rows, "id long, x double, grp string")
    out = robust_outliers(df, "x", group_by=["grp"])
    flagged = {r["id"] for r in out.where(F.col("x_outlier")).collect()}
    assert flagged == {200, 201}
    # per-group scaling: the hi group's ordinary members are NOT
    # outliers despite being 1000× the lo group's values
    assert out.where(~F.col("x_outlier")).count() == 200


def test_constant_column_flags_nothing(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(50)], "id long, x double")
    out = robust_outliers(df, "x")
    assert out.where(F.col("x_outlier")).count() == 0
    assert out.where(F.col("x_z") != 0.0).count() == 0


def test_winsorize_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        winsorize(df, ["x"], lower=0.5, upper=0.4)


def test_no_python_no_cartesian_in_plan(skewed):
    out = robust_outliers(winsorize(skewed, ["x"]), "x")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_grouped_null_key_rows_survive(spark):
    """A NULL group key is a real group: its rows must come back with
    their own median/MAD parameters, not vanish in the join-back (the
    corpus_report / stratified_sample null-safety contract)."""
    from cosmap_spark.operators.robust import robust_outliers

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0)] + [
        (None, 10.0), (None, 11.0), (None, 12.0), (None, 500.0)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = robust_outliers(df, "x", group_by=["g"], threshold=3.0)
    assert out.count() == 8  # nothing dropped
    nulls = {r["x"]: r["x_outlier"] for r in out.where("g IS NULL").collect()}
    assert nulls[500.0] is True and nulls[10.0] is False
