"""Generic as-of join vs the pandas.merge_asof oracle: both directions,
exact/strict, grouped and ungrouped, plus plan-shape (no join node)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = random.Random(31)
    # unique (key, t) per side so pandas' duplicate-tie rule can't
    # diverge from our deterministic tie-break
    lrows, rrows = [], []
    for key in ("a", "b", "c"):
        lt = rng.sample(range(0, 500), 60)
        rt = rng.sample(range(0, 500), 40)
        lrows += [(key, t, f"L{key}{t}") for t in lt]
        rrows += [(key, t, f"R{key}{t}", t * 10) for t in rt]
    left = pd.DataFrame(lrows, columns=["k", "t", "lv"])
    right = pd.DataFrame(rrows, columns=["k", "t", "rv", "rn"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [False, True])
def test_asof_matches_pandas(spark, frames, direction, allow_exact):
    left, right = frames
    ldf = spark.createDataFrame(left.astype({"t": "int64"}))
    rdf = spark.createDataFrame(right.astype({"t": "int64", "rn": "int64"}))
    got = (
        asof_join(
            ldf, rdf, on="t", by=["k"], direction=direction,
            allow_exact=allow_exact,
        )
        .select("k", "t", "lv", "asof_rv", "asof_rn")
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("t"),
            on="t", by="k", direction=direction,
            allow_exact_matches=allow_exact,
        )
        .sort_values(["k", "t"])
        .reset_index(drop=True)
        .rename(columns={"rv": "asof_rv", "rn": "asof_rn"})
    )
    for col in ("asof_rv", "asof_rn"):
        g = [None if pd.isna(v) else v for v in got[col]]
        w = [None if pd.isna(v) else v for v in want[col]]
        assert g == w, f"{direction} exact={allow_exact} col={col}"


def test_asof_ungrouped(spark):
    left = spark.createDataFrame([(i,) for i in (5, 10, 15)], "t long")
    right = spark.createDataFrame(
        [(3, "x"), (10, "y"), (14, "z")], "t long, v string"
    )
    back_strict = {
        r["t"]: r["asof_v"]
        for r in asof_join(left, right, on="t", allow_unkeyed=True).collect()
    }
    assert back_strict == {5: "x", 10: "x", 15: "z"}
    back_exact = {
        r["t"]: r["asof_v"]
        for r in asof_join(left, right, on="t", allow_exact=True, allow_unkeyed=True).collect()
    }
    assert back_exact == {5: "x", 10: "y", 15: "z"}
    fwd = {
        r["t"]: r["asof_v"]
        for r in asof_join(left, right, on="t", direction="forward", allow_unkeyed=True).collect()
    }
    assert fwd == {5: "y", 10: "z", 15: None}


def test_asof_plan_has_no_join(spark, frames):
    left, right = frames
    ldf = spark.createDataFrame(left.astype({"t": "int64"}))
    rdf = spark.createDataFrame(right.astype({"t": "int64", "rn": "int64"}))
    out = asof_join(ldf, rdf, on="t", by=["k"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for node in ("Join", "CartesianProduct", "BroadcastNestedLoop"):
        assert node not in plan, f"asof_join must not plan a {node}"
    assert "Window" in plan


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [False, True])
def test_cogroup_twin_equals_distributed(spark, frames, direction, allow_exact):
    """The per-key pandas cogroup implementation and the union+window
    distributed implementation must agree exactly — pinning the scale
    path to pandas merge_asof semantics through a second, independent
    execution strategy."""
    from cosmap_spark.operators.asof import asof_join_cogroup

    left, right = frames
    ldf = spark.createDataFrame(left.astype({"t": "int64"}))
    rdf = spark.createDataFrame(right.astype({"t": "int64", "rn": "int64"}))
    kw = dict(on="t", by=["k"], direction=direction, allow_exact=allow_exact)
    a = sorted(
        ((r["k"], r["t"], r["lv"], r["asof_rv"], r["asof_rn"])
         for r in asof_join(ldf, rdf, **kw).collect())
    )
    b = sorted(
        ((r["k"], r["t"], r["lv"], r["asof_rv"], r["asof_rn"])
         for r in asof_join_cogroup(ldf, rdf, **kw).collect())
    )
    assert a == b


def test_asof_rejects_reserved_internal_names(spark):
    """Inputs carrying the operator's internal column names must raise a
    clear error instead of silently corrupting the fill."""
    import pytest

    left = spark.createDataFrame([(1, 10, 0)], "k long, t long, __tag long")
    right = spark.createDataFrame([(1, 5, 1.0)], "k long, t long, rv double")
    with pytest.raises(ValueError, match="reserves internal column names"):
        asof_join(left, right, on="t", by=["k"])


def test_asof_unkeyed_requires_optin(spark):
    """by=None is the single-partition shape — refused unless the
    caller opts in for known-small inputs."""
    left = spark.createDataFrame([(5,)], "t long")
    right = spark.createDataFrame([(3, "x")], "t long, v string")
    with pytest.raises(ValueError, match="allow_unkeyed"):
        asof_join(left, right, on="t")


def test_cogroup_twin_shared_payload_name(spark):
    """A right payload column named like a LEFT column must come back
    as the RIGHT side's values (merge_asof suffixes the right copy; a
    blanket rename used to grab the left column instead)."""
    from cosmap_spark.operators.asof import asof_join_cogroup

    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0)], "k long, t long, val double"
    )
    right = spark.createDataFrame(
        [(1, 5, 1.5), (1, 15, 2.5)], "k long, t long, val double"
    )
    kw = dict(on="t", by=["k"])
    got = {
        r["t"]: (r["val"], r["asof_val"])
        for r in asof_join_cogroup(left, right, **kw).collect()
    }
    assert got == {10: (100.0, 1.5), 20: (200.0, 2.5)}
    # and it still agrees with the distributed window path
    win = {
        r["t"]: (r["val"], r["asof_val"])
        for r in asof_join(left, right, **kw).collect()
    }
    assert win == got
