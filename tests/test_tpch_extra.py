"""Differential gate for the beyond-ledger TPC-H decorrelation shapes
(queries/tpch_extra.py) — same normalization as the driver's t2 gate —
plus plan-shape asserts that each subquery actually decorrelated."""

from __future__ import annotations

import pytest

from cosmap_spark.queries.tpch_extra import EXTRA_ORACLES, EXTRA_QUERIES

from .conftest import SF_DIR
from .test_parity import _rows


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_parity(name, spark, duck):
    spark_pd = EXTRA_QUERIES[name](spark, SF_DIR).toPandas()
    duck_pd = duck.execute(EXTRA_ORACLES[name]).fetchdf()
    s_rows, s_cols = _rows(spark_pd)
    d_rows, d_cols = _rows(duck_pd)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: {len(s_rows)} rows vs oracle {len(d_rows)}"
    )
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_plan_decorrelated(name, spark):
    """EXISTS/NOT-IN/scalar subqueries must plan as joins — never a
    nested-loop re-evaluation per outer row, never a cartesian."""
    df = EXTRA_QUERIES[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, name
    if name not in ("q_tpch_idle_customers", "q_tpch_top_supplier",
                    "q_tpch_important_parts"):
        # (the 1-row scalar broadcast there is the intended plan)
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_semi_anti_joins_present(spark):
    """The decorrelations produce the join types they claim."""
    expect = {
        "q_tpch_priority": "LeftSemi",
        "q_tpch_parts_supp": "LeftAnti",
        "q_tpch_big_orders": "LeftSemi",
        "q_tpch_bulk_suppliers": "LeftSemi",
        "q_tpch_idle_customers": "LeftAnti",
    }
    for name, jt in expect.items():
        df = EXTRA_QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert jt in plan, f"{name}: expected {jt} join in plan"
