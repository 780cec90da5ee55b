"""Local mirror of the driver's t2 gate: every registered query vs its
DuckDB oracle, compared as order-insensitive multisets of rows with
columns sorted by name — the same normalization the driver applies.

Run at sf0.001 by default (fast); set COSMAP_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import math

import pytest

from cosmap_spark.queries import all_oracles, all_queries

from .conftest import SF_DIR


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and fold rounding residue far below the
        # per-query round() precision
        return round(v + 0.0, 9)
    if hasattr(v, "__int__") and not isinstance(v, (int, bool)):
        try:
            return int(v)  # numpy ints / Decimal that are integral
        except (TypeError, ValueError):
            return float(v)
    return v


def _rows(df_pandas):
    cols = sorted(df_pandas.columns)
    out = [tuple(_canon(v) for v in row) for row in df_pandas[cols].itertuples(index=False, name=None)]
    return sorted(out, key=repr), cols


QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_pd = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, stable schema, ≥0 rows
        assert spark_pd.shape[0] >= 0
        return
    duck_pd = duck.execute(ORACLES[name]).fetchdf()
    s_rows, s_cols = _rows(spark_pd)
    d_rows, d_cols = _rows(duck_pd)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    # STRICT dtype parity after the pandas round-trip: the driver's
    # value hash distinguishes float64 4.0 from int64 4 even when _canon
    # below would equate them (this is how round 2's q_passage_dedup
    # HUGEINT bug passed locally while failing the gate).  Numeric
    # kind must match exactly; object/bool/datetime compare by kind.
    for c in s_cols:
        sk, dk = spark_pd[c].dtype.kind, duck_pd[c].dtype.kind
        # an all-null column arrives as object on one side sometimes
        if spark_pd[c].isna().all() and duck_pd[c].isna().all():
            continue
        assert sk == dk, (
            f"{name}.{c}: pandas dtype kind {sk!r} (spark) vs {dk!r} "
            "(oracle) — the driver hash will mismatch; cast in the SQL"
        )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"
    )


def test_all_queries_have_docstrings():
    for name, fn in QUERIES.items():
        assert fn.__doc__, f"{name} lacks a docstring"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 2


def test_sf_dir_used():
    # guard: parity must run against a real scale factor directory
    assert "testdata" in SF_DIR


def test_tpch_q5_plan_broadcasts_dimensions(spark):
    """Scale evidence: the 6-way join plans exactly two broadcast sides
    (nation⋈region prejoin, supplier prejoin) and never broadcasts or
    re-sorts the fact chain needlessly."""
    from cosmap_spark.queries import all_queries

    df = all_queries()["q_tpch_local_supplier"](spark, SF_DIR)
    df.count()  # let AQE finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q6_filters_pushed_to_scan(spark):
    """Scale evidence: all Q6 predicates reach the parquet reader and the
    scan schema is pruned to the needed columns."""
    from cosmap_spark.queries import all_queries

    df = all_queries()["q_tpch_forecast"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or f"GreaterThan({col}" in plan or col in plan.split("PushedFilters")[1][:400], plan
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "l_extendedprice" in read_schema
    assert "l_tax" not in read_schema  # unused column pruned


def test_topk_plans_take_ordered(spark):
    """Scale evidence: orderBy().limit(k) must plan TakeOrderedAndProject
    (per-partition heaps, no global sort/exchange of the full table)."""
    from cosmap_spark.queries import all_queries

    df = all_queries()["q_topk"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_embed_dup_plan_is_bucketed_not_quadratic(spark):
    """Scale evidence: q_embed_dup's candidate generation is an equi-join
    on (table, LSH bucket) — never a BroadcastNestedLoopJoin / cartesian
    pair scan (the O(n²) shape the DuckDB oracle brute-forces)."""
    from cosmap_spark.queries import all_queries

    df = all_queries()["q_embed_dup"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
