"""Property-based tests (hypothesis) for the driver-side pure logic:
DAG topo ordering, @-reference resolution, variant merges, quantity
normalization — fast, no Spark session needed."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from cosmap_spark.pipeline.config import quantity_to_deg, resolve_references
from cosmap_spark.pipeline.dag import topo_order
from cosmap_spark.pipeline.manage import combine_dicts

# --- random DAGs: topo order always respects dependencies -----------------

names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=3),
    min_size=1, max_size=8, unique=True,
)


@st.composite
def random_dag(draw):
    ns = draw(names)
    block = {}
    for i, n in enumerate(ns):
        # only depend on earlier names ⇒ acyclic by construction
        pool = ns[:i]
        deps = draw(
            st.lists(st.sampled_from(pool), max_size=min(3, len(pool)), unique=True)
        ) if pool else []
        block[n] = {"dependencies": {f"d{j}": d for j, d in enumerate(deps)}}
    return block


@given(random_dag())
@settings(max_examples=200, deadline=None)
def test_topo_order_respects_all_edges(block):
    order = topo_order(block)
    assert sorted(order) == sorted(block)
    pos = {n: i for i, n in enumerate(order)}
    for n, spec in block.items():
        for dep in spec["dependencies"].values():
            assert pos[dep] < pos[n]


# --- @-reference resolution: fixpoint + structure preservation ------------

leaf = st.one_of(st.integers(-10, 10), st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=5).filter(lambda s: not s.startswith("@")))


@given(st.dictionaries(st.sampled_from("abcd"), st.dictionaries(st.sampled_from("xyz"), leaf, min_size=1), min_size=1))
@settings(max_examples=100, deadline=None)
def test_resolution_without_refs_is_identity(tree):
    assert resolve_references(tree) == tree


@given(st.sampled_from("abcd"), st.sampled_from("xyz"), leaf)
@settings(max_examples=100, deadline=None)
def test_single_ref_resolves_to_target(block, key, value):
    tree = {block: {key: value}, "ref": {"got": f"@{block}.{key}"}}
    out = resolve_references(tree)
    assert out["ref"]["got"] == value or (
        isinstance(value, float) and math.isnan(value)
    )


# --- merges: right bias + key preservation --------------------------------

json_scalars = st.one_of(st.integers(), st.text(max_size=4), st.booleans())
json_dicts = st.dictionaries(st.sampled_from("pqrs"), json_scalars, max_size=4)


@given(json_dicts, json_dicts)
@settings(max_examples=200, deadline=None)
def test_combine_dicts_right_biased_and_total(a, b):
    m = combine_dicts(a, b)
    assert set(m) == set(a) | set(b)
    for k in b:
        assert m[k] == b[k]
    for k in set(a) - set(b):
        assert m[k] == a[k]


# --- quantity normalization: scale linearity ------------------------------


@given(st.floats(min_value=0, max_value=1e6, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_quantity_units_consistent(v):
    assert math.isclose(
        quantity_to_deg({"value": v, "units": "arcmin"}) * 60,
        quantity_to_deg({"value": v, "units": "arcsec"}) * 3600,
        rel_tol=1e-12, abs_tol=1e-12,
    )
    assert quantity_to_deg({"value": v, "units": "deg"}) == v


def test_approx_top_k_matches_exact_on_separated_freqs(spark):
    from pyspark.sql import functions as F

    from cosmap_spark.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    top3 = sorted(exact, key=lambda k: (-exact[k], k))[:3]
    approx = {
        r["item"]: r["est_count"]
        for r in orders.select(
            F.explode(F.expr("approx_top_k(o_orderpriority, 3)")).alias("hit")
        ).select("hit.item", F.col("hit.count").alias("est_count")).collect()
    }
    # low-cardinality column: the sketch is exact
    assert set(approx) == set(top3)
    for k in top3:
        assert approx[k] == exact[k]
