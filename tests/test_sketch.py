"""Misra-Gries heavy-hitter sketch: exactness above the guarantee
threshold vs a full groupBy, bounded candidate exchange, partition
independence of the RESULT (candidates may differ, verified output may
not), and plan gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.sketch import heavy_hitters_sketch


@pytest.fixture(scope="module")
def skewed(spark):
    """200k rows: key 0 ≈ 50%, keys 1-4 ≈ 5% each, the rest spread over
    ~25k distinct tail keys."""
    return spark.range(200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .when(F.col("id") % 40 < 8, (F.col("id") % 40) % 8 % 5 + 1)
        .otherwise(F.col("id") % 25_000 + 100)
        .alias("k")
    ).cache()


def _exact_counts(df, min_count):
    return {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count).collect()
    }


def test_matches_exact_groupby_above_threshold(spark, skewed):
    n = skewed.count()
    k = 64
    floor = n // (k + 1) + 1
    want = _exact_counts(skewed, floor)
    got = {r["k"]: r["n"] for r in
           heavy_hitters_sketch(skewed, "k", k=k).collect()}
    assert got == want
    assert 0 in got and got[0] == pytest.approx(n / 2, rel=0.01)


def test_min_count_cut(spark, skewed):
    got = {r["k"]: r["n"] for r in
           heavy_hitters_sketch(skewed, "k", k=64, min_count=50_000).collect()}
    assert set(got) == {0}


def test_result_partition_independent(spark, skewed):
    a = sorted(map(tuple, heavy_hitters_sketch(skewed, "k", k=64).collect()))
    b = sorted(map(tuple, heavy_hitters_sketch(
        skewed.repartition(17), "k", k=64
    ).collect()))
    assert a == b


def test_string_keys(spark):
    df = spark.range(10_000).select(
        F.when(F.col("id") % 3 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), F.col("id"))).alias("k")
    )
    got = {r["k"]: r["n"] for r in
           heavy_hitters_sketch(df, "k", k=16).collect()}
    assert got == {"hot": df.where(F.col("k") == "hot").count()}


def test_candidate_exchange_is_bounded_and_plan_clean(spark, skewed):
    from cosmap_spark.operators.report import plan_summary

    out = heavy_hitters_sketch(skewed, "k", k=64)
    s = plan_summary(out)
    # the MG pass sits behind a localCheckpoint (its tiny output is
    # reused for candidates AND the row total), so it is audited on its
    # own frame below; the verify plan itself must be Python-free
    assert s["python_evals"] == 0
    assert s["cartesian_products"] == 0
    # exactly one nested-loop: the 1-row totals crossJoin (the engine's
    # scalar-subquery shape) — never a pair scan
    assert s["nested_loop_joins"] <= 1
    assert s["broadcast_joins"] >= 1, "candidates must broadcast"

    from cosmap_spark.operators.sketch import _mg_summarize

    mg = skewed.select(F.col("k").alias("key")).mapInPandas(
        _mg_summarize(8), "key bigint, mg_count long, part_rows long"
    )
    s_mg = plan_summary(mg)
    assert s_mg["arrow_evals"] == 1 and s_mg["python_evals"] == 0
    assert s_mg["exchanges"] == 0  # summaries are produced map-side


def test_null_keys_excluded_without_corrupting_int_keys(spark):
    """Null keys are excluded by contract (documented); crucially their
    presence must NOT corrupt the int64 keys around them (Arrow→pandas
    widens a nullable int column to float64, collapsing keys > 2^53)."""
    big_a = (1 << 60) + 1
    big_b = (1 << 60) + 2  # collides with big_a under float64
    rows = [(big_a,)] * 500 + [(big_b,)] * 30 + [(None,)] * 400
    df = spark.createDataFrame(rows, "k long")
    got = {r["k"]: r["n"] for r in
           heavy_hitters_sketch(df, "k", k=8).collect()}
    assert got[big_a] == 500
    assert None not in got
    # the non-null total (530) sets the threshold: 530//9+1 = 59 > 30,
    # so big_b correctly falls below the guarantee line
    assert big_b not in got


def test_lazy_until_action(spark, skewed):
    """heavy_hitters_sketch must not run jobs at call time (the row
    total rides on the MG summaries, not an eager count)."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    heavy_hitters_sketch(skewed, "k", k=64)  # no action
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_mg_summary_emits_total_even_when_counters_cancel():
    """A partition whose MG counters cancel to empty must still report
    its row count via the null-key sentinel — otherwise N understates,
    the guarantee threshold drops, and output becomes layout-dependent."""
    import pandas as pd

    from cosmap_spark.operators.sketch import _mg_summarize

    # k=2, three distinct singletons: insert a, insert b, c triggers
    # decrement-all by 1 which wipes both counters and c itself
    frames = list(_mg_summarize(2)([pd.DataFrame({"key": ["a", "b", "c"]})]))
    assert sum(int(f["part_rows"].sum()) for f in frames) == 3
    non_sentinel = [
        f for f in frames if not f["key"].isna().all()
    ]
    assert non_sentinel == []  # counters really did cancel


def test_threshold_uses_full_row_count_across_layouts(spark):
    """End-to-end: a key exactly AT the old understated threshold must
    be excluded identically under layouts where some partitions'
    counters cancel."""
    # N=400, k=4 → guarantee floor 400//5+1 = 81: hot (100) must always
    # surface; every tail singleton is far below
    rows = [("hot",)] * 100 + [(f"t{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string")
    want = {("hot", 100)}
    for parts in (1, 7, 36):
        got = {
            tuple(r) for r in
            heavy_hitters_sketch(df.repartition(parts), "k", k=4).collect()
        }
        assert got == want, parts


# ---------------------------------------------------------------- HLL rollup


@pytest.fixture(scope="module")
def hier(spark):
    """60k rows over a 3×4 (region, cls) hierarchy; uid distincts per
    leaf differ by construction: leaf (r, c) holds uids from a block of
    size 500·(c+1) — known exact NDVs at every level."""
    return spark.range(60_000).select(
        "id",
        F.expr("CAST(id % 3 AS STRING)").alias("region"),
        F.expr("CAST((id DIV 3) % 4 AS STRING)").alias("cls"),
        # block offset separates (region, cls) uid ranges; modulus sets NDV
        F.expr(
            "(id % 3) * 1000000 + ((id DIV 3) % 4) * 100000"
            " + id % (500 * (((id DIV 3) % 4) + 1))"
        ).alias("uid"),
    ).cache()


def _rollup_map(df):
    from cosmap_spark.operators.sketch import distinct_rollup

    return {
        (r["level"], r["region"], r["cls"]): r["ndv"]
        for r in distinct_rollup(
            df, ["region", "cls"], "uid", lg_k=12
        ).collect()
    }


def test_hll_rollup_levels_and_accuracy(spark, hier):
    got = _rollup_map(hier)
    # 12 leaf + 3 region + 1 grand total rows, NULL keys only above level
    assert len(got) == 16
    assert {k[0] for k in got} == {"region,cls", "region", "(all)"}
    assert all(k[2] is None for k in got if k[0] == "region")
    exact_leaf = {
        (r["region"], r["cls"]): r["n"]
        for r in hier.groupBy("region", "cls")
        .agg(F.countDistinct("uid").alias("n")).collect()
    }
    for (region, cls), n in exact_leaf.items():
        est = got[("region,cls", region, cls)]
        assert est == pytest.approx(n, rel=0.05), (region, cls)
    exact_total = hier.select("uid").distinct().count()
    assert got[("(all)", None, None)] == pytest.approx(exact_total, rel=0.05)


def test_hll_rollup_union_tracks_direct_sketch(spark, hier):
    """The rolled-up grand total must carry the same accuracy bound as
    sketching the raw column directly — NOT bit-equality: estimates are
    not bit-stable across merge orders (coupon vs dense representation,
    the repo-wide HLL invariant), even though they coincide at this
    fixture's cardinality.  Tolerance = 2× the lg_k=12 bound."""
    got = _rollup_map(hier)
    direct = hier.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("uid"), F.lit(12))
        ).alias("ndv")
    ).collect()[0]["ndv"]
    assert got[("(all)", None, None)] == pytest.approx(direct, rel=2 * 1.04 / 2**6)


def test_merge_sketch_tables_incremental(spark, hier):
    """Persisted-sketch-store maintenance: sketch two disjoint batches
    separately, merge per key — estimates equal sketching the union."""
    from cosmap_spark.operators.sketch import merge_sketch_tables

    def leaf(df):
        return df.groupBy("region").agg(
            F.hll_sketch_agg(F.col("uid"), F.lit(12)).alias("__sk")
        )

    old, new = hier.where("id % 2 = 0"), hier.where("id % 2 = 1")
    merged = merge_sketch_tables(leaf(old), leaf(new), ["region"])
    got = {
        r["region"]: r["ndv"]
        for r in merged.select(
            "region", F.hll_sketch_estimate("__sk").alias("ndv")
        ).collect()
    }
    want = {
        r["region"]: r["ndv"]
        for r in leaf(hier).select(
            "region", F.hll_sketch_estimate("__sk").alias("ndv")
        ).collect()
    }
    assert got == want


# ------------------------------------------------------------ quantile rollup


@pytest.fixture(scope="module")
def qdata(spark):
    """60k rows, 3×4 hierarchy, group-shifted heavy-tailed values —
    coarser-level quantiles differ materially from any single leaf's."""
    return spark.range(60_000).select(
        F.expr("CAST(id % 3 AS STRING)").alias("region"),
        F.expr("CAST((id DIV 3) % 4 AS STRING)").alias("cls"),
        F.expr(
            "pow(pmod(hash(id), 10000) / 10000.0 + 0.001, 2) * 100"
            " + (id % 3) * 37 + ((id DIV 3) % 4) * 11"
        ).alias("v"),
    ).cache()


def _rank_of(df, keys_filter, value):
    f = df
    for c, val in keys_filter.items():
        f = f.where(F.col(c) == val)
    n = f.count()
    below = f.where(F.col("v") <= value).count()
    return below / n


def test_quantile_rollup_rank_error_bounded(spark, qdata):
    from cosmap_spark.operators.sketch import quantile_rollup

    rows = quantile_rollup(
        qdata, ["region", "cls"], "v", probs=(0.5, 0.9), grid=128
    ).collect()
    assert len(rows) == 16  # 12 leaves + 3 regions + 1 total
    tol = 0.03  # 1.5/grid + sketch accuracy, with slack
    for r in rows:
        filt = {
            c: r[c] for c in ("region", "cls") if r[c] is not None
        }
        for p, col in ((0.5, "p5"), (0.9, "p9")):
            rank = _rank_of(qdata, filt, r[col])
            assert abs(rank - p) <= tol, (r["level"], filt, p, rank)


def test_quantile_rollup_counts_and_nulls(spark, qdata):
    from cosmap_spark.operators.sketch import quantile_rollup

    rows = quantile_rollup(qdata, ["region", "cls"], "v").collect()
    total = [r for r in rows if r["level"] == "(all)"]
    assert len(total) == 1 and total[0]["n"] == 60_000
    assert total[0]["region"] is None and total[0]["cls"] is None
    region_rows = [r for r in rows if r["level"] == "region"]
    assert sorted(r["n"] for r in region_rows) == [20_000] * 3
    assert all(r["cls"] is None for r in region_rows)


def test_quantile_rollup_leaf_equals_direct_sketch(spark, qdata):
    """Leaf-level output is exactly the approx_percentile grid point —
    no merge error at depth 0."""
    from cosmap_spark.operators.sketch import quantile_rollup

    rows = quantile_rollup(
        qdata, ["region", "cls"], "v", probs=(0.5,), grid=101
    ).collect()
    leaf = {
        (r["region"], r["cls"]): r["p5"]
        for r in rows if r["level"] == "region,cls"
    }
    direct = {
        (r["region"], r["cls"]): r["d"]
        for r in qdata.groupBy("region", "cls")
        .agg(F.expr("approx_percentile(v, 0.5, 10000)").alias("d"))
        .collect()
    }
    assert leaf == direct


def test_quantile_rollup_validation(spark, qdata):
    from cosmap_spark.operators.sketch import quantile_rollup

    with pytest.raises(ValueError):
        quantile_rollup(qdata, ["region"], "v", grid=1)
    with pytest.raises(ValueError):
        quantile_rollup(qdata, ["region"], "v", probs=(0.0,))


# ------------------------------------------------------------- KMV


@pytest.fixture(scope="module")
def kmv_data(spark):
    """3000 ids in segment A, 3000 in B, overlapping on [1500, 3000):
    |A∩B| = 1500, |A∪B| = 4500, Jaccard = 1/3 — exactly."""
    a = spark.range(0, 3000).select(
        F.lit("A").alias("seg"), F.col("id").alias("uid")
    )
    b = spark.range(1500, 4500).select(
        F.lit("B").alias("seg"), F.col("id").alias("uid")
    )
    # duplicate every row once: DISTINCT semantics must dedup
    u = a.unionByName(b)
    return u.unionByName(u).cache()


def test_kmv_ndv_accuracy_and_exact_when_unsaturated(spark, kmv_data):
    from cosmap_spark.operators.sketch import kmv_rollup

    out = {
        (r["level"], r["seg"]): r["ndv"]
        for r in kmv_rollup(kmv_data, ["seg"], "uid", k=256).collect()
    }
    # saturated: 1/sqrt(k-2) ~ 6.3% std; assert 4 sigma
    for key, exact in [(("seg", "A"), 3000.0), (("seg", "B"), 3000.0),
                       (("(all)", None), 4500.0)]:
        assert abs(out[key] - exact) / exact < 0.25, (key, out[key])
    # unsaturated: fewer distincts than k -> EXACT count
    small = kmv_data.where(F.col("uid") < 100)
    got = kmv_rollup(small, ["seg"], "uid", k=256).collect()
    assert {(r["level"], r["seg"]): r["ndv"] for r in got}[("seg", "A")] == 100.0


def test_kmv_bit_stable_across_layouts_and_merge_orders(spark, kmv_data):
    """The KMV differentiator vs HLL (whose merged representation is
    order-dependent — the repo-wide invariant): the k minima of a set
    do not depend on partitioning or merge order, so estimates are
    asserted EQUAL, not within tolerance."""
    from cosmap_spark.operators.sketch import kmv_rollup

    base = sorted(map(tuple, kmv_rollup(
        kmv_data.repartition(1), ["seg"], "uid", k=64
    ).collect()))
    for nparts in (3, 17):
        again = sorted(map(tuple, kmv_rollup(
            kmv_data.repartition(nparts, "uid"), ["seg"], "uid", k=64
        ).collect()))
        assert again == base, nparts


def test_kmv_rollup_level_equals_direct_sketch(spark, kmv_data):
    """A rolled-up (all) level must BIT-EQUAL a direct one-level
    sketch of the same data — merge closure, exactly."""
    from cosmap_spark.operators.sketch import kmv_rollup

    rolled = {
        (r["level"], r["seg"]): r["ndv"]
        for r in kmv_rollup(kmv_data, ["seg"], "uid", k=128).collect()
    }
    flat = kmv_rollup(
        kmv_data.select(F.lit(1).alias("one"), "uid"), ["one"], "uid", k=128
    ).collect()
    direct = {r["level"]: r["ndv"] for r in flat}["one"]
    assert rolled[("(all)", None)] == direct


def test_kmv_jaccard_and_segment_overlap(spark, kmv_data):
    from cosmap_spark.operators.sketch import segment_overlap

    rows = segment_overlap(kmv_data, "seg", "uid", k=256).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["seg_a"], r["seg_b"]) == ("A", "B")
    # true Jaccard 1/3; indicator std ~ sqrt(p(1-p)/k) ~ 0.03
    assert abs(r["jaccard"] - 1 / 3) < 0.12, r
    assert abs(r["ndv_union"] - 4500) / 4500 < 0.25, r
    assert abs(r["ndv_inter"] - 1500) / 1500 < 0.40, r
    assert abs(r["ndv_a"] - 3000) / 3000 < 0.25, r


def test_segment_overlap_refuses_quadratic_blowup(spark):
    """The all-pairs theta join is contract-bounded: a segment
    cardinality above max_segments refuses loudly instead of silently
    planning an O(segments²) nested loop — and the guard's count runs
    on the checkpointed sketch leaf, so results under the bound are
    unchanged."""
    import pytest

    from cosmap_spark.operators.sketch import segment_overlap

    df = spark.createDataFrame(
        [(f"s{i:03d}", j) for i in range(40) for j in range(3)],
        "seg string, uid long",
    )
    with pytest.raises(ValueError, match="max_segments"):
        segment_overlap(df, "seg", "uid", k=16, max_segments=10)
    # explicit opt-in past the default still works
    out = segment_overlap(df, "seg", "uid", k=16, max_segments=40)
    assert out.count() == 40 * 39 // 2


def test_kmv_null_values_excluded(spark):
    from cosmap_spark.operators.sketch import kmv_rollup

    df = spark.createDataFrame(
        [("A", 1), ("A", None), ("A", 2), ("B", None)],
        "seg string, uid int",
    )
    out = {
        (r["level"], r["seg"]): r["ndv"]
        for r in kmv_rollup(df, ["seg"], "uid", k=16).collect()
    }
    assert out[("seg", "A")] == 2.0
    # B contributed only NULLs: no leaf row (COUNT DISTINCT = 0)
    assert ("seg", "B") not in out
    assert out[("(all)", None)] == 2.0


# -------------------------------------------------- mergeable MG


def test_mg_summary_merge_bound(spark):
    """merge_mg_tables(summary(A), summary(B)) keeps the mergeable-
    summaries guarantee over A ∪ B: the heavy key survives with
    true − N/(k+1) ≤ mg_count ≤ true, and the merged table stays ≤ k
    rows.  NULL keys are excluded from N and the counters."""
    from cosmap_spark.operators.sketch import merge_mg_tables, mg_summary

    rows = spark.range(9_000).select(
        F.when(F.col("id") % 3 == 0, F.lit(-1))
        .when(F.col("id") % 97 == 0, F.lit(None))
        .otherwise(F.col("id") % 150).alias("k")
    )
    a = rows.where(F.col("id") % 2 == 0)
    b = rows.where(F.col("id") % 2 == 1)
    sa, na = mg_summary(a, "k", k=16)
    sb, nb = mg_summary(b, "k", k=16)
    merged = merge_mg_tables(sa, sb, k=16).collect()
    n = na + nb
    assert n == rows.where(F.col("k").isNotNull()).count()
    got = {r["key"]: r["mg_count"] for r in merged}
    assert len(got) <= 16 and None not in got
    heavy_true = rows.where(F.col("k") == -1).count()
    assert heavy_true - n / 17 <= got[-1] <= heavy_true
