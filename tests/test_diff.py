"""Corpus diff: status correctness, column scoping, duplicate-key
loudness, delta-only default, and the hash-only join shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.diff import corpus_diff, diff_summary


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    # drop 0-9, change 10-19's text, change 20-24's lang only, add 100-114
    new = spark.createDataFrame(
        [
            (i, f"text {i} v2" if 10 <= i < 20 else f"text {i}",
             "de" if 20 <= i < 25 else "en")
            for i in range(10, 100)
        ]
        + [(i, f"new {i}", "en") for i in range(100, 115)],
        "doc_id long, text string, lang string",
    )
    return old.cache(), new.cache()


def test_statuses(spark, snapshots):
    old, new = snapshots
    got = {
        r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()
    }
    assert all(got[i] == "removed" for i in range(10))
    assert all(got[i] == "changed" for i in range(10, 25))
    assert all(got[i] == "added" for i in range(100, 115))
    assert 30 not in got  # unchanged excluded by default
    assert len(got) == 40
    summary = {
        r["status"]: r["n"]
        for r in diff_summary(
            corpus_diff(old, new, include_unchanged=True)
        ).collect()
    }
    assert summary == {
        "removed": 10, "changed": 15, "added": 15, "unchanged": 75,
    }


def test_compare_cols_scoping(spark, snapshots):
    old, new = snapshots
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, compare_cols=["text"]).collect()
    }
    # lang-only changes (20-24) are invisible when only text is compared
    assert all(got[i] == "changed" for i in range(10, 20))
    assert all(i not in got for i in range(20, 25))


def test_ignores_one_sided_columns(spark, snapshots):
    old, new = snapshots
    with_extra = new.withColumn("crawl_ts", F.lit("2026-08-14"))
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, with_extra).collect()
    }
    assert all(i not in got for i in range(25, 100))  # still unchanged


def test_duplicate_keys_raise(spark, snapshots):
    old, new = snapshots
    dup = new.unionByName(new.where(F.col("doc_id") == 50))
    with pytest.raises(Exception, match="duplicate"):
        corpus_diff(old, dup).collect()
    # check_unique=False skips the guard (documented escape hatch)
    corpus_diff(old, dup, check_unique=False).collect()


def test_no_payload_in_join(spark, snapshots):
    """The join carries (id, hash) only — no text/lang columns cross
    the exchange — and never degrades to a nested loop."""
    from cosmap_spark.operators.report import plan_summary

    old, new = snapshots
    df = corpus_diff(old, new)
    s = plan_summary(df)
    assert s["nested_loop_joins"] == 0 and s["cartesian_products"] == 0
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    import re

    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert joins and all(
        not re.search(r"\btext\b|\blang\b", ln) for ln in joins
    )


def test_validation(spark, snapshots):
    old, new = snapshots
    with pytest.raises(ValueError):
        corpus_diff(old.select("doc_id"), new.select("doc_id"))
    with pytest.raises(ValueError):
        corpus_diff(old, new, compare_cols=["ghost"])


def test_map_compare_cols_rejected(spark):
    """Map-typed compare columns have no canonical hash — refused
    loudly, the snapshot_cdc contract."""
    import pytest

    from cosmap_spark.operators.diff import corpus_diff

    df = spark.createDataFrame(
        [(1, {"a": "x"})], "doc_id long, m map<string,string>"
    )
    with pytest.raises(ValueError, match="map-typed"):
        corpus_diff(df, df)


def test_value_equality_nan_and_null(spark):
    """The content hash compares by Spark VALUE equality: NaN == NaN
    (a JSON-serialized hash would also have false-diffed on key order),
    and NULL is a value distinct from 0/''."""
    from cosmap_spark.operators.diff import corpus_diff

    nan = float("nan")
    old = spark.createDataFrame(
        [(1, nan, "t"), (2, 1.0, None), (3, 2.0, "u")],
        "doc_id long, x double, s string",
    )
    new = spark.createDataFrame(
        [(1, nan, "t"), (2, 1.0, ""), (3, 2.0, "u")],
        "doc_id long, x double, s string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed"}  # NULL -> '' is a change; NaN row is not


def test_snapshot_drift_matches_python_psi(spark):
    """PSI over exact decile boundaries: the operator must equal a
    pure-python reference bin-for-bin, every bin present, and the
    self-drift must be exactly zero."""
    import math

    import numpy as np

    from cosmap_spark.operators.diff import snapshot_drift

    rng = np.random.default_rng(12)
    a = [float(v) for v in rng.normal(0, 1, 400)]
    b = [float(v) for v in rng.normal(0.7, 1.2, 300)]
    old = spark.createDataFrame(
        [(i, v) for i, v in enumerate(a)], "k long, x double"
    )
    new = spark.createDataFrame(
        [(i, v) for i, v in enumerate(b)], "k long, x double"
    )
    got = {
        r["bin"]: (r["n_old"], r["n_new"], r["psi_term"])
        for r in snapshot_drift(old, new, ["x"]).collect()
    }
    # python reference: numpy linear-interpolated percentiles match
    # Spark's exact percentile definition
    bnds = np.percentile(np.array(a), [10 * i for i in range(1, 10)],
                         method="linear")
    def binv(x):
        return int(sum(1 for e in bnds if e < x))
    na, nb = [0] * 10, [0] * 10
    for v in a:
        na[binv(v)] += 1
    for v in b:
        nb[binv(v)] += 1
    eps = 1e-6
    assert set(got) == set(range(10))
    for i in range(10):
        pa, pb = max(na[i] / 400, eps), max(nb[i] / 300, eps)
        want = (pb - pa) * math.log(pb / pa)
        assert got[i][0] == na[i] and got[i][1] == nb[i], i
        assert abs(got[i][2] - want) < 1e-12, i
    # equal deciles on the old side by construction
    assert all(got[i][0] == 40 for i in range(10))
    # self-drift is exactly zero (identical shares, ln(1) == 0)
    self_psi = sum(
        r["psi_term"]
        for r in snapshot_drift(old, old, ["x"]).collect()
    )
    assert self_psi == 0.0


def test_snapshot_drift_validation_and_multicolumn(spark):
    import pytest

    from cosmap_spark.operators.diff import snapshot_drift

    old = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, 2.0, 6.0), (3, 3.0, 7.0)],
        "k long, x double, y double",
    )
    out = snapshot_drift(old, old, ["x", "y"], bins=2)
    assert sorted(set(r["column"] for r in out.collect())) == ["x", "y"]
    with pytest.raises(ValueError, match="bins"):
        snapshot_drift(old, old, ["x"], bins=1)
    empty = spark.createDataFrame([], "k long, x double, y double")
    with pytest.raises(ValueError, match="no non-null rows"):
        snapshot_drift(old, empty, ["x"])


def test_snapshot_drift_fixed_job_count(spark):
    """The restructure contract: driver-side job count at construction
    is CONSTANT in the number of columns (one old-side agg + one
    new-side agg), never per-column — a 20-feature monitor at 100 TB
    must not pay 20 serialized scans."""
    rows = [(i, float(i), float(i * 2), float(i % 7), float(i % 3))
            for i in range(200)]
    schema = "k long, a double, b double, c double, d double"
    old = spark.createDataFrame(rows, schema).localCheckpoint()
    new = spark.createDataFrame(rows[50:], schema).localCheckpoint()
    from cosmap_spark.operators.diff import snapshot_drift

    tracker = spark.sparkContext.statusTracker()

    def jobs(cols):
        before = len(tracker.getJobIdsForGroup(None))
        snapshot_drift(old, new, cols, bins=4)
        return len(tracker.getJobIdsForGroup(None)) - before

    j1 = jobs(["a"])
    j4 = jobs(["a", "b", "c", "d"])
    assert j1 == j4, f"construction jobs grew with columns: {j1} -> {j4}"


def test_snapshot_drift_rejects_non_numeric(spark):
    from cosmap_spark.operators.diff import snapshot_drift

    df = spark.createDataFrame([(1, "en")], "k long, lang string")
    with pytest.raises(ValueError, match="category_drift"):
        snapshot_drift(df, df, ["lang"])


def test_category_drift_matches_python_psi(spark):
    """Category PSI vs a pure-python reference: top-N selection by
    old-side count with (count desc, category asc) ties, OTHER
    folding, NULL as a category, new-only categories into OTHER."""
    import math
    from collections import Counter

    from cosmap_spark.operators.diff import category_drift

    cats_old = (["en"] * 40 + ["de"] * 25 + ["fr"] * 25 + ["es"] * 5
                + ["pt"] * 3 + [None] * 2)
    cats_new = (["en"] * 30 + ["de"] * 30 + ["zh"] * 20 + ["fr"] * 10
                + [None] * 10)
    old = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cats_old)], "k long, lang string"
    )
    new = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cats_new)], "k long, lang string"
    )
    top_n, eps = 3, 1e-6
    got = {
        r["category"]: (r["n_old"], r["n_new"], r["psi_term"])
        for r in category_drift(old, new, ["lang"], top_n=top_n).collect()
    }
    # python reference
    label = lambda v: "(null)" if v is None else v  # noqa: E731
    co = Counter(label(v) for v in cats_old)
    cn = Counter(label(v) for v in cats_new)
    sel = sorted(co, key=lambda c: (-co[c], c))[:top_n]
    fo, fn = Counter(), Counter()
    for cat in set(co) | set(cn):
        tgt = cat if cat in sel else "(other)"
        fo[tgt] += co.get(cat, 0)
        fn[tgt] += cn.get(cat, 0)
    ta, tb = sum(fo.values()), sum(fn.values())
    assert set(got) == set(fo)
    for cat in fo:
        pa, pb = max(fo[cat] / ta, eps), max(fn[cat] / tb, eps)
        want = (pb - pa) * math.log(pb / pa)
        assert got[cat][0] == fo[cat] and got[cat][1] == fn[cat], cat
        assert abs(got[cat][2] - want) < 1e-12, cat
    # zh (new-only) and es/pt/(null) (below top-3) folded into OTHER
    assert "(other)" in got and "zh" not in got and "es" not in got
    assert "(null)" not in got
    # with a wide top_n, NULL is a first-class category and drifted;
    # OTHER then carries only the new-only zh
    wide = {
        r["category"]: (r["n_old"], r["n_new"])
        for r in category_drift(old, new, ["lang"], top_n=6).collect()
    }
    assert wide["(null)"] == (2, 10)
    assert wide["(other)"] == (0, 20)  # zh only
    # self-drift exactly zero
    self_psi = sum(
        r["psi_term"]
        for r in category_drift(old, old, ["lang"], top_n=top_n).collect()
    )
    assert self_psi == 0.0


def test_category_drift_lazy_and_multicolumn(spark):
    """Construction runs ZERO driver jobs (no boundaries to collect),
    and multi-column stacking keys every row by its column."""
    from cosmap_spark.operators.diff import category_drift

    df = spark.createDataFrame(
        [(1, "en", True), (2, "de", False), (3, None, True)],
        "k long, lang string, flag boolean",
    ).localCheckpoint()
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    out = category_drift(df, df, ["lang", "flag"], top_n=5)
    assert len(tracker.getJobIdsForGroup(None)) == before, (
        "category_drift construction must not run driver jobs"
    )
    rows = out.collect()
    assert sorted(set(r["column"] for r in rows)) == ["flag", "lang"]
    flags = {r["category"] for r in rows if r["column"] == "flag"}
    assert flags == {"true", "false"}
    with pytest.raises(ValueError, match="top_n"):
        category_drift(df, df, ["lang"], top_n=0)
    arr = spark.createDataFrame([(1, [1, 2])], "k long, v array<int>")
    with pytest.raises(ValueError, match="scalar"):
        category_drift(arr, arr, ["v"])


def test_category_drift_empty_side_raises_on_collect(spark):
    import pyspark

    from cosmap_spark.operators.diff import category_drift

    full = spark.createDataFrame([(1, "en")], "k long, lang string")
    empty = spark.createDataFrame([], "k long, lang string")
    out = category_drift(full, empty, ["lang"])
    with pytest.raises(pyspark.errors.exceptions.base.PySparkException,
                       match="no distribution"):
        out.collect()


def test_heavy_hitter_frozen_categories_match_exact_topn(spark):
    """The unbounded-vocabulary path (round 9): on a heavy-tailed mix
    where every top-N category clears the MG guarantee,
    category_drift(frozen_categories=heavy_hitter_categories(old))
    is IDENTICAL to the exact top_n path — rows, counts, psi doubles —
    and its plan carries no vocabulary-sized selection window."""
    from cosmap_spark.operators.diff import (
        category_drift,
        heavy_hitter_categories,
    )

    # Zipf-ish: 5 heavy categories (hundreds of rows each) + a 400-key
    # singleton tail; NULLs a real share
    def mix(shift: int):
        head = [(f"h{j}",) for j in range(5) for _ in range(300 - 40 * j)]
        tail = [(f"t{(i + shift)}",) for i in range(400)]
        nulls = [(None,)] * 60
        return spark.createDataFrame(head + tail + nulls, "lang string")

    old, new = mix(0), mix(200)
    hh = heavy_hitter_categories(old, ["lang"], top_n=5, k=64)
    assert sorted(hh["lang"]) == [f"h{j}" for j in range(5)]

    key = lambda df: sorted(  # noqa: E731
        (r["column"], r["category"], r["n_old"], r["n_new"],
         r["p_old"], r["p_new"], r["psi_term"])
        for r in df.collect()
    )
    frozen = category_drift(old, new, ["lang"], frozen_categories=hh)
    exact = category_drift(old, new, ["lang"], top_n=5)
    assert key(frozen) == key(exact)

    # bounded state: the frozen plan folds BEFORE the aggregation, so
    # the vocabulary-sized row_number SELECTION window is gone (the
    # remaining windows are per-column totals over the BOUNDED folded
    # aggregate)
    plan = frozen._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan
    exact_plan = exact._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in exact_plan  # the contrast keeping this honest
    assert frozen.count() <= 5 + 2  # frozen + other + (null in other)


def test_chi2_frozen_categories_matches_prefolded(spark):
    """chi2_test(frozen_categories=) equals chi2_test over manually
    pre-folded inputs (identity for frozen, other for the rest), and
    dof is bounded by the selection."""
    from cosmap_spark.operators.stats_tests import chi2_test

    def mk(shift):
        rows = [(f"h{j % 3}",) for j in range(90)] + [
            (f"t{(i + shift)}",) for i in range(40)
        ]
        return spark.createDataFrame(rows, "lang string")

    old, new = mk(0), mk(20)
    frozen = {"lang": ["h0", "h1", "h2"]}
    got = chi2_test(old, new, ["lang"], frozen_categories=frozen) \
        .collect()[0]

    fold = F.when(F.col("lang").isin(*frozen["lang"]), F.col("lang")) \
        .otherwise(F.lit("(other)"))
    want = chi2_test(old.select(fold.alias("lang")),
                     new.select(fold.alias("lang")), ["lang"]).collect()[0]
    assert (got["chi2_units"], got["k"], got["dof"]) == (
        want["chi2_units"], want["k"], want["dof"])
    assert got["k"] <= 4


def test_frozen_categories_guards(spark):
    from cosmap_spark.operators.diff import category_drift
    from cosmap_spark.operators.stats_tests import chi2_test

    df = spark.createDataFrame([("a",)], "lang string")
    with pytest.raises(ValueError, match="non-empty selection"):
        category_drift(df, df, ["lang"], frozen_categories={"lang": []})
    with pytest.raises(ValueError, match="must not collide"):
        chi2_test(df, df, ["lang"],
                  frozen_categories={"lang": ["(other)"]})


def test_frozen_categories_non_string_values(spark):
    """Round-9 review finding 1 (reproduced live): python str() is NOT
    Spark's cast — str(True)='True' vs Spark 'true' silently folded
    every boolean row into OTHER and masked all drift.  Canonicalized
    bool/int frozen values must detect a planted boolean shift; floats
    refuse (no shared canonical rendering — the CLAUDE.md
    double→varchar trap)."""
    from cosmap_spark.operators.diff import category_drift

    old = spark.createDataFrame([(True,)] * 30 + [(False,)] * 10,
                                "flag boolean")
    new = spark.createDataFrame([(True,)] * 10 + [(False,)] * 30,
                                "flag boolean")
    rows = {r["category"]: (r["n_old"], r["n_new"])
            for r in category_drift(
                old, new, ["flag"],
                frozen_categories={"flag": [True, False]}).collect()}
    assert rows == {"true": (30, 10), "false": (10, 30)}  # NOT (other)

    iold = spark.createDataFrame([(1,)] * 20 + [(2,)] * 20, "k int")
    inew = spark.createDataFrame([(1,)] * 30 + [(2,)] * 10, "k int")
    irows = {r["category"] for r in category_drift(
        iold, inew, ["k"], frozen_categories={"k": [1, 2]}).collect()}
    assert irows == {"1", "2"}

    with pytest.raises(ValueError, match="canonical string"):
        category_drift(old, new, ["flag"],
                       frozen_categories={"flag": [1.5]})
