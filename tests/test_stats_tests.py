"""Two-sample tests (operators/stats_tests.py): pure-python
differentials for the KS statistic and Welch's t, exactness across
layouts, and degenerate contracts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.stats_tests import ks_test, welch_ttest


def _py_ks(a, b, dp=6):
    qa = sorted(round(v * 10**dp) for v in a)
    qb = sorted(round(v * 10**dp) for v in b)
    vals = sorted(set(qa) | set(qb))
    best = 0
    for v in vals:
        co = sum(1 for x in qa if x <= v)
        cn = sum(1 for x in qb if x <= v)
        best = max(best, abs(co * len(qb) - cn * len(qa)))
    return best


def test_ks_matches_python_and_is_exact(spark):
    import numpy as np

    rng = np.random.default_rng(31)
    a = [float(v) for v in rng.normal(0, 1, 300)]
    b = [float(v) for v in rng.normal(0.4, 1.3, 240)]
    old = spark.createDataFrame([(i, v) for i, v in enumerate(a)],
                                "k long, x double")
    new = spark.createDataFrame([(i, v) for i, v in enumerate(b)],
                                "k long, x double")
    for layout in (old, old.repartition(13)):
        r = ks_test(layout, new, ["x"]).collect()[0]
        dnum = _py_ks(a, b)
        assert (r["n_old"], r["n_new"], r["d_num"]) == (300, 240, dnum)
        d = dnum / (300 * 240)
        assert r["d_stat"] == round(d, 6)
        assert r["lambda_stat"] == round(
            d * math.sqrt(300 * 240 / 540), 6
        )
    # identical samples: D exactly zero
    z = ks_test(old, old, ["x"]).collect()[0]
    assert z["d_num"] == 0 and z["d_stat"] == 0.0
    # multi-column stacking + empty-side raise
    two = old.withColumn("y", F.col("x") * 2)
    rows = {r["column"]: r["d_num"]
            for r in ks_test(two, two, ["x", "y"]).collect()}
    assert rows == {"x": 0, "y": 0}
    empty = spark.createDataFrame([], "k long, x double")
    import pyspark

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException,
                       match="no non-null rows"):
        ks_test(old, empty, ["x"]).collect()


def test_welch_matches_python(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    arms = {
        "ctl": [float(v) for v in rng.normal(10, 2, 150)],
        "trt": [float(v) for v in rng.normal(10.6, 3, 120)],
        "t2": [float(v) for v in rng.normal(9.0, 1, 80)],
    }
    df = spark.createDataFrame(
        [(g, v) for g, vals in arms.items() for v in vals],
        "variant string, value double",
    )
    got = {
        (r["variant_a"], r["variant_b"]): r
        for r in welch_ttest(df, "variant", "value").collect()
    }
    assert set(got) == {("ctl", "t2"), ("ctl", "trt"), ("t2", "trt")}

    def py_welch(xs, ys, dp=6):
        qx = [round(v * 10**dp) for v in xs]
        qy = [round(v * 10**dp) for v in ys]
        sc = 10.0**dp

        def mv(q):
            n, s, ss = len(q), float(sum(q)), float(sum(v * v for v in q))
            mean = s / n / sc
            var = (ss - s * s / n) / (n - 1.0) / (sc * sc)
            return n, mean, var

        na, ma, va = mv(qx)
        nb, mb, vb = mv(qy)
        sa, sb = va / na, vb / nb
        t = (ma - mb) / math.sqrt(sa + sb)
        dof = (sa + sb) ** 2 / (sa * sa / (na - 1) + sb * sb / (nb - 1))
        return na, nb, round(ma, 6), round(mb, 6), round(t, 6), round(dof, 6)

    for (ga, gb), r in got.items():
        na, nb, ma, mb, t, dof = py_welch(arms[ga], arms[gb])
        assert (r["n_a"], r["n_b"]) == (na, nb), (ga, gb)
        assert (r["mean_a"], r["mean_b"]) == (ma, mb), (ga, gb)
        assert abs(r["t_stat"] - t) < 1e-9 and abs(r["dof"] - dof) < 1e-6
    # a clearly-shifted pair is significant, layout-independent
    assert abs(got[("ctl", "t2")]["t_stat"]) > 3
    again = {
        (r["variant_a"], r["variant_b"]): r["t_stat"]
        for r in welch_ttest(df.repartition(11), "variant", "value").collect()
    }
    assert again == {k: r["t_stat"] for k, r in got.items()}


def test_welch_degenerate_singleton_arm(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "variant string, value double"
    )
    r = welch_ttest(df, "variant", "value").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 1)
    assert r["t_stat"] is None and r["dof"] is None  # undefined variance
    empty = spark.createDataFrame([], "variant string, value double")
    assert welch_ttest(empty, "variant", "value").count() == 0


def test_welch_zero_pooled_variance_yields_null(spark):
    """Two constant arms (n >= 2 each): t and dof are UNDEFINED and
    must surface as NULL, not an ANSI DIVIDE_BY_ZERO abort — the
    cross-engine twin of DuckDB's divide-by-zero NULL (review fix)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "variant string, value double",
    )
    r = welch_ttest(df, "variant", "value").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert (r["mean_a"], r["mean_b"]) == (1.0, 2.0)
    assert r["t_stat"] is None and r["dof"] is None
    # one constant arm, one varying: still defined
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 4.0)],
        "variant string, value double",
    )
    r2 = welch_ttest(df2, "variant", "value").collect()[0]
    assert r2["t_stat"] is not None


def test_ks_rejects_non_numeric_and_covers_all_null_column(spark):
    """Review fixes: a string column refuses with a pointer to
    category_drift BEFORE any job; a column all-NULL on BOTH sides
    still surfaces (and raises) instead of silently vanishing."""
    import pyspark

    s = spark.createDataFrame([(1, "en")], "k long, lang string")
    with pytest.raises(ValueError, match="category_drift"):
        ks_test(s, s, ["lang"])
    df = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "x double, y double"
    )
    with pytest.raises(pyspark.errors.exceptions.base.PySparkException,
                       match="no non-null rows"):
        ks_test(df, df, ["x", "y"]).collect()


def test_mann_whitney_matches_python(spark):
    """MWU vs a pure-python midrank reference: exact doubled-U, the
    tie-corrected z, heavy-tie data, layout independence, all-ties
    NULL z, and the empty-side raise."""
    import numpy as np

    from cosmap_spark.operators.stats_tests import mann_whitney_u

    rng = np.random.default_rng(11)
    # heavy ties: integer-ish values
    a = [float(v) for v in rng.integers(0, 12, 180)]
    b = [float(v) for v in rng.integers(2, 14, 150)]
    old = spark.createDataFrame([(i, v) for i, v in enumerate(a)],
                                "k long, x double")
    new = spark.createDataFrame([(i, v) for i, v in enumerate(b)],
                                "k long, x double")

    def py_mwu(xs, ys, dp=6):
        qx = [round(v * 10**dp) for v in xs]
        qy = [round(v * 10**dp) for v in ys]
        allv = sorted(qx + qy)
        # midranks
        from collections import Counter
        cnt = Counter(allv)
        rank = {}
        seen = 0
        for v in sorted(cnt):
            rank[v] = seen + (cnt[v] + 1) / 2.0
            seen += cnt[v]
        n, m = len(qx), len(qy)
        big = n + m
        r = sum(rank[v] for v in qx)
        u = r - n * (n + 1) / 2.0
        tie = sum(c**3 - c for c in cnt.values())
        var = n * m / 12.0 * ((big + 1) - tie / (big * (big - 1)))
        z = (u - n * m / 2.0) / math.sqrt(var) if var > 0 else None
        return u, z

    for layout in (old, old.repartition(9)):
        r = mann_whitney_u(layout, new, ["x"]).collect()[0]
        u, z = py_mwu(a, b)
        assert (r["n_old"], r["n_new"]) == (180, 150)
        assert r["u2x"] == round(2 * u) and r["u_stat"] == u
        assert abs(r["z_stat"] - round(z, 6)) < 1e-9
    # all-ties: z undefined -> NULL; u well-defined
    c1 = spark.createDataFrame([(i, 5.0) for i in range(4)], "k long, x double")
    c2 = spark.createDataFrame([(i, 5.0) for i in range(6)], "k long, x double")
    rc = mann_whitney_u(c1, c2, ["x"]).collect()[0]
    assert rc["z_stat"] is None and rc["u_stat"] == 4 * 6 / 2.0
    # symmetry sanity: identical samples give z = 0
    rs = mann_whitney_u(old, old, ["x"]).collect()[0]
    assert rs["z_stat"] == 0.0
    import pyspark

    empty = spark.createDataFrame([], "k long, x double")
    with pytest.raises(pyspark.errors.exceptions.base.PySparkException,
                       match="no non-null rows"):
        mann_whitney_u(old, empty, ["x"]).collect()
    with pytest.raises(ValueError, match="not numeric"):
        mann_whitney_u(
            spark.createDataFrame([(1, "a")], "k long, x string"),
            spark.createDataFrame([(1, "a")], "k long, x string"), ["x"])


def test_proportion_ztest_matches_python(spark):
    """Two-proportion z vs a hand formula, boolean AND 0/1 inputs,
    degenerate pooled rates -> NULL z, layout independence."""
    from cosmap_spark.operators.stats_tests import proportion_ztest

    rows = (
        [("a", 1)] * 120 + [("a", 0)] * 380
        + [("b", 1)] * 175 + [("b", 0)] * 325
        + [("c", 0)] * 50                       # zero conversions
    )
    df = spark.createDataFrame(rows, "variant string, ok int")
    got = {
        (r["variant_a"], r["variant_b"]): r
        for r in proportion_ztest(df, "variant", "ok").collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    def py_z(na, xa, nb, xb):
        pa, pb = xa / na, xb / nb
        pool = (xa + xb) / (na + nb)
        var = pool * (1 - pool) * (1 / na + 1 / nb)
        return round((pa - pb) / math.sqrt(var), 6) if var > 0 else None

    r = got[("a", "b")]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (500, 120, 500, 175)
    assert r["rate_a"] == 0.24 and r["rate_b"] == 0.35
    assert abs(r["z_stat"] - py_z(500, 120, 500, 175)) < 1e-9
    assert got[("a", "c")]["z_stat"] == py_z(500, 120, 50, 0)
    # boolean input and repartition agree
    bdf = df.select("variant", (F.col("ok") == 1).alias("ok")).repartition(7)
    again = {
        (r["variant_a"], r["variant_b"]): r["z_stat"]
        for r in proportion_ztest(bdf, "variant", "ok").collect()
    }
    assert again == {k: v["z_stat"] for k, v in got.items()}
    # both arms all-failures: pooled rate 0 -> NULL z
    deg = spark.createDataFrame(
        [("a", 0)] * 5 + [("b", 0)] * 5, "variant string, ok int"
    )
    rd = proportion_ztest(deg, "variant", "ok").collect()[0]
    assert rd["z_stat"] is None and rd["rate_a"] == 0.0
    assert proportion_ztest(
        spark.createDataFrame([], "variant string, ok int"), "variant", "ok"
    ).count() == 0


def test_proportion_ztest_rejects_non_binary(spark):
    """The 'boolean or 0/1 numeric' contract is enforced (round-8
    advisory): a numeric success column holding 2 must raise instead
    of silently inflating the success count."""
    import pytest

    from cosmap_spark.operators.stats_tests import proportion_ztest

    bad = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 0)], "variant string, ok int"
    )
    with pytest.raises(Exception, match="must be boolean or 0/1"):
        proportion_ztest(bad, variant_col="variant",
                         success_col="ok").collect()

    # a fractional DOUBLE would truncate to 0/1 via cast('int') and
    # slip past a post-cast check (round-9 advisory): the raw-value
    # round-trip guard must also raise on 0.5 / 1.9
    frac = spark.createDataFrame(
        [("a", 1.0), ("a", 0.5), ("b", 0.0)],
        "variant string, ok double",
    )
    with pytest.raises(Exception, match="must be boolean or 0/1"):
        proportion_ztest(frac, variant_col="variant",
                         success_col="ok").collect()
    frac2 = spark.createDataFrame(
        [("a", 1.9), ("a", 0.0), ("b", 1.0)],
        "variant string, ok double",
    )
    with pytest.raises(Exception, match="must be boolean or 0/1"):
        proportion_ztest(frac2, variant_col="variant",
                         success_col="ok").collect()
    # clean doubles and booleans still pass the round-trip guard
    okd = spark.createDataFrame(
        [("a", 1.0), ("a", 0.0), ("b", 1.0), ("b", 0.0)],
        "variant string, ok double",
    )
    row = proportion_ztest(okd, "variant", "ok").collect()[0]
    assert row["n_a"] == 2 and row["x_a"] == 1


def test_mann_whitney_u_accumulates_rank_sum_in_decimal(spark):
    """r2x ~ 2·n_old·N overflows a LONG near ~1.5e9 rows per side —
    below ks_test's documented ~3e9 guard; pin the decimal
    accumulator so the rank-sum test stays alive as long as its
    sibling."""
    from cosmap_spark.operators.stats_tests import mann_whitney_u

    old = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    new = spark.createDataFrame([(2.0,), (3.0,)], "x double")
    out = mann_whitney_u(old, new, ["x"])
    u2x_type = dict(out.dtypes)["u2x"]
    assert u2x_type.startswith("decimal(38"), u2x_type


def test_chi2_test_matches_python(spark):
    """chi2_test vs an independent pure-python Pearson chi-squared over
    the same 2xk table, including the two-stage integer-division
    definition, a planted-shift positive control, and a no-shift
    negative control."""
    from collections import Counter

    from cosmap_spark.operators.stats_tests import chi2_test

    o_list = ["a"] * 50 + ["b"] * 30 + ["c"] * 20 + [None] * 10
    n_list = ["a"] * 30 + ["b"] * 45 + ["c"] * 20 + [None] * 15
    old = spark.createDataFrame([(x,) for x in o_list], "cat string")
    new = spark.createDataFrame([(x,) for x in n_list], "cat string")
    row = chi2_test(old, new, ["cat"]).collect()[0]

    o = Counter(x if x is not None else "(null)" for x in o_list)
    n = Counter(x if x is not None else "(null)" for x in n_list)
    cats = set(o) | set(n)
    ta, tb = sum(o.values()), sum(n.values())
    big_n = ta + tb
    ref = sum(
        (obs - (o.get(c, 0) + n.get(c, 0)) * tot / big_n) ** 2
        / ((o.get(c, 0) + n.get(c, 0)) * tot / big_n)
        for c in cats for obs, tot in ((o.get(c, 0), ta), (n.get(c, 0), tb))
    )
    two_stage = sum(
        (((o.get(c, 0) * tb - n.get(c, 0) * ta) ** 2
          // (o.get(c, 0) + n.get(c, 0))) * 10 ** 8) // (ta * tb)
        for c in cats
    )
    assert row["chi2_units"] == two_stage
    assert abs(row["chi2"] - ref) < 1e-4  # quantization bound
    assert row["k"] == 4 and row["dof"] == 3
    assert (row["n_old"], row["n_new"]) == (ta, tb)
    # positive control: a planted shift alarms well past the 5%
    # critical value for dof=3 (~7.81)
    assert row["chi2"] > 7.81
    # negative control: identical distributions -> chi2 ~ 0
    same = chi2_test(old, old, ["cat"]).collect()[0]
    assert same["chi2"] == 0.0


def test_chi2_test_degenerate_refuses(spark):
    """An empty side or a single observed category has no test."""
    import pytest

    from cosmap_spark.operators.stats_tests import chi2_test

    old = spark.createDataFrame([("a",), ("b",)], "cat string")
    empty = spark.createDataFrame([], "cat string")
    with pytest.raises(Exception, match="no distribution"):
        chi2_test(old, empty, ["cat"]).collect()
    mono = spark.createDataFrame([("a",)], "cat string")
    with pytest.raises(Exception, match="no distribution"):
        chi2_test(mono, mono, ["cat"]).collect()
    with pytest.raises(ValueError, match="scalar"):
        chi2_test(
            spark.createDataFrame([([1],)], "cat array<int>"),
            spark.createDataFrame([([1],)], "cat array<int>"),
            ["cat"],
        )
    # other_label == null_label would silently merge the OTHER fold
    # into the null bucket (round-10 advice fix, centralized in
    # diff._check_frozen so every frozen consumer gets it)
    with pytest.raises(ValueError, match="must differ"):
        chi2_test(old, old.union(old), ["cat"],
                  null_label="(x)", other_label="(x)")
    with pytest.raises(ValueError, match="must differ"):
        chi2_test(old, old.union(old), ["cat"],
                  null_label="(x)", other_label="(x)",
                  frozen_categories={"cat": ["a"]})


def test_decide_pvalues_match_python_references(spark):
    """The decision surface's asymptotic p-values vs independent
    pure-python references: math.erfc for the normal family (exact to
    the erfc), the same published series/transforms re-implemented in
    python for KS/chi2/t, plus known critical-value spot checks."""
    import math

    from cosmap_spark.operators.stats_tests import (
        chi2_test, decide, ks_test, mann_whitney_u, proportion_ztest,
        welch_ttest,
    )

    def norm_p(z):
        return math.erfc(abs(z) / math.sqrt(2.0))

    old = spark.createDataFrame(
        [(float(i % 97),) for i in range(400)], "x double"
    )
    new = spark.createDataFrame(
        [(float((i * 7) % 97) + 8.0,) for i in range(350)], "x double"
    )

    ks = decide(ks_test(old, new, ["x"]), "ks").collect()[0]
    lam = ks["lambda_stat"]
    ks_ref = max(0.0, min(1.0, sum(
        2.0 * (-1) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        for j in range(1, 9)
    )))
    assert abs(ks["p_value"] - ks_ref) < 1e-6
    assert ks["significant"] == (ks["p_value"] < 0.05)

    mwu = decide(mann_whitney_u(old, new, ["x"]), "mwu").collect()[0]
    assert abs(mwu["p_value"] - norm_p(mwu["z_stat"])) < 1e-6

    arms = spark.createDataFrame(
        [("a", float(i % 13)) for i in range(300)]
        + [("b", float(i % 13) + 1.5) for i in range(280)],
        "variant string, value double",
    )
    wl = decide(welch_ttest(arms, "variant", "value"), "welch").collect()[0]
    nu, t = wl["dof"], wl["t_stat"]
    z = t * (1.0 - 1.0 / (4.0 * nu)) / math.sqrt(1.0 + t * t / (2.0 * nu))
    assert abs(wl["p_value"] - norm_p(z)) < 1e-6
    assert wl["significant"] is True  # planted +1.5 shift

    conv = spark.createDataFrame(
        [("a", 1)] * 60 + [("a", 0)] * 40 + [("b", 1)] * 45
        + [("b", 0)] * 55,
        "variant string, ok int",
    )
    pr = decide(proportion_ztest(conv, "variant", "ok"), "prop").collect()[0]
    assert abs(pr["p_value"] - norm_p(pr["z_stat"])) < 1e-6

    co = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "cat string")
    cn = spark.createDataFrame([("a",)] * 80 + [("b",)] * 20, "cat string")
    ch = decide(chi2_test(co, cn, ["cat"]), "chi2").collect()[0]
    x, dof = ch["chi2"], float(ch["dof"])
    m = 1.0 - 2.0 / (9.0 * dof)
    s = math.sqrt(2.0 / (9.0 * dof))
    zwh = ((x / dof) ** (1.0 / 3.0) - m) / s
    # one-sided survival: P(Z > zwh); norm_p is two-sided on |z|, so
    # the zwh < 0 branch is the complement (parenthesized — the old
    # `abs(a - b if cond else c)` form degenerated to a vacuous
    # `abs(p_value) < 1e-2` on the negative branch)
    ref = (norm_p(zwh) / 2.0 if zwh >= 0
           else 1.0 - norm_p(zwh) / 2.0)
    assert abs(ch["p_value"] - ref) < 1e-2
    assert ch["significant"] is True  # planted categorical shift

    # known critical values: the 5% thresholds land at p ~ 0.05
    # KS lambda = 1.358, z = 1.96, chi2(1) = 3.841
    probe = spark.createDataFrame(
        [("c", 1, 1, 0, 0.0, 1.358)],
        "column string, n_old long, n_new long, d_num long, "
        "d_stat double, lambda_stat double",
    )
    p = decide(probe, "ks").collect()[0]["p_value"]
    assert abs(p - 0.05) < 0.002

    # small-lambda regime: the 8-term series does not converge below
    # λ ≈ 0.3 (undershoots Q ≈ 1 by up to ~0.4 near λ = 0.1), so
    # _ks_sf short-circuits to exactly 1.0 there (round-9 advisory)
    small = spark.createDataFrame(
        [("c", 1, 1, 0, 0.0, 0.15)],
        "column string, n_old long, n_new long, d_num long, "
        "d_stat double, lambda_stat double",
    )
    assert decide(small, "ks").collect()[0]["p_value"] == 1.0

    # degenerate statistic -> NULL p, NULL verdict (cannot decide)
    degen = spark.createDataFrame(
        [("c", 1, 1, 0, 0.0, None)],
        "column string, n_old long, n_new long, u2x long, "
        "u_stat double, z_stat double",
    )
    row = decide(degen, "mwu").collect()[0]
    assert row["p_value"] is None and row["significant"] is None


def test_chi2_two_stage_matches_python_property(spark):
    """Property test: on random small 2xk category tables, chi2_test's
    integer chi2_units equals the pure-python two-stage replay exactly
    (ties, zero cells on one side, single-category-heavy shapes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cosmap_spark.operators.stats_tests import chi2_test

    cats = ["a", "b", "c", "d"]

    @given(
        old_counts=st.lists(
            st.integers(0, 30), min_size=4, max_size=4
        ),
        new_counts=st.lists(
            st.integers(0, 30), min_size=4, max_size=4
        ),
    )
    @settings(max_examples=12, deadline=None)
    def prop(old_counts, new_counts):
        # need 2+ observed categories and both sides non-empty
        observed = [
            i for i in range(4) if old_counts[i] + new_counts[i] > 0
        ]
        if len(observed) < 2 or sum(old_counts) == 0 or sum(new_counts) == 0:
            return
        o_rows = [(cats[i],) for i in range(4) for _ in range(old_counts[i])]
        n_rows = [(cats[i],) for i in range(4) for _ in range(new_counts[i])]
        old = spark.createDataFrame(o_rows, "cat string")
        new = spark.createDataFrame(n_rows, "cat string")
        row = chi2_test(old, new, ["cat"]).collect()[0]
        ta, tb = sum(old_counts), sum(new_counts)
        want = sum(
            (((old_counts[i] * tb - new_counts[i] * ta) ** 2
              // (old_counts[i] + new_counts[i])) * 10 ** 8) // (ta * tb)
            for i in observed
        )
        assert row["chi2_units"] == want
        assert row["k"] == len(observed)

    prop()
