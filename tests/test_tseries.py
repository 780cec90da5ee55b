"""Subsequence search: exact differential vs a numpy brute force,
segment-boundary (halo) coverage, partition-layout independence, flat
window determinism, and the bounded-exchange plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.tseries import _znorm, subsequence_search

QUERY = [0.0, 1.0, 3.0, 1.0, 0.0]


def _brute(pdf: pd.DataFrame, query, *, znorm=True, key="k", order="t", val="v"):
    """All (key, start, dist) windows, 1-based starts, full precision."""
    m = len(query)
    q = np.asarray(query, dtype=np.float64)
    qz = _znorm(q) if znorm else q
    out = []
    for kk, g in pdf.groupby(key):
        vals = g.sort_values(order)[val].to_numpy(dtype=np.float64)
        for s in range(len(vals) - m + 1):
            w = vals[s : s + m]
            z = _znorm(w) if znorm else w
            out.append((kk, s + 1, float(np.sqrt(((z - qz) ** 2).sum()))))
    return out


def _topk(rows, k):
    return sorted(rows, key=lambda r: (r[2], r[0], r[1]))[:k]


@pytest.fixture(scope="module")
def serial(spark):
    """3 keys × ~120 points of a deterministic wiggly series, with a
    planted near-copy of QUERY inside key 1."""
    rng = np.random.default_rng(7)
    rows = []
    for kk in range(3):
        vals = np.cumsum(rng.normal(0, 1, 120)) + 10 * kk
        if kk == 1:
            vals[40:45] = np.array(QUERY) * 2.5 + 7.0  # same z-shape
        rows += [(kk, t, float(v)) for t, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k long, t long, v double").cache()


def _collect(df):
    return [(r["k"], r["start"], r["dist"]) for r in df.collect()]


def test_matches_bruteforce_topk(spark, serial):
    got = _collect(
        subsequence_search(
            serial, QUERY, key_col="k", order_col="t", val_col="v", k=7
        )
    )
    want = _topk(_brute(serial.toPandas(), QUERY), 7)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    np.testing.assert_allclose(
        [g[2] for g in got], [w[2] for w in want], rtol=1e-9
    )
    # the planted z-shaped copy wins with distance ~0
    assert got[0][0] == 1 and got[0][1] == 41 and got[0][2] < 1e-6


def test_halo_covers_segment_boundaries(spark, serial):
    """segment barely above m forces nearly every window to cross a
    boundary; results must equal the unsegmented answer exactly."""
    a = _collect(
        subsequence_search(
            serial, QUERY, key_col="k", order_col="t", val_col="v",
            k=20, segment=6,
        )
    )
    b = _collect(
        subsequence_search(
            serial, QUERY, key_col="k", order_col="t", val_col="v",
            k=20, segment=4096,
        )
    )
    assert a == b


def test_partition_layout_independent(spark, serial):
    base = _collect(
        subsequence_search(
            serial, QUERY, key_col="k", order_col="t", val_col="v", k=10
        )
    )
    for parts in (1, 13):
        got = _collect(
            subsequence_search(
                serial.repartition(parts), QUERY,
                key_col="k", order_col="t", val_col="v", k=10,
            )
        )
        assert got == base, parts


def test_per_key_topk(spark, serial):
    got = _collect(
        subsequence_search(
            serial, QUERY, key_col="k", order_col="t", val_col="v",
            k=3, per_key=True,
        )
    )
    assert len(got) == 9  # 3 per key
    want = _brute(serial.toPandas(), QUERY)
    for kk in range(3):
        w = _topk([r for r in want if r[0] == kk], 3)
        g = sorted(
            [r for r in got if r[0] == kk], key=lambda r: (r[2], r[1])
        )
        assert [(x[0], x[1]) for x in g] == [(x[0], x[1]) for x in w]


def test_plain_euclidean(spark, serial):
    got = _collect(
        subsequence_search(
            serial, QUERY, key_col="k", order_col="t", val_col="v",
            k=5, znorm=False,
        )
    )
    want = _topk(_brute(serial.toPandas(), QUERY, znorm=False), 5)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]


def test_flat_windows_deterministic(spark):
    """σ≈0 windows z-normalize to the zero vector: distance is √m to
    any z-normalized query, and results don't depend on layout."""
    df = spark.createDataFrame(
        [(0, t, 5.0) for t in range(20)], "k long, t long, v double"
    )
    got = _collect(
        subsequence_search(df, QUERY, key_col="k", order_col="t",
                           val_col="v", k=3)
    )
    assert [r[1] for r in got] == [1, 2, 3]
    for r in got:
        assert r[2] == pytest.approx(np.sqrt(len(QUERY)))


def test_short_series_and_validation(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0)], "k long, t long, v double"
    )
    assert (
        subsequence_search(df, QUERY, key_col="k", order_col="t",
                           val_col="v").count() == 0
    )
    with pytest.raises(ValueError):
        subsequence_search(df, [1.0], key_col="k", order_col="t", val_col="v")
    with pytest.raises(ValueError):
        subsequence_search(df, QUERY, key_col="k", order_col="t",
                           val_col="v", segment=3)


def test_plan_bounded(spark, serial):
    """One corpus exchange (the key/order sort), Arrow-only Python, and
    a TakeOrderedAndProject global winner."""
    from cosmap_spark.operators.report import plan_summary

    df = subsequence_search(
        serial, QUERY, key_col="k", order_col="t", val_col="v", k=5
    )
    s = plan_summary(df)
    assert s["python_evals"] == 0
    assert s["cartesian_products"] == 0 and s["nested_loop_joins"] == 0
    assert s["arrow_evals"] >= 1  # the subsequence kernel
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_multi_matches_single_per_pattern(spark, serial):
    """One shared corpus pipeline over P patterns must return exactly
    what P independent single-pattern searches return."""
    from cosmap_spark.operators.tseries import subsequence_search_multi

    ramp = [0.0, 1.0, 2.0, 3.0, 4.0]
    multi = subsequence_search_multi(
        serial, [QUERY, ramp], key_col="k", order_col="t", val_col="v", k=6
    ).collect()
    for qid, pat in ((0, QUERY), (1, ramp)):
        got = [
            (r["k"], r["start"], r["dist"]) for r in multi if r["qid"] == qid
        ]
        want = _collect(
            subsequence_search(
                serial, pat, key_col="k", order_col="t", val_col="v", k=6
            )
        )
        assert got == want, qid


def test_multi_length_validation(spark, serial):
    from cosmap_spark.operators.tseries import subsequence_search_multi

    with pytest.raises(ValueError):
        subsequence_search_multi(
            serial, [QUERY, [1.0, 2.0]], key_col="k", order_col="t",
            val_col="v",
        )
    with pytest.raises(ValueError):
        subsequence_search_multi(
            serial, [], key_col="k", order_col="t", val_col="v"
        )


def test_string_keys(spark):
    """np.lexsort over the key column must handle non-numeric keys."""
    rows = [
        (f"u{kk}", t, float(np.sin(t / 3.0) + kk)) for kk in range(4)
        for t in range(30)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = _collect(
        subsequence_search(df, QUERY, key_col="k", order_col="t",
                           val_col="v", k=6)
    )
    want = _topk(_brute(df.toPandas(), QUERY), 6)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    per = subsequence_search(df, QUERY, key_col="k", order_col="t",
                             val_col="v", k=2, per_key=True)
    assert per.count() == 8


def test_grouped_trend_differential_and_edges(spark):
    """DuckDB differential on random data with NULLs on both sides and
    a constant-x group (NULL slope in every SQL engine)."""
    import random

    import duckdb

    rng = random.Random(11)
    rows = []
    for g in range(5):
        for i in range(200):
            x = None if rng.random() < 0.05 else rng.uniform(0, 10)
            y = (
                None
                if rng.random() < 0.05
                else (2.5 * (x or 0) + g + rng.gauss(0, 1))
            )
            rows.append((g, x, y))
    rows += [(99, 7.0, float(v)) for v in range(10)]  # constant x
    df = spark.createDataFrame(rows, "g long, x double, y double")

    from cosmap_spark.operators.tseries import grouped_trend

    got = {
        r["g"]: (
            None if r["slope"] is None else round(r["slope"], 6),
            None if r["r2"] is None else round(r["r2"], 6),
            r["n_fit"],
        )
        for r in grouped_trend(df, ["g"], x="x", y="y").collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        g: (
            None if s is None else round(s, 6),
            None if r2 is None else round(r2, 6),
            n,
        )
        for g, s, r2, n in con.execute(
            "SELECT g, regr_slope(y, x), regr_r2(y, x), "
            "CAST(regr_count(y, x) AS BIGINT) FROM t GROUP BY 1"
        ).fetchall()
    }
    assert got == want
    assert got[99][0] is None  # zero x-variance -> NULL slope


def test_grouped_trend_plan_is_one_partial_agg(spark):
    """One scan, partial+final HashAggregate, no Python, no extra
    exchange beyond the group-key shuffle — also with extra moment
    columns merged in."""
    from pyspark.sql import functions as F

    from cosmap_spark.operators.tseries import grouped_trend

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 13).cast("double").alias("x"),
        (F.col("id") % 17).cast("double").alias("y"),
    )
    out = grouped_trend(
        df, ["g"], x="x", y="y", extra={"mx": F.max("x")}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "mx" in out.columns and "slope" in out.columns


# ---------------------------------------------------------------------------
# changepoint detection (grouped_changepoint / changepoints_binseg)
# ---------------------------------------------------------------------------

_CP_SCALE = 1_000_000.0


def _quant(vals):
    """HALF_UP quantization to 6 dp in exact ints — the operator's
    F.round(v*1e6).cast('long') (python round() is half-EVEN, so spell
    half-up explicitly)."""
    out = []
    for v in vals:
        x = float(v) * _CP_SCALE
        out.append(int(np.sign(x) * np.floor(np.abs(x) + 0.5)))
    return out


def _amoc_best(vals, min_seg=1):
    """(best_left_size, best_stat_quantized, n) via the same IEEE ops as
    the operator: exact-integer prefix sums, w*d*d, ties -> earliest."""
    q = _quant(vals)
    n = len(q)
    t = sum(q)
    best = None
    c = 0
    for i in range(1, n):
        c += q[i - 1]
        if i < min_seg or n - i < min_seg:
            continue
        d = c / i - (t - c) / (n - i)
        w = (i * (n - i)) / n
        sq = w * d * d
        if best is None or (-sq, i) < (-best[1], best[0]):
            best = (i, sq)
    return (best[0], best[1], n) if best else None


def _cp_frame(spark, series: dict):
    rows = [
        (k, i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "k long, t long, v double")


def test_grouped_changepoint_matches_reference(spark):
    from cosmap_spark.operators.tseries import grouped_changepoint

    rng = np.random.default_rng(11)
    series = {
        0: np.concatenate([rng.normal(0, 1, 30), rng.normal(3, 1, 25)]),
        1: rng.normal(5, 2, 40),                      # no real shift
        2: np.concatenate([rng.normal(-2, 0.5, 9), rng.normal(4, 0.5, 50)]),
        3: rng.normal(0, 1, 7),                       # below min_len
        4: np.full(20, 2.5),                          # constant: all-tie
    }
    got = {
        r["k"]: r
        for r in grouped_changepoint(
            _cp_frame(spark, series), ["k"],
            order_cols=["t"], val_col="v", min_len=8,
        ).collect()
    }
    assert 3 not in got  # shorter than min_len
    for k in (0, 1, 2, 4):
        i, sq, n = _amoc_best(series[k])
        r = got[k]
        assert r["cp_pos"] == i and r["n"] == n, (k, r, i)
        assert r["stat"] == sq / (_CP_SCALE * _CP_SCALE)
        q = _quant(series[k])
        assert r["mean_left"] == sum(q[:i]) / i / _CP_SCALE
        assert r["t"] == i - 1  # boundary row = last row of left segment
    # planted shifts land exactly on the seam; constant ties -> earliest
    assert got[0]["cp_pos"] == 30 and got[2]["cp_pos"] == 9
    assert got[4]["cp_pos"] == 1 and got[4]["stat"] == 0.0


def test_grouped_changepoint_layout_independent(spark):
    from cosmap_spark.operators.tseries import grouped_changepoint

    rng = np.random.default_rng(5)
    series = {
        k: np.concatenate(
            [rng.normal(0, 1, 10 + k), rng.normal(0.3 * k, 1, 20)]
        )
        for k in range(6)
    }
    df = _cp_frame(spark, series)
    a = grouped_changepoint(
        df.repartition(13), ["k"], order_cols=["t"], val_col="v"
    ).collect()
    b = grouped_changepoint(
        df.repartition(2, "t"), ["k"], order_cols=["t"], val_col="v"
    ).collect()
    key = lambda r: r["k"]
    assert sorted(map(tuple, a), key=lambda x: x[0]) == sorted(
        map(tuple, b), key=lambda x: x[0]
    )


def test_grouped_changepoint_null_and_plan(spark):
    """NULL key/order/value rows drop; ONE shuffle exchange serves the
    prefix-sum window, the partition aggregates, and the rank."""
    from cosmap_spark.operators.tseries import grouped_changepoint

    rows = [(1, 0, 1.0), (1, 1, None), (None, 2, 3.0), (1, None, 4.0)] + [
        (1, int(i), float(i >= 6)) for i in range(2, 12)
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = grouped_changepoint(
        df, ["k"], order_cols=["t"], val_col="v", min_len=8
    )
    got = out.collect()
    assert len(got) == 1 and got[0]["n"] == 11  # the 3 null rows dropped
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1
    assert "BatchEvalPython" not in plan


def _binseg_ref(vals, *, max_cp=3, min_seg=4, min_gain=0.0):
    """The operator's budgeted parallel binseg, exactly: per round every
    segment proposes its best admissible split; per key accept up to
    the remaining budget by (stat desc, global pos asc)."""
    segs = [(1, len(vals))]  # inclusive 1-based global ranges
    out, budget = [], max_cp
    for it in range(max_cp):
        props = []
        for lo, hi in segs:
            r = _amoc_best(vals[lo - 1:hi], min_seg=min_seg)
            if r and r[1] > min_gain * _CP_SCALE * _CP_SCALE:
                props.append((-r[1], lo - 1 + r[0]))
        props.sort()
        acc = props[:budget]
        if not acc:
            break
        out += [
            (gpos, -nsq / (_CP_SCALE * _CP_SCALE), it) for nsq, gpos in acc
        ]
        cut = {gpos for _, gpos in acc}
        nsegs = []
        for lo, hi in segs:
            mid = [g for g in cut if lo <= g < hi]
            if mid:
                nsegs += [(lo, mid[0]), (mid[0] + 1, hi)]
            else:
                nsegs.append((lo, hi))
        segs, budget = nsegs, budget - len(acc)
        if budget <= 0:
            break
    return out


def test_changepoints_binseg_matches_reference(spark):
    from cosmap_spark.operators.tseries import changepoints_binseg

    rng = np.random.default_rng(23)
    series = {
        0: np.concatenate(
            [rng.normal(0, 1, 20), rng.normal(5, 1, 20), rng.normal(-3, 1, 20)]
        ),
        1: rng.normal(1, 1, 30),
        2: np.concatenate([rng.normal(0, 0.3, 12), rng.normal(2, 0.3, 12)]),
        3: np.full(25, 1.0),  # constant: zero gain, no splits
    }
    got = {}
    for r in changepoints_binseg(
        _cp_frame(spark, series), ["k"],
        order_cols=["t"], val_col="v", max_changepoints=3, min_seg=4,
    ).collect():
        got.setdefault(r["k"], []).append((r["cp_pos"], r["stat"], r["iter"]))
    for k, vals in series.items():
        want = _binseg_ref(vals, max_cp=3, min_seg=4)
        assert sorted(got.get(k, [])) == sorted(want), (k, got.get(k), want)
    # the two planted seams of key 0 are both found
    assert {p for p, _, _ in got[0]} >= {20, 40}
    assert 3 not in got


def test_changepoints_binseg_budget_and_gain(spark):
    from cosmap_spark.operators.tseries import changepoints_binseg

    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [rng.normal(0, 1, 15), rng.normal(6, 1, 15), rng.normal(12, 1, 15)]
    )
    df = _cp_frame(spark, {0: vals})
    one = changepoints_binseg(
        df, ["k"], order_cols=["t"], val_col="v", max_changepoints=1
    ).collect()
    assert len(one) == 1
    assert sorted(
        (r["cp_pos"], r["stat"], r["iter"]) for r in one
    ) == sorted(_binseg_ref(vals, max_cp=1))
    # a sky-high gain threshold suppresses everything
    none = changepoints_binseg(
        df, ["k"], order_cols=["t"], val_col="v", min_gain=1e9
    )
    assert none.count() == 0
    assert {"cp_pos", "stat", "iter"} <= set(none.columns)


def test_changepoint_hypothesis_differential(spark):
    """Hypothesis over adversarial series shapes — constants, single
    spikes, alternating values, tiny magnitudes, planted shifts — the
    operator must equal the pure-python reference BIT-EXACTLY (the
    integer-quantization determinism contract), for AMOC and binseg."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cosmap_spark.operators.tseries import (
        changepoints_binseg,
        grouped_changepoint,
    )

    vals = st.one_of(
        st.floats(-100, 100, allow_nan=False, width=32),
        st.sampled_from([0.0, 1.0, -1.0, 0.5, 1e-4, 37.25]),
    )
    series_strategy = st.lists(vals, min_size=8, max_size=40)

    @given(series=series_strategy, max_cp=st.integers(1, 3))
    @settings(max_examples=12, deadline=None)
    def check(series, max_cp):
        df = _cp_frame(spark, {0: series})
        got = grouped_changepoint(
            df, ["k"], order_cols=["t"], val_col="v", min_len=8
        ).collect()
        i, sq, n = _amoc_best(series)
        assert len(got) == 1
        assert (got[0]["cp_pos"], got[0]["n"]) == (i, n)
        assert got[0]["stat"] == sq / (_CP_SCALE * _CP_SCALE)
        bs = sorted(
            (r["cp_pos"], r["stat"], r["iter"])
            for r in changepoints_binseg(
                df, ["k"], order_cols=["t"], val_col="v",
                max_changepoints=max_cp, min_seg=2,
            ).collect()
        )
        want = sorted(_binseg_ref(series, max_cp=max_cp, min_seg=2))
        assert bs == want, (series, max_cp)

    check()
