"""Funnel analysis: differential vs a pandas reference of the same
anchored semantics, horizon boundaries, stall behavior, real-events
smoke, and plan shape (no event log ever collected per user)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.funnel import funnel, funnel_summary

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # u1 completes A->B->C in order
        (1, "A", _ts(0)), (1, "B", _ts(5)), (1, "C", _ts(9)),
        # u2 stalls after B
        (2, "A", _ts(0)), (2, "B", _ts(50)),
        # u3 has B before A (doesn't count), then completes
        (3, "B", _ts(0)), (3, "A", _ts(10)), (3, "B", _ts(20)),
        (3, "C", _ts(21)),
        # u4 completes but only outside a 30-minute horizon
        (4, "A", _ts(0)), (4, "B", _ts(10)), (4, "C", _ts(45)),
        # u5 never does A
        (5, "B", _ts(1)), (5, "C", _ts(2)),
        # u6: anchored semantics — first A's horizon misses, a later A
        # would have worked (documented fixed-anchor behavior)
        (6, "A", _ts(0)), (6, "A", _ts(40)), (6, "B", _ts(45)),
        (6, "C", _ts(50)),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    ).cache()


def _reference(pdf: pd.DataFrame, steps, horizon_min=None):
    out = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        firsts = g[g.event_type == steps[0]]
        if firsts.empty:
            continue
        anchor = firsts.ts.iloc[0]
        tss = [anchor]
        for s in steps[1:]:
            prev = tss[-1]
            if prev is None:
                tss.append(None)
                continue
            cand = g[(g.event_type == s) & (g.ts > prev)]
            if horizon_min is not None:
                cand = cand[
                    cand.ts <= anchor + pd.Timedelta(minutes=horizon_min)
                ]
            tss.append(cand.ts.iloc[0] if len(cand) else None)
        out[u] = tuple(t.to_pydatetime() if t is not None else None
                       for t in tss)
    return out


@pytest.mark.parametrize("horizon_min", [None, 30])
def test_matches_reference(spark, log, horizon_min):
    steps = ["A", "B", "C"]
    got = {
        r["user_id"]: (r["ts_1"], r["ts_2"], r["ts_3"])
        for r in funnel(
            log, steps,
            horizon=f"{horizon_min} minutes" if horizon_min else None,
        ).collect()
    }
    want = _reference(log.toPandas(), steps, horizon_min)
    assert got == want


def test_counts_and_summary(spark, log):
    per_user = funnel(log, ["A", "B", "C"], horizon="30 minutes")
    rows = {r["user_id"]: r for r in per_user.collect()}
    assert rows[1]["converted"] and rows[1]["steps_completed"] == 3
    # u2's B lands at +50min — outside the 30-minute horizon
    assert not rows[2]["converted"] and rows[2]["steps_completed"] == 1
    assert rows[3]["converted"]  # pre-anchor B ignored, later B counts
    assert rows[4]["steps_completed"] == 2  # C outside horizon
    assert 5 not in rows  # never entered the funnel
    assert rows[6]["steps_completed"] == 1  # fixed anchor: first A
    s = {
        r["step"]: (r["n_users"], r["conversion_from_start"])
        for r in funnel_summary(per_user, 3).collect()
    }
    assert s[1][0] == 5 and s[1][1] == 1.0
    assert s[2][0] == 3
    assert s[3][0] == 2 and s[3][1] == pytest.approx(0.4)


def test_real_events_smoke_and_plan(spark):
    from cosmap_spark.operators.report import plan_summary
    from cosmap_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    steps = ["view", "click", "purchase"]
    per_user = funnel(ev, steps, horizon="2 days")
    n = per_user.count()
    assert n > 0
    s = plan_summary(per_user)
    assert s["python_evals"] == 0 and s["arrow_evals"] == 0  # all JVM
    assert s["cartesian_products"] == 0 and s["nested_loop_joins"] == 0
    # per-user state is O(steps): no collect_list/sort of event logs
    plan = per_user._sc._jvm.PythonSQLUtils.explainString(
        per_user._jdf.queryExecution(), "simple"
    )
    assert "collect_list" not in plan


def test_validation(spark, log):
    with pytest.raises(ValueError):
        funnel(log, ["A"])


def _sliding_reference(pdf: pd.DataFrame, steps, horizon_min=None):
    """Exhaustive sliding-anchor reference: for EVERY step-1 occurrence
    run the greedy earliest-feasible chain (optimal for a fixed anchor)
    with strict time ordering; per user report the max level and the
    LATEST anchor among chains reaching it."""
    out = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        best_level, best_anchor = 0, None
        for anchor in g[g.event_type == steps[0]].ts:
            level, prev = 1, anchor
            for s in steps[1:]:
                cand = g[(g.event_type == s) & (g.ts > prev)]
                if horizon_min is not None:
                    cand = cand[
                        cand.ts <= anchor + pd.Timedelta(minutes=horizon_min)
                    ]
                if cand.empty:
                    break
                prev = cand.ts.iloc[0]
                level += 1
            if level > best_level or (
                level == best_level and anchor > best_anchor
            ):
                best_level, best_anchor = level, anchor
        if best_level >= 1:
            out[u] = (
                best_anchor.to_pydatetime(), best_level,
                best_level == len(steps),
            )
    return out


@pytest.mark.parametrize("horizon_min", [None, 30])
def test_sliding_matches_exhaustive_reference(spark, log, horizon_min):
    from cosmap_spark.operators.funnel import funnel_sliding

    steps = ["A", "B", "C"]
    horizon = f"{horizon_min} minutes" if horizon_min else None
    got = {
        r["user_id"]: (r["anchor_ts"], r["steps_completed"], r["converted"])
        for r in funnel_sliding(
            _log_df(spark), steps, horizon=horizon,
        ).collect()
    }
    want = _sliding_reference(_log_df(spark).toPandas(), steps, horizon_min)
    assert got == want
    # u6 is the case that separates the variants: the fixed anchor at
    # t=0 misses the 30-min horizon, the sliding anchor at t=40 converts
    if horizon_min == 30:
        assert got[6][1] == 3 and got[6][2]


def _log_df(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts(0)), (1, "B", _ts(5)), (1, "C", _ts(9)),
            (2, "A", _ts(0)), (2, "B", _ts(50)),
            (3, "B", _ts(0)), (3, "A", _ts(10)), (3, "B", _ts(20)),
            (3, "C", _ts(21)),
            (4, "A", _ts(0)), (4, "B", _ts(10)), (4, "C", _ts(45)),
            (5, "B", _ts(1)), (5, "C", _ts(2)),
            (6, "A", _ts(0)), (6, "A", _ts(40)), (6, "B", _ts(45)),
            (6, "C", _ts(50)),
            # u7: same-timestamp events must NOT chain (strict >)
            (7, "A", _ts(0)), (7, "B", _ts(0)), (7, "C", _ts(1)),
            # u8: interleaved restarts — later anchor reaches deeper
            (8, "A", _ts(0)), (8, "B", _ts(100)),
            (8, "A", _ts(90)), (8, "C", _ts(101)),
        ],
        "user_id long, event_type string, ts timestamp",
    )


def test_sliding_randomized_differential(spark):
    import random

    from cosmap_spark.operators.funnel import funnel_sliding

    rng = random.Random(23)
    rows = []
    for u in range(60):
        for _ in range(rng.randint(0, 25)):
            rows.append(
                (u, rng.choice("ABCD"), _ts(rng.randint(0, 200)))
            )
    if not rows:
        rows = [(0, "A", _ts(0))]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    steps = ["A", "B", "C", "D"]
    for horizon_min in (None, 40):
        horizon = f"{horizon_min} minutes" if horizon_min else None
        got = {
            r["user_id"]: (r["anchor_ts"], r["steps_completed"], r["converted"])
            for r in funnel_sliding(df, steps, horizon=horizon).collect()
        }
        want = _sliding_reference(df.toPandas(), steps, horizon_min)
        assert got == want, horizon_min
    # partition independence: same result at a hostile partitioning
    got1 = sorted(map(tuple, funnel_sliding(df.repartition(13), steps).collect()))
    got2 = sorted(map(tuple, funnel_sliding(df.coalesce(1), steps).collect()))
    assert got1 == got2


def test_sliding_real_events_smoke_plan_and_edge_cases(spark):
    from cosmap_spark.operators.funnel import funnel_sliding
    from cosmap_spark.operators.report import plan_summary
    from cosmap_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    steps = ["view", "click", "purchase"]
    out = funnel_sliding(ev, steps, horizon="2 days")
    rows = out.collect()
    assert len(rows) > 0
    assert all(1 <= r["steps_completed"] <= 3 for r in rows)
    # sliding can only do at least as well as the fixed anchor, per user
    fixed = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(ev, steps, horizon="2 days").collect()
    }
    for r in rows:
        if r["user_id"] in fixed:
            assert r["steps_completed"] >= fixed[r["user_id"]]
    # fresh frame: an EXECUTED AQE plan's formatted explain lists the
    # initial plan too, double-counting node headers
    s = plan_summary(funnel_sliding(ev, steps, horizon="2 days"))
    assert s["arrow_evals"] == 1 and s["python_evals"] == 0
    assert s["exchanges"] == 1  # the single user repartition
    # edge cases: empty input and no step-1 users yield empty frames
    empty = ev.where(F.lit(False))
    assert funnel_sliding(empty, steps).count() == 0
    no_anchor = ev.where(F.col("event_type") != "view")
    assert funnel_sliding(no_anchor, steps).count() == 0
    with pytest.raises(ValueError):
        funnel_sliding(ev, ["view"])


def test_summary_levels_matches_summary_on_fixed_funnel(spark, log):
    """On the fixed funnel, converting its result to level shape and
    summarizing via funnel_summary_levels must equal funnel_summary —
    the adapter changes input shape, not semantics."""
    from cosmap_spark.operators.funnel import funnel_summary_levels

    steps = ["A", "B", "C"]
    per_user = funnel(log, steps)
    a = sorted(map(tuple, funnel_summary(per_user, 3).collect()))
    lv = per_user.select("user_id", "steps_completed")
    b = sorted(map(tuple, funnel_summary_levels(lv, 3).collect()))
    assert a == b
    # and it works on the sliding output directly
    from cosmap_spark.operators.funnel import funnel_sliding

    s = funnel_summary_levels(funnel_sliding(log, steps), 3).collect()
    assert [r["step"] for r in sorted(s, key=lambda r: r["step"])] == [1, 2, 3]


def test_cohort_retention_matches_duckdb(spark, duck, tmp_path):
    """Differential vs DuckDB on the real events table, week and month
    cohorts: identical (cohort, n, active, retention) matrices."""
    from cosmap_spark.operators.funnel import cohort_retention
    from cosmap_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    pq_path = str(tmp_path / "coh_ev.parquet")
    ev.select("user_id", "ts").toPandas().to_parquet(pq_path)
    for period, div in (("week", 7), ("month", None)):
        got = sorted(
            (str(r["cohort"])[:10], r["period_n"], r["n_active"], r["retention"])
            for r in cohort_retention(
                ev, period=period, max_periods=6
            ).collect()
        )
        if div:
            nexpr = f"(date_diff('day', cohort, p) / {div})::BIGINT"
        else:
            nexpr = "(date_diff('month', cohort, p))::BIGINT"
        want = sorted(
            (str(r[0])[:10], r[1], r[2], float(r[3]))
            for r in duck.execute(f"""
                WITH ev AS (
                  SELECT user_id, date_trunc('{period}', ts) AS p
                  FROM '{pq_path}' WHERE ts IS NOT NULL
                ),
                firsts AS (SELECT user_id, min(p) AS cohort FROM ev GROUP BY 1),
                sizes AS (SELECT cohort, count(*) AS sz FROM firsts GROUP BY 1),
                act AS (
                  SELECT DISTINCT e.user_id, f.cohort, {nexpr} AS n
                  FROM ev e JOIN firsts f USING (user_id)
                  WHERE {nexpr} < 6
                ),
                agg AS (SELECT cohort, n, count(*) AS n_active
                        FROM act GROUP BY 1, 2)
                SELECT a.cohort, a.n, a.n_active,
                       round(a.n_active / s.sz, 6)
                FROM agg a JOIN sizes s USING (cohort)
            """).fetchall()
        )
        assert got == want, period
        # structural sanity: every cohort retains 100% at n=0
        assert all(r[3] == 1.0 for r in got if r[1] == 0)


def test_sliding_predicate_steps_and_repeated_types(spark):
    """windowFunnel cond1..condN generalization: Column predicates and
    repeated step types, both checked against a per-anchor exhaustive
    reference with callable steps."""
    from cosmap_spark.operators.funnel import funnel_sliding

    rows = [
        # u1: view -> big purchase (>=100) -> view  (completes A,B,A)
        (1, "view", 10.0, _ts(0)), (1, "purchase", 150.0, _ts(5)),
        (1, "view", 0.0, _ts(9)),
        # u2: purchase too small for the predicate step
        (2, "view", 1.0, _ts(0)), (2, "purchase", 50.0, _ts(5)),
        (2, "view", 1.0, _ts(9)),
        # u3: right events, wrong order
        (3, "purchase", 500.0, _ts(0)), (3, "view", 1.0, _ts(5)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, ts timestamp"
    )
    steps = [
        "view",
        (F.col("event_type") == "purchase") & (F.col("value") >= 100),
        "view",
    ]

    def pred(i):
        return [
            lambda t, v: t == "view",
            lambda t, v: t == "purchase" and v >= 100,
            lambda t, v: t == "view",
        ][i]

    # exhaustive reference over callables
    want = {}
    pdf = df.toPandas()
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        best = 0
        for _, a in g[g.apply(lambda r: pred(0)(r.event_type, r.value),
                              axis=1)].iterrows():
            level, prev = 1, a.ts
            for i in range(1, 3):
                cand = g[(g.ts > prev) & g.apply(
                    lambda r: pred(i)(r.event_type, r.value), axis=1)]
                if cand.empty:
                    break
                prev = cand.ts.iloc[0]
                level += 1
            best = max(best, level)
        if best:
            want[u] = best
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_sliding(df, steps).collect()
    }
    assert got == want
    assert got[1] == 3 and got[2] == 1 and got[3] == 1


def test_fixed_funnel_predicate_steps(spark):
    """The fixed-anchor funnel accepts the same predicate steps as the
    sliding one; the value-thresholded middle step gates conversion."""
    rows = [
        (1, "view", 0.0, _ts(0)), (1, "purchase", 150.0, _ts(5)),
        (1, "view", 0.0, _ts(9)),
        (2, "view", 0.0, _ts(0)), (2, "purchase", 50.0, _ts(5)),
        (2, "view", 0.0, _ts(9)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, ts timestamp"
    )
    steps = [
        "view",
        (F.col("event_type") == "purchase") & (F.col("value") >= 100),
        "view",
    ]
    got = {r["user_id"]: (r["steps_completed"], r["converted"])
           for r in funnel(df, steps).collect()}
    assert got == {1: (3, True), 2: (1, False)}


def test_funnel_summary_segmented(spark, log):
    """``by`` yields one conversion table per segment, each equal to
    running the unsegmented summary on that segment's slice alone."""
    from cosmap_spark.operators.funnel import (
        funnel,
        funnel_summary,
        funnel_summary_levels,
    )

    per_user = funnel(log, ["A", "B", "C"]).withColumn(
        "segment", (F.col("user_id") % 2 == 0).cast("string")
    )
    seg = {
        (r["segment"], r["step"]): (
            r["n_users"], r["conversion_from_start"], r["retention_from_prev"]
        )
        for r in funnel_summary(per_user, 3, by=["segment"]).collect()
    }
    for val in ("true", "false"):
        solo = {
            r["step"]: (
                r["n_users"], r["conversion_from_start"],
                r["retention_from_prev"],
            )
            for r in funnel_summary(
                per_user.where(F.col("segment") == val), 3
            ).collect()
        }
        assert {s: v for (g, s), v in seg.items() if g == val} == solo
    # level-shaped variant segments the same way
    lv = per_user.select("segment", "user_id", "steps_completed")
    a = sorted(map(tuple, funnel_summary_levels(lv, 3, by=["segment"]).collect()))
    b = sorted(map(tuple, funnel_summary(per_user, 3, by=["segment"]).collect()))
    assert a == b


def test_event_transitions_matches_reference_and_ties(spark):
    """Next-event transition matrix vs a pure-python reference,
    including same-timestamp neighbors (tie_cols break the order
    deterministically) and row-normalized probabilities."""
    from cosmap_spark.operators.funnel import event_transitions

    rows = [
        (1, 1, "A", _ts(0)), (2, 1, "B", _ts(5)), (3, 1, "C", _ts(5)),
        (4, 1, "A", _ts(9)),
        (5, 2, "A", _ts(0)), (6, 2, "A", _ts(1)),
        (7, 3, "B", _ts(0)),              # single event: no pair
        (8, None, "A", _ts(0)),           # null user dropped
        (9, 4, "A", None),                # null ts dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(df).collect()
    }
    # reference: per user sort by (ts, event_id), pair consecutive
    import collections

    seqs = collections.defaultdict(list)
    for eid, u, t, ts in rows:
        if u is None or ts is None:
            continue
        seqs[u].append((ts, eid, t))
    counts = collections.Counter()
    for u, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    totals = collections.Counter()
    for (a, _), n in counts.items():
        totals[a] += n
    want = {k: (n, round(n / totals[k[0]], 6)) for k, n in counts.items()}
    assert got == want
    # the tie at _ts(5): B before C because event_id 2 < 3
    assert ("B", "C") in got and ("C", "A") in got
    # probabilities row-normalize to 1
    by_from = collections.defaultdict(float)
    for (a, _), (_, p) in got.items():
        by_from[a] += p
    assert all(abs(v - 1.0) < 1e-6 for v in by_from.values())
    # partition independence
    again = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(df.repartition(7)).collect()
    }
    assert again == got


def test_event_paths_matches_reference(spark):
    """k-step paths vs a pure-python reference: short runs excluded
    (NULL-tail gate — concat_ws would silently emit truncated paths),
    deterministic top-n, k validation."""
    from cosmap_spark.operators.funnel import event_paths

    rows = [
        (1, 1, "A", _ts(0)), (2, 1, "B", _ts(1)), (3, 1, "C", _ts(2)),
        (4, 1, "A", _ts(3)),
        (5, 2, "A", _ts(0)), (6, 2, "B", _ts(1)), (7, 2, "C", _ts(2)),
        (8, 3, "A", _ts(0)), (9, 3, "B", _ts(1)),   # run of 2: no 3-path
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {(r["path"], r["n"]) for r in event_paths(df, k=3).collect()}
    assert got == {("A>B>C", 2), ("B>C>A", 1)}
    # k=2 equals the transition counts
    from cosmap_spark.operators.funnel import event_transitions

    p2 = {(r["path"], r["n"]) for r in event_paths(df, k=2, top_n=None).collect()}
    t = {(f"{r['from_type']}>{r['to_type']}", r["n"])
         for r in event_transitions(df).collect()}
    assert p2 == t
    import pytest as _pt

    with _pt.raises(ValueError):
        event_paths(df, k=1)


def test_funnel_latency_matches_pandas_reference(spark, log):
    """Latency distributions vs a pandas reference on the fixture (n
    below percentile_approx's accuracy ⇒ the sketch is exact: it
    returns an actual element at the target rank), plus structure:
    stalled users never contribute, step rows with no completions are
    absent, and from_start ≥ from_prev."""
    import numpy as np

    from cosmap_spark.operators.funnel import funnel, funnel_latency

    per_user = funnel(log, ["A", "B", "C"], horizon="30 minutes")
    got = {
        r["step"]: r.asDict()
        for r in funnel_latency(per_user, 3, quantiles=(0.5,)).collect()
    }
    pdf = per_user.toPandas()
    for s in (2, 3):
        sub = pdf[pdf[f"ts_{s}"].notna()]
        d_prev = (
            sub[f"ts_{s}"] - sub[f"ts_{s - 1}"]
        ).dt.total_seconds().to_numpy()
        d_start = (sub[f"ts_{s}"] - sub["ts_1"]).dt.total_seconds().to_numpy()
        if not len(sub):
            assert s not in got
            continue
        g = got[s]
        assert g["n_users"] == len(sub)
        assert g["mean_from_prev"] == pytest.approx(d_prev.mean(), abs=1e-3)
        assert g["mean_from_start"] == pytest.approx(d_start.mean(), abs=1e-3)
        # percentile_approx at small n returns a real element with rank
        # ceil(p·n) (1-indexed) — mirror that exactly
        def pa(a, p):
            a = np.sort(a)
            return a[max(int(np.ceil(p * len(a))) - 1, 0)]

        assert g["p50_from_prev"] == pytest.approx(pa(d_prev, 0.5), abs=1e-3)
        assert g["p50_from_start"] == pytest.approx(pa(d_start, 0.5), abs=1e-3)
        assert g["mean_from_start"] >= g["mean_from_prev"]
    with pytest.raises(ValueError):
        funnel_latency(per_user, 1)


def test_funnel_latency_real_events_ntz(spark):
    """Regression: parquet events normalize to TIMESTAMP_NTZ via
    load_table, which unix_micros REJECTS — the latency arithmetic
    must run on both timestamp flavors (timestampdiff does)."""
    from cosmap_spark.operators.funnel import funnel, funnel_latency
    from cosmap_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    per_user = funnel(ev, ["view", "click", "purchase"], horizon="2 days")
    rows = funnel_latency(per_user, 3).collect()
    assert rows and all(r["mean_from_prev"] > 0 for r in rows)
    assert all(r["mean_from_start"] >= r["mean_from_prev"] for r in rows)


def test_cohort_retention_month_boundary_property(spark):
    """Hypothesis over adversarial timestamps — month ends (Jan 31,
    Mar 31), leap-year Feb 29, first-of-month midnights: month-cohort
    ``period_n`` must equal the pure calendar-month distance
    (year*12+month deltas) for every (user, activity) pair, and the
    n=0 retention-1.0 invariant must hold.  This pins the
    ``round(months_between(...))`` arithmetic on truncated stamps
    (funnel.py): both stamps are month-starts, so the fraction is 0 by
    construction — the property would catch any regression to
    un-truncated inputs (where Jan 31 → Feb 28 yields 0.9x months)."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cosmap_spark.operators.funnel import cohort_retention

    # days offsets landing on month boundaries and leap-year edges
    # around 2023-12-28..2024-04-02 plus a spread of ordinary days
    base = dt.datetime(2023, 12, 28, 23, 59, 59)
    ts_strategy = st.one_of(
        st.integers(0, 96),                       # day offsets (hits Feb 29)
        st.sampled_from([3, 4, 34, 35, 63, 64]),  # Dec 31/Jan 1, Jan 31/Feb 1
    )

    @given(
        events=st.lists(
            st.tuples(st.integers(0, 4), ts_strategy), min_size=1, max_size=24
        )
    )
    @settings(max_examples=25, deadline=None)
    def check(events):
        rows = [
            (u, base + dt.timedelta(days=d, hours=(u * 7) % 24))
            for u, d in events
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (str(r["cohort"])[:10], r["period_n"]): (r["n_active"], r["retention"])
            for r in cohort_retention(df, period="month", max_periods=12).collect()
        }
        # pure-python reference on calendar months
        def mkey(t):
            return t.year * 12 + t.month

        first = {}
        for u, t in rows:
            first[u] = min(first.get(u, t), t)
        cohorts = {}
        for u, t0 in first.items():
            cohorts.setdefault(mkey(t0), set()).add(u)
        active = {}
        for u, t in rows:
            n = mkey(t) - mkey(first[u])
            if n < 12:
                c = first[u].replace(day=1)
                active.setdefault((f"{c:%Y-%m-%d}", n), set()).add(u)
        want = {
            k: (
                len(us),
                round(len(us) / len(cohorts[mkey(dt.datetime.strptime(k[0], "%Y-%m-%d"))]), 6),
            )
            for k, us in active.items()
        }
        assert got == want
        for (c, n), (_, r) in got.items():
            if n == 0:
                assert r == 1.0

    check()


def test_cohort_retention_validation_and_null_users(spark):
    """Unsupported period units raise (quarter would silently mis-bin);
    NULL users never count toward cohort sizes (the inner join back
    would drop their activity and break the n=0 retention=1.0
    invariant)."""
    from cosmap_spark.operators.funnel import cohort_retention

    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(60 * 24 * 7)), (None, _ts(0))],
        "user_id long, ts timestamp",
    )
    with pytest.raises(ValueError, match="day/week/month"):
        cohort_retention(df, period="quarter")
    got = {
        (r["period_n"]): (r["n_active"], r["retention"])
        for r in cohort_retention(df, period="week").collect()
    }
    assert got == {0: (1, 1.0), 1: (1, 1.0)}  # the NULL user is ignored


def test_attribution_models(spark):
    """Hand-built fixture: direct conversions, multi-conversion users
    (each purchase credits its OWN preceding window), first/last
    divergence, and within-model shares summing to 1."""
    rows = [
        # u1: view -> click -> purchase  (first=view, last=click)
        (1, "view", 10, 1), (1, "click", 20, 2), (1, "purchase", 30, 3),
        # u1 second purchase later, after another view:
        # first=view(10), last=view(40)
        (1, "view", 40, 4), (1, "purchase", 50, 5),
        # u2: purchase with no touch -> direct/direct
        (2, "purchase", 10, 6),
        # u3: click only, no purchase -> contributes nothing
        (3, "click", 10, 7),
    ]
    ev = spark.createDataFrame(
        [(u, t, float(ts), e) for u, t, ts, e in rows],
        "user_id long, event_type string, tsd double, event_id long",
    ).select(
        "user_id", "event_type",
        F.col("tsd").cast("timestamp").alias("ts"), "event_id",
    )
    from cosmap_spark.operators.funnel import attribution

    got = {
        (r["model"], r["touch"]): (r["n"], r["share"])
        for r in attribution(ev).collect()
    }
    # 3 purchases total: u1 x2, u2 x1
    assert got[("first", "view")] == (2, 0.666667)
    assert got[("first", "direct")] == (1, 0.333333)
    assert got[("last", "click")] == (1, 0.333333)
    assert got[("last", "view")] == (1, 0.333333)
    assert got[("last", "direct")] == (1, 0.333333)
    for model in ("first", "last"):
        assert sum(n for (m, _), (n, _) in got.items() if m == model) == 3


def _attr_reference(rows, models, halflife_s=86400.0):
    """Pure-python multi-touch attribution (non-overlapping lookback:
    each conversion credits touches since the user's previous
    conversion; `first` alone looks over the whole history)."""
    from collections import defaultdict

    credit = defaultdict(float)
    by_user = defaultdict(list)
    for u, ty, ts, eid in rows:
        by_user[u].append((ts, eid, ty))
    for u, evs in by_user.items():
        evs.sort()
        group, history = [], []
        for ts, eid, ty in evs:
            if ty != "purchase":
                group.append((ts, ty))
                history.append((ts, ty))
                continue
            # conversion at ts: credit `group` (since prev conversion)
            m = len(group)
            if "first" in models:
                credit[("first", history[0][1] if history else "direct")] += 1
            if "last" in models:
                credit[("last", history[-1][1] if history else "direct")] += 1
            for model in models:
                if model in ("first", "last"):
                    continue
                if m == 0:
                    credit[(model, "direct")] += 1.0
                elif model == "linear":
                    for _, t in group:
                        credit[(model, t)] += 1.0 / m
                elif model == "position":
                    for i, (_, t) in enumerate(group):
                        if m == 1:
                            w = 1.0
                        elif m == 2:
                            w = 0.5
                        elif i in (0, m - 1):
                            w = 0.4
                        else:
                            w = 0.2 / (m - 2)
                        credit[(model, t)] += w
                elif model == "time_decay":
                    ws = [0.5 ** ((ts - t).total_seconds() / halflife_s)
                          for t, _ in group]
                    z = sum(ws)
                    for w, (_, t) in zip(ws, group):
                        credit[(model, t)] += w / z
            group = []
    # mirror the operator's contract: credit rounds to 4 dp FIRST and
    # share derives from the rounded credits
    rounded = {k: round(w, 4) for k, w in credit.items()}
    totals = defaultdict(float)
    for (model, _), w in rounded.items():
        totals[model] += w
    return {k: (w, round(w / totals[k[0]], 6)) for k, w in rounded.items()}


def test_attribution_path_models_differential(spark):
    """linear / position / time_decay vs the pure-python reference on
    a fixture exercising every branch: m=0 (direct), m=1, m=2, m>=3
    (U-shape middle split), multi-conversion reset, and per-conversion
    weights summing to 1 (so each model's total credit = #conversions)."""
    from cosmap_spark.operators.funnel import attribution

    rows = [
        # u1: 3 touches then purchase (m=3: U-shape middle branch),
        # then 1 touch + purchase (m=1), then purchase (m=0 -> direct)
        (1, "view", _ts(0), 1), (1, "click", _ts(30), 2),
        (1, "email", _ts(60), 3), (1, "purchase", _ts(90), 4),
        (1, "view", _ts(100), 5), (1, "purchase", _ts(200), 6),
        (1, "purchase", _ts(201), 7),
        # u2: m=2 (50/50 position), touches far apart for time_decay
        (2, "click", _ts(0), 8), (2, "view", _ts(24 * 60), 9),
        (2, "purchase", _ts(2 * 24 * 60), 10),
        # u3: touches but never converts -> nothing
        (3, "view", _ts(0), 11),
        # u4: 4 touches incl. repeats (credit aggregates per type)
        (4, "view", _ts(0), 12), (4, "view", _ts(10), 13),
        (4, "click", _ts(20), 14), (4, "email", _ts(30), 15),
        (4, "purchase", _ts(40), 16),
    ]
    models = ("first", "last", "linear", "position", "time_decay")
    ev = spark.createDataFrame(
        [(u, t, ts, e) for u, t, ts, e in rows],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    got = {
        (r["model"], r["touch"]): (r["credit"], r["share"])
        for r in attribution(ev, models=models).collect()
    }
    want = _attr_reference(rows, models)
    assert got == want
    # per-model credit totals == #conversions (weights sum to 1 each)
    for model in models:
        total = sum(c for (m, _), (c, _) in got.items() if m == model)
        assert total == pytest.approx(5.0, abs=1e-3), model


def test_attribution_validation(spark):
    from cosmap_spark.operators.funnel import attribution

    ev = spark.createDataFrame(
        [(1, "view", _ts(0), 1)],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    with pytest.raises(ValueError, match="non-empty subset"):
        attribution(ev, models=())
    with pytest.raises(ValueError, match="non-empty subset"):
        attribution(ev, models=("first", "u_shaped"))


def test_attribution_credit_conservation_property(spark):
    """Hypothesis over random event logs: for EVERY credit model,
    total credit == the user base's conversion count (each conversion
    distributes exactly weight 1) and within-model shares sum to 1 —
    the conservation law that catches any weight-normalization
    regression (e.g. the conversion row leaking into the time-decay
    denominator) regardless of log shape: multi-conversion users,
    direct conversions, touch-only users, duplicate touch types."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cosmap_spark.operators.funnel import ATTRIBUTION_MODELS, attribution

    base = dt.datetime(2024, 1, 1)
    event = st.tuples(
        st.integers(0, 3),                      # user
        st.sampled_from(["view", "click", "email", "purchase"]),
        st.integers(0, 5000),                   # minutes offset
    )

    @given(events=st.lists(event, min_size=1, max_size=30))
    @settings(max_examples=15, deadline=None)
    def check(events):
        rows = [
            (u, t, base + dt.timedelta(minutes=m), i)
            for i, (u, t, m) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, "
                  "event_id long",
        )
        n_conv = sum(1 for _, t, _, _ in rows if t == "purchase")
        got = attribution(df, models=ATTRIBUTION_MODELS).collect()
        if n_conv == 0:
            assert got == []
            return
        for model in ATTRIBUTION_MODELS:
            credit = sum(r["credit"] for r in got if r["model"] == model)
            share = sum(r["share"] for r in got if r["model"] == model)
            assert credit == pytest.approx(n_conv, abs=2e-3), model
            assert share == pytest.approx(1.0, abs=1e-4), model

    check()


def test_time_decay_survives_ancient_touches(spark):
    """Regression (round-6 review): with every touch >> halflife older
    than the conversion, a conversion-anchored decay underflows every
    weight to exact 0.0 and 0/0-crashes under ANSI.  The newest-touch-
    anchored form must return full credit to the (single) touch — and
    split sensibly when an ancient touch accompanies a recent one."""
    import datetime as dt

    from cosmap_spark.operators.funnel import attribution

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            # u1: ONE touch 1200 days before conversion (underflow case)
            (1, "ad", t0 - dt.timedelta(days=1200)),
            (1, "purchase", t0),
            # u2: ancient + recent touch — recent takes ~all credit
            (2, "ad", t0 - dt.timedelta(days=1200)),
            (2, "email", t0 - dt.timedelta(hours=1)),
            (2, "purchase", t0),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    out = {
        (r["model"], r["touch"]): r["credit"]
        for r in attribution(
            ev, conversion="purchase", models=("time_decay",),
            halflife="1 day",
        ).collect()
    }
    # u1's lone ancient touch gets its conversion's full credit
    # (weight 1 of 1); u2's credit concentrates on the recent email
    assert out[("time_decay", "ad")] == pytest.approx(1.0, abs=1e-6)
    assert out[("time_decay", "email")] == pytest.approx(1.0, abs=1e-3)
