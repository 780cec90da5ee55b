"""Interval coalescing vs a brute-force Python reference on randomized
inputs, plus the plan shape (one Exchange+Sort, no self-join)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cosmap_spark.operators.intervals import coalesce_intervals


def _merge_ref(intervals, min_gap=0):
    """Reference: sort + linear scan merge of [start, end) intervals."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1] + min_gap:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return {(s, e, n) for s, e, n in out}


def test_coalesce_matches_reference_on_random_inputs(spark):
    rng = random.Random(7)
    rows = []
    per_key = {}
    for key in range(20):
        ivs = []
        for _ in range(rng.randint(1, 60)):
            s = rng.randint(0, 500)
            e = s + rng.randint(1, 40)
            ivs.append((s, e))
            rows.append((key, s, e))
        per_key[key] = ivs
    df = spark.createDataFrame(rows, "k long, start long, end long")

    for gap in (0, 5):
        got = {}
        for r in coalesce_intervals(
            df, key_cols=["k"], min_gap=gap
        ).collect():
            got.setdefault(r["k"], set()).add(
                (r["start"], r["end"], r["n_merged"])
            )
        for key, ivs in per_key.items():
            assert got[key] == _merge_ref(ivs, gap), (key, gap)


def test_coalesce_single_sort_no_selfjoin(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 5, 12), (1, 20, 30)], "k long, start long, end long"
    )
    out = coalesce_intervals(df, key_cols=["k"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert plan.count("Exchange") <= 2  # one window shuffle + final agg
    assert "Join" not in plan
    rows = {(r["start"], r["end"], r["n_merged"]) for r in out.collect()}
    assert rows == {(0, 12, 2), (20, 30, 1)}
