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


def test_interval_overlap_join_vs_bruteforce(spark):
    import random

    from cosmap_spark.operators.intervals import interval_overlap_join

    rng = random.Random(17)
    rows = [
        (i, rng.choice(["u", "v", "w"]), rng.randrange(0, 2000),)
        for i in range(80)
    ]
    rows = [(i, k, s, s + rng.randrange(1, 600)) for i, k, s in rows]
    df = spark.createDataFrame(rows, "id long, k string, start long, end long")

    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in interval_overlap_join(df, by=["k"], grid=500).collect()
    }
    want = {}
    for ia, ka, sa, ea in rows:
        for ib, kb, sb, eb in rows:
            if ia < ib and ka == kb and sa <= eb and sb <= ea:
                want[(ia, ib)] = min(ea, eb) - max(sa, sb)
    assert got == want

    # two-sided variant: evens vs odds, no a<b constraint
    ev = df.where("id % 2 = 0")
    od = df.where("id % 2 = 1")
    got2 = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(ev, od, by=["k"], grid=500).collect()
    }
    want2 = {
        (ia, ib)
        for ia, ka, sa, ea in rows if ia % 2 == 0
        for ib, kb, sb, eb in rows if ib % 2 == 1
        and ka == kb and sa <= eb and sb <= ea
    }
    assert got2 == want2


def test_interval_overlap_join_plan_is_equi(spark):
    from cosmap_spark.operators.intervals import interval_overlap_join
    from cosmap_spark.operators.report import plan_summary

    df = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 150), (3, 400, 500)], "id long, start long, end long"
    )
    s = plan_summary(interval_overlap_join(df, grid=100))
    assert s["cartesian_products"] == 0
    assert s["nested_loop_joins"] == 0
    assert s["broadcast_joins"] + s["sortmerge_joins"] + s["shuffled_hash_joins"] >= 1


def test_interval_overlap_join_duplicate_ids_keep_distinct_intervals(spark):
    """Cross-cell dedup keys on (ids, endpoints): rows sharing an id but
    carrying different intervals must each keep their pairs (the dedup
    previously collapsed them nondeterministically)."""
    from cosmap_spark.operators.intervals import interval_overlap_join

    df = spark.createDataFrame(
        [(1, 0, 100), (1, 200, 300), (2, 50, 250)],
        "id long, start long, end long",
    )
    got = {
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"])
        for r in interval_overlap_join(df, grid=100).collect()
    }
    # id 1's FIRST interval overlaps id 2, and id 1's SECOND interval
    # also overlaps id 2 — both pairs must survive
    assert got == {(1, 2, 0, 50), (1, 2, 200, 50)}


def test_overlap_join_huge_endpoints_exact_cells(spark):
    """Nanosecond-epoch endpoints (~1.7e18, far past 2^53): grid cells
    must come from exact integer arithmetic — the double-division path
    mis-bucketed boundary intervals (doubles are spaced 256 apart up
    there) and silently dropped overlapping pairs."""
    import random

    from cosmap_spark.operators.intervals import interval_overlap_join

    rng = random.Random(7)
    n0 = 1_700_000_000_000_000_000
    rows = []
    for i in range(120):
        s = n0 + rng.randrange(0, 4_000)
        e = s + rng.randrange(0, 300)
        rows.append((i, s, e))
    df = spark.createDataFrame(rows, "id long, start long, end long")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(df, grid=97).collect()
    )
    want = sorted(
        (a[0], b[0])
        for i, a in enumerate(rows)
        for b in rows[i + 1:]
        if a[1] <= b[2] and b[1] <= a[2]
    )
    want = sorted(
        (min(x, y), max(x, y)) for x, y in want
    )
    assert got == want
