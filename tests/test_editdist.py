"""Edit-distance similarity join: exact differential vs brute-force
levenshtein, planted-typo recall, df-cap valve behavior, and plan
shape (no cartesian — candidates only via the gram equi-join)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.dedup import edit_distance_pairs

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rand_strings(n, length, seed):
    rng = np.random.default_rng(seed)
    return [
        "".join(ALPHA[i] for i in rng.integers(0, 26, length))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    """150 random base strings (len 40) + typo'd twins of the first
    30: one substitution (ids 10000+i) and one deletion+insertion
    (ids 20000+i, distance 2)."""
    base = _rand_strings(150, 40, seed=11)
    rows = [(i, s) for i, s in enumerate(base)]
    for i in range(30):
        s = base[i]
        rows.append((10000 + i, "z" + s[1:]))          # 1 substitution
        rows.append((20000 + i, s[1:20] + "qq" + s[21:]))  # ≤ 3 edits
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _brute(df, k):
    a, b = df.alias("a"), df.alias("b")
    return {
        (r["id_a"], r["id_b"], r["d"])
        for r in a.crossJoin(b)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.text"), F.col("b.text")).alias("d"),
        )
        .where(F.col("d") <= k)
        .collect()
    }


def test_matches_bruteforce(spark, corpus):
    for k in (1, 2, 3):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(
                corpus, max_dist=k, max_gram_df=None
            ).collect()
        }
        assert got == _brute(corpus, k), k


def test_planted_typos_found(spark, corpus):
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(corpus, max_dist=1).collect()
    }
    for i in range(30):
        assert (i, 10000 + i) in got


def test_gram_df_cap_drops_hot_grams_only(spark):
    """A gram shared by every string is the n² term; capping it must
    not lose pairs that also share a rare gram."""
    common = "xyzxyzxyzxyz"  # floods grams xyz/yzx/zxy across all rows
    rows = [(i, common + s) for i, s in enumerate(_rand_strings(80, 25, 3))]
    rows.append((9000, rows[0][1][:-1] + "q"))  # 1-sub twin of id 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, max_dist=1, max_gram_df=10).collect()
    }
    assert (0, 9000) in got  # found via its rare tail grams


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        edit_distance_pairs(corpus, max_dist=0)
    with pytest.raises(ValueError):
        edit_distance_pairs(corpus, q=1)


def test_plan_no_cartesian(spark, corpus):
    from cosmap_spark.operators.report import plan_summary

    s = plan_summary(edit_distance_pairs(corpus, max_dist=2))
    assert s["cartesian_products"] == 0
    assert s["nested_loop_joins"] == 0
    assert s["python_evals"] == 0 and s["arrow_evals"] == 0  # all JVM


def test_blank_and_short_strings_route_through_short_bucket(spark):
    """sequence(1,0) descends — short/blank strings must contribute NO
    grams (an '' gram would hot-join every blank row pairwise); since
    round 4 they go through the deletion-neighborhood short bucket
    instead, which must find their TRUE pairs: identical blanks
    (dist 0), identical 'ab's (dist 0), and no blank×'ab' pair
    (dist 2 > 1)."""
    rows = [(i, "") for i in range(50)] + [(100 + i, "ab") for i in range(50)]
    rows += [(900, "hello world"), (901, "hello worlq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, max_dist=1, max_gram_df=None).collect()
    }
    want = {(900, 901, 1)}
    want |= {(i, j, 0) for i in range(50) for j in range(i + 1, 50)}
    want |= {(100 + i, 100 + j, 0) for i in range(50) for j in range(i + 1, 50)}
    assert got == want


def test_short_strings_match_bruteforce(spark):
    """Lengths straddling the q·(k+1) guarantee — below it the gram
    path is blind and the short bucket must carry completeness; the
    union must equal brute force exactly at every k."""
    import random

    rng = random.Random(11)
    alpha = "abcde"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2, 3):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, max_dist=k, max_gram_df=None).collect()
        }
        assert got == _brute(df, k), k
