"""ExactSubstr dedup: differential vs a pure-Python reference with the
identical removal policy, structural cases (cross-doc, within-doc,
overlap merging, short docs), determinism, and plan gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.dedup import substring_dedup

L = 5


def _ref(docs: dict[int, str], length: int) -> dict[int, tuple[int, int, str]]:
    """Pure-Python reference: same policy — every occurrence of a
    duplicated length-window except the global (doc, pos) first is a
    loser span; a position is dropped iff covered by a loser span."""
    toks = {d: [t for t in s.split(" ") if t] for d, s in docs.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - length + 1):
            occ.setdefault(tuple(t[p:p + length]), []).append((d, p))
    spans: dict[int, set[int]] = {d: set() for d in toks}
    for places in occ.values():
        if len(places) < 2:
            continue
        winner = min(places)
        for d, p in places:
            if (d, p) != winner:
                spans[d].update(range(p, p + length))
    out = {}
    for d, t in toks.items():
        kept = [x for i, x in enumerate(t) if i not in spans[d]]
        out[d] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


def _run(spark, docs: dict[int, str], length: int = L):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in substring_dedup(df, length=length).collect()
    }


def test_matches_reference_on_planted_corpus(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = {
        0: f"alpha beta {shared} gamma delta",
        1: f"one two three four five six {shared} seven eight",
        2: "completely unrelated words with no duplication at all here",
        3: f"{shared} {shared}",          # within-doc repeat
        4: "tiny doc",                     # shorter than L: untouched
        5: "",                             # empty
    }
    got = _run(spark, docs)
    want = _ref(docs, L)
    assert got == want
    # sanity on the reference itself: doc 0 keeps the shared passage
    # (global first), doc 1 and doc 3's second copy lose it
    assert want[0][1] == 0
    assert want[1][1] > 0
    assert want[2][1] == 0 and want[4][1] == 0


def test_overlapping_windows_merge_into_one_span(spark):
    # a 12-token duplicated run produces 8 overlapping loser windows in
    # doc 1 that must merge into ONE maximal span of exactly 12 tokens
    run = "a b c d e f g h i j k l"
    docs = {0: f"x {run} y", 1: f"p q {run} r s"}
    got = _run(spark, docs)
    assert got == _ref(docs, L)
    assert got[1] == (16, 12, "p q r s")
    assert got[0][1] == 0


def test_randomized_differential(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 9)))
        for _ in range(4)
    ]
    docs = {}
    for d in range(25):
        parts = []
        for _ in range(rng.randint(0, 4)):
            parts.append(
                rng.choice(passages) if rng.random() < 0.5
                else " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
            )
        docs[d] = " ".join(parts)
    assert _run(spark, docs) == _ref(docs, L)


def test_partition_independent(spark):
    docs = {i: f"c{i} common phrase tokens here exactly five x{i}" for i in range(20)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    a = sorted(map(tuple, substring_dedup(df, length=L).collect()))
    b = sorted(map(tuple, substring_dedup(df.repartition(7), length=L).collect()))
    assert a == b


def test_plan_gates(spark):
    from cosmap_spark.operators.report import plan_summary

    df = spark.createDataFrame(
        [(i, "some words repeated here again and again") for i in range(10)],
        "doc_id long, text string",
    )
    s = plan_summary(substring_dedup(df, length=L))
    # exactly the two rolling-hash lanes (dedup._rolling_hash_kernel),
    # nothing row-at-a-time
    assert s["python_evals"] == 0 and s["arrow_evals"] == 2
    assert s["cartesian_products"] == 0 and s["nested_loop_joins"] == 0


def test_rolling_hash_kernel_matches_direct_polynomial(spark):
    """The O(n) cumulative-ops form must equal the definition
    H(s) = Σⱼ t[s+j]·Bʲ (mod 2⁶⁴) computed directly per window, across
    variable-length docs in one batch (exercises the flattened-offsets
    indexing and the doc-boundary mask)."""
    import numpy as np
    import pandas as pd

    from cosmap_spark.operators.dedup import _ROLL_B1, _rolling_hash_kernel

    rng = np.random.default_rng(3)
    rows = [rng.integers(-(2**63), 2**63, size=m).astype(np.int64)
            for m in (L, L + 1, L + 7, L, L + 3)]
    roll = _rolling_hash_kernel(L, _ROLL_B1)
    got = roll.func(pd.Series(rows))
    B = np.uint64(_ROLL_B1)
    bpow = np.empty(L, dtype=np.uint64)
    bpow[0] = 1
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is the point
        for j in range(1, L):
            bpow[j] = bpow[j - 1] * B
    for arr, g in zip(rows, got):
        t = arr.view(np.uint64)
        want = [int(((t[s:s + L] * bpow).sum()))
                for s in range(len(t) - L + 1)]
        assert [int(np.uint64(x)) for x in np.asarray(g, dtype=np.int64).view(np.uint64)] == want
