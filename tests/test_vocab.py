"""BPE vocabulary-induction operators: pair counts vs a Python
reference, merge semantics (greedy left-to-right), and invariants."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cosmap_spark.operators.vocab import (
    apply_bpe_merge,
    bpe_pair_counts,
    token_vocab,
)
from cosmap_spark.tables import load_table


def _py_pairs(texts):
    c = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            c[(a, b)] += 1
    return c


def test_pair_counts_match_python_reference(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    texts = [r["text"] for r in docs.collect()]
    expect = _py_pairs(texts)
    got = {
        (r["left"], r["right"]): r["n"] for r in bpe_pair_counts(docs).collect()
    }
    assert got == dict(expect)


def test_pair_counts_top_n_deterministic(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    top = [
        (r["left"], r["right"], r["n"])
        for r in bpe_pair_counts(docs, top_n=10).collect()
    ]
    expect = sorted(
        [(a, b, n) for (a, b), n in _py_pairs(
            [r["text"] for r in docs.collect()]
        ).items()],
        key=lambda x: (-x[2], x[0], x[1]),
    )[:10]
    assert top == expect


def test_single_token_docs_yield_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], ["doc_id", "text"]
    )
    got = {(r["left"], r["right"]): r["n"] for r in bpe_pair_counts(docs).collect()}
    assert got == {("a", "b"): 1}


def test_vocab_totals(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    v = token_vocab(docs)
    total = v.agg(F.sum("n")).collect()[0][0]
    expect = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).collect()[0]["s"]
    assert total == expect
    top = token_vocab(docs, top_n=5).collect()
    assert len(top) == 5
    assert all(
        top[i]["n"] >= top[i + 1]["n"] for i in range(len(top) - 1)
    )


def test_apply_merge_greedy_left_to_right(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a"),
            (2, "x a a y a a"),
            (3, "a b a a"),
            (4, "solo"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["text"]
        for r in apply_bpe_merge(docs, "a", "a").collect()
    }
    assert got == {
        1: "a_a a",
        2: "x a_a y a_a",
        3: "a b a_a",
        4: "solo",
    }


def test_merge_reduces_pair_count_by_frequency(spark):
    """After merging the most frequent pair, its count drops to the
    leftover overlaps only — the BPE training-loop invariant."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    best = bpe_pair_counts(docs, top_n=1).collect()[0]
    merged = apply_bpe_merge(docs, best["left"], best["right"])
    after = {
        (r["left"], r["right"]): r["n"] for r in bpe_pair_counts(merged).collect()
    }
    assert after.get((best["left"], best["right"]), 0) < best["n"]
