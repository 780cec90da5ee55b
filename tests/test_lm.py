"""Interpolated bigram LM: differential vs a pure-Python reference,
direction (reference-like text scores lower), edge cases, determinism,
and plan gates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.lm import bigram_model, doc_nll, perplexity_filter

LAM = 0.9


@pytest.fixture(scope="module")
def ref(spark):
    rows = [(i, "the cat sat on the mat and the cat ran") for i in range(20)] + [
        (100 + i, "a dog ate the bone near the door") for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_nll(text, uni, bi, n_tokens, vocab, lam=LAM):
    toks = [t for t in text.split(" ") if t]
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return None, 0
    total = 0.0
    for w1, w2 in pairs:
        p_bi = bi.get((w1, w2), 0) / max(uni.get(w1, 0), 1)
        p_uni = (uni.get(w2, 0) + 1) / (n_tokens + vocab)
        total += -math.log(lam * p_bi + (1 - lam) * p_uni)
    return total / len(pairs), len(pairs)


def test_nll_matches_python_reference(spark, ref):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),       # in-domain
            (1, "quantum flux capacitor array"),  # out-of-domain
            (2, "the cat ate the bone"),          # mixed
            (3, "single"),                        # no bigrams
            (4, ""),                              # empty
        ],
        "doc_id long, text string",
    )
    model = bigram_model(ref)
    uni_df, bi_df, tot_df = model
    uni = {r["w"]: r["c"] for r in uni_df.collect()}
    bi = {(r["w1"], r["w2"]): r["c"] for r in bi_df.collect()}
    tot = tot_df.collect()[0]
    got = {r["id"]: r for r in doc_nll(docs, model).collect()}
    for r in docs.collect():
        want_nll, want_n = _py_nll(
            r["text"], uni, bi, tot["n_tokens"], tot["vocab"]
        )
        assert got[r["doc_id"]]["n_bigrams"] == want_n
        if want_nll is None:
            assert got[r["doc_id"]]["avg_nll"] is None
        else:
            assert got[r["doc_id"]]["avg_nll"] == pytest.approx(want_nll, abs=2e-6)


def test_reference_like_text_scores_lower(spark, ref):
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "zebra xylophone quark jigsaw")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["avg_nll"] for r in doc_nll(docs, bigram_model(ref)).collect()}
    assert got[0] < got[1] - 1.0


def test_perplexity_filter_keeps_tail_and_featureless(spark, ref):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "zebra xylophone quark jigsaw"),
            (2, "single"),
        ],
        "doc_id long, text string",
    )
    nlls = {r["id"]: r["avg_nll"] for r in doc_nll(docs, bigram_model(ref)).collect()}
    cut = (nlls[0] + nlls[1]) / 2
    kept = {r["doc_id"] for r in
            perplexity_filter(docs, ref, max_avg_nll=cut).collect()}
    assert kept == {0, 2}  # in-domain kept, junk dropped, no-evidence kept


def test_partition_independent(spark, ref):
    docs = ref.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    a = sorted(map(tuple, doc_nll(docs, bigram_model(ref)).collect()))
    b = sorted(map(tuple, doc_nll(
        docs.repartition(7), bigram_model(ref.repartition(5))
    ).collect()))
    assert a == b


def test_plan_gates(spark, ref):
    from cosmap_spark.operators.report import plan_summary

    s = plan_summary(doc_nll(ref, bigram_model(ref)))
    assert s["python_evals"] == 0 and s["arrow_evals"] == 0
    assert s["cartesian_products"] == 0
    # the 1-row totals crossJoin is the only nested-loop (scalar shape)
    assert s["nested_loop_joins"] <= 1


def test_empty_reference_raises_loudly(spark, ref):
    """A tokenless reference must fail the first action, not silently
    turn perplexity_filter into a keep-everything no-op (the
    SUM-over-zero-rows NULL trap)."""
    import pytest

    from cosmap_spark.operators.lm import perplexity_filter

    docs = spark.createDataFrame(
        [(1, "some document text here")], "doc_id long, text string"
    )
    empty_ref = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(Exception, match="reference corpus has no tokens"):
        perplexity_filter(docs, empty_ref, max_avg_nll=2.0).collect()
    tokenless = spark.createDataFrame([(9, "")], "doc_id long, text string")
    with pytest.raises(Exception, match="reference corpus has no tokens"):
        perplexity_filter(docs, tokenless, max_avg_nll=2.0).collect()
