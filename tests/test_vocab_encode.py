"""BPE train loop + one-pass corpus encode: trainer/encoder parity
(the Arrow kernel must equal the chained DataFrame rewrite), expected
merges on a planted corpus, determinism, and plan gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmap_spark.operators.vocab import (
    _bpe_encode_tokens,
    apply_bpe_merge,
    bpe_encode,
    train_bpe,
)


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the rat"),
        (2, "a cat and the cat sat"),
        (3, "the cat the cat the cat"),
        (4, "on the mat sat a rat"),
        (5, ""),
        (6, "cat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_learns_the_hot_pair_first(spark):
    merges = train_bpe(_docs(spark), n_merges=3)
    assert merges[0] == ("the", "cat"), merges
    assert len(merges) == 3


def test_encode_matches_chained_rewrite(spark):
    """bpe_encode (one Arrow pass, full rule list) must equal the
    trainer's own representation: apply_bpe_merge chained per rule."""
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=4)
    chained = docs
    for left, right in merges:
        chained = apply_bpe_merge(chained, left, right)
    want = {r["doc_id"]: [t for t in r["text"].split(" ") if t]
            for r in chained.collect()}
    got = {r["doc_id"]: list(r["bpe_tokens"])
           for r in bpe_encode(docs, merges).collect()}
    assert got == want


def test_encode_rule_precedence_and_rechaining():
    """A merged token participates in LATER rules (the b_c → a_b_c
    chain) but never re-merges within its own rule's pass."""
    toks = "a b c".split()
    assert _bpe_encode_tokens(toks, [("b", "c"), ("a", "b_c")], "_") == ["a_b_c"]
    # greedy left-to-right: in `a a a`, rule (a, a) gives `a_a a`
    assert _bpe_encode_tokens(["a", "a", "a"], [("a", "a")], "_") == ["a_a", "a"]


def test_encode_partition_independent(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=4)
    a = sorted((r["doc_id"], tuple(r["bpe_tokens"]))
               for r in bpe_encode(docs, merges).collect())
    b = sorted((r["doc_id"], tuple(r["bpe_tokens"]))
               for r in bpe_encode(docs.repartition(5), merges).collect())
    assert a == b


def test_encode_plan_is_one_arrow_pass(spark):
    from cosmap_spark.operators.report import plan_summary

    s = plan_summary(bpe_encode(_docs(spark), [("the", "cat")]))
    assert s["python_evals"] == 0
    assert s["arrow_evals"] == 1
    assert s["exchanges"] == 0
    assert s["cartesian_products"] == 0 and s["nested_loop_joins"] == 0
