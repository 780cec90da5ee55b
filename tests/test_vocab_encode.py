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


def test_batched_merges_identical_when_disjoint(spark):
    """batch_merges=B must return the SEQUENTIAL merge list and
    encoding on a fixture whose hot pairs are symbol-disjoint (the
    declared identity regime), at ~B× fewer counting passes."""
    rows = [
        # four symbol-disjoint hot pairs with strictly ordered counts;
        # unique separators keep every NEWLY-CREATED pair (sep, a_b)
        # at count 1 — below min_count, so batching cannot diverge
        (0, "a b k1 a b k2 a b k3 a b k4 a b"),
        (1, "c d m1 c d m2 c d m3 c d"),
        (2, "e f n1 e f n2 e f"),
        (3, "g h p1 g h"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s_seq: dict = {}
    s_bat: dict = {}
    seq = train_bpe(docs, n_merges=4, _stats=s_seq)
    bat = train_bpe(docs, n_merges=4, batch_merges=4, _stats=s_bat)
    assert seq == bat == [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")]
    assert s_seq["passes"] == 4 and s_bat["passes"] == 1
    a = sorted((r["doc_id"], tuple(r["bpe_tokens"]))
               for r in bpe_encode(docs, seq).collect())
    b = sorted((r["doc_id"], tuple(r["bpe_tokens"]))
               for r in bpe_encode(docs, bat).collect())
    assert a == b


def test_batched_merges_skip_interacting_candidates(spark):
    """Within one batch, a candidate sharing a symbol with an accepted
    merge must be DEFERRED to the next pass (merging it on the stale
    count would be wrong), and the final merge list still equals the
    sequential one here — the deferred pair's count is unaffected by
    the winner on this fixture, just re-counted before acceptance."""
    rows = [
        (0, "a b a b a b a b"),   # (a,b): 4, (b,a): 3
        (1, "b c b c b c"),       # (b,c): 3 — shares b with (a,b)
        (2, "x y x y"),           # (x,y): 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s: dict = {}
    bat = train_bpe(docs, n_merges=3, batch_merges=3, _stats=s)
    seq = train_bpe(docs, n_merges=3)
    # pass 1's top-3 is (a,b):4, (b,a):3, (b,c):3 — only (a,b) accepted
    # (the rest share b); pass 2's recount surfaces (a_b,a_b):3 — the
    # NEW pair the merge created — plus the deferred (b,c):3, both
    # accepted (disjoint); identical to the sequential order here
    assert bat == seq == [("a", "b"), ("a_b", "a_b"), ("b", "c")]
    assert s["passes"] == 2
    # validation
    import pytest

    with pytest.raises(ValueError, match="batch_merges"):
        train_bpe(docs, batch_merges=0)


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


def test_encoder_trainer_parity_multi_space(spark):
    """Repeated/leading/trailing spaces: tokens() keeps empty tokens,
    so the one-pass encoder must too — filtering them let it merge
    across gaps the trainer never counted."""
    from cosmap_spark.operators.vocab import apply_bpe_merge, bpe_encode

    df = spark.createDataFrame(
        [(1, "a  b"), (2, " a b"), (3, "a b  a b"), (4, "")],
        "doc_id long, text string",
    )
    merges = [("a", "b")]
    chained = apply_bpe_merge(df, "a", "b")
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    want = {
        r["doc_id"]: [t for t in r["text"].split(" ")] if r["text"] else []
        for r in chained.collect()
    }
    assert got == want, (got, want)
    # the double-space doc stays unmerged in both implementations
    assert got[1] == ["a", "", "b"]
    assert got[3] == ["a_b", "", "a_b"]
