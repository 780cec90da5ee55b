"""Vocabulary induction over a corpus (SURVEY.md §2.5, round 3).

The distributed half of BPE-style tokenizer training: the per-iteration
work — corpus-wide symbol-pair frequency counting and applying a chosen
merge — is embarrassingly parallel DataFrame work and dominates the
cost; the argmax/merge-table bookkeeping between iterations is
driver-side and O(vocab), exactly like every published BPE trainer
(Sennrich et al. 2016).  All JVM-side: higher-order functions build the
pair stream per row, one groupBy counts it.

At 100 TB: ``bpe_pair_counts`` is one explode + one partially-aggregated
groupBy on pair strings — the shuffle carries (pair, partial-count)
after map-side combine, bounded by per-task distinct pairs (vocab²-ish
worst case, vocab-sized in practice), never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmap_spark.functions.text import tokens


def token_vocab(
    df: DataFrame, *, text_col: str = "text", top_n: int | None = None
) -> DataFrame:
    """Corpus token histogram ``[token, n]`` — the vocabulary a
    word-level tokenizer (or a BPE trainer's symbol seed) starts from.

    One explode + one groupBy (map-side combine makes hot tokens cheap);
    ``top_n`` adds a ``TakeOrderedAndProject`` (never a global sort) with
    a deterministic (count desc, token asc) tie-break.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    if top_n is not None:
        counts = counts.orderBy(F.col("n").desc(), F.col("token")).limit(top_n)
    return counts


def _adjacent_pairs(t):
    """array<string> of space-joined adjacent token pairs; empty for
    single-token rows (guarded — an unguarded slice(size-1) descends,
    the short-doc hazard every sequence op here guards against)."""
    n = F.size(t)
    zipped = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n >= 2, zipped).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(
    df: DataFrame, *, text_col: str = "text", top_n: int | None = None
) -> DataFrame:
    """Adjacent-symbol-pair frequencies across the corpus — ONE BPE
    training iteration's statistics: ``[left, right, n]``, optionally
    the deterministic top-``top_n`` merge candidates (count desc, then
    (left, right) asc, so ties never depend on partitioning).
    """
    pairs = (
        df.select(F.explode(_adjacent_pairs(tokens(F.col(text_col)))).alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("n"))
        .select(
            F.split_part(F.col("p"), F.lit(" "), F.lit(1)).alias("left"),
            F.split_part(F.col("p"), F.lit(" "), F.lit(2)).alias("right"),
            "n",
        )
    )
    if top_n is not None:
        pairs = pairs.orderBy(
            F.col("n").desc(), F.col("left"), F.col("right")
        ).limit(top_n)
    return pairs


def apply_bpe_merge(
    df: DataFrame,
    left: str,
    right: str,
    *,
    text_col: str = "text",
    joiner: str = "_",
) -> DataFrame:
    """Apply one BPE merge ``(left, right) -> left+joiner+right`` to the
    whole corpus, greedy left-to-right (the BPE convention: in
    ``a a a`` the merge ``(a, a)`` produces ``a_a a``, not ``a a_a``).

    Implemented as a per-row ``aggregate`` fold over the token array —
    state is (merged-so-far, pending-token); no UDF, no shuffle.  The
    fold appends one element per step, so cost is linear per row with
    Spark's copy-on-append array semantics bounded by row size — fine
    while documents fit a row (the same regime as every per-row text op
    here).
    """
    t = tokens(F.col(text_col))
    merged_tok = F.lit(left + joiner + right)

    fold = F.aggregate(
        t,
        F.struct(
            F.array().cast("array<string>").alias("acc"),
            F.lit(None).cast("string").alias("pend"),
        ),
        lambda st, x: F.when(
            st["pend"].isNull(), F.struct(st["acc"].alias("acc"), x.alias("pend"))
        )
        .when(
            (st["pend"] == F.lit(left)) & (x == F.lit(right)),
            # merge consumes BOTH symbols: the merged token is committed
            # (it can't merge again with the next symbol — BPE applies one
            # merge rule per pass) and pend resets
            F.struct(
                F.concat(st["acc"], F.array(merged_tok)).alias("acc"),
                F.lit(None).cast("string").alias("pend"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(st["acc"], F.array(st["pend"])).alias("acc"),
                x.alias("pend"),
            )
        ),
        lambda st: F.when(
            st["pend"].isNull(), st["acc"]
        ).otherwise(F.concat(st["acc"], F.array(st["pend"]))),
    )
    return df.withColumn(text_col, F.concat_ws(" ", fold))


def train_bpe(
    df: DataFrame,
    *,
    n_merges: int = 50,
    text_col: str = "text",
    joiner: str = "_",
    min_count: int = 2,
    checkpoint_every: int = 8,
    batch_merges: int = 1,
    _stats: dict | None = None,
) -> list[tuple[str, str]]:
    """The full BPE training loop (Sennrich et al. 2016): repeatedly
    count adjacent-pair frequencies across the corpus, merge the argmax
    pair, until ``n_merges`` rules exist or no pair reaches
    ``min_count``.  Returns the ORDERED merge list for
    :func:`bpe_encode`.

    Per counting pass the corpus-side work is exactly one
    ``bpe_pair_counts`` job (explode + map-side-combined groupBy) plus
    the lazy merge rewrite; only the top rows reach the driver.
    ``apply_bpe_merge`` stacks one ``aggregate`` fold per rule onto the
    plan, so lineage is truncated every ``checkpoint_every`` merges
    (``localCheckpoint`` — the same discipline as
    ``dedup.dedup_clusters``); without it 50 nested folds overwhelm the
    analyzer long before the data does.

    ``batch_merges=B`` (> 1) accepts up to B merges per counting pass —
    the standard trainer batching that cuts the driver-loop latency
    ~B×: the pass's top-B candidates are scanned in count order and a
    candidate is ACCEPTED iff its symbols are disjoint from every
    symbol of the merges already accepted this pass (disjointness
    guarantees its counted frequency is still exact after applying
    them).  Interacting candidates are skipped, not merged on a stale
    count — they are re-counted and reconsidered next pass.

    Divergence policy (documented, deterministic): batched training
    equals the sequential (B=1) merge list whenever, within each
    batch, no pair NEWLY CREATED by an earlier accepted merge (such a
    pair contains the merged token) outranks a later accepted one —
    new pairs are only visible at the next pass's recount, so the
    canonical Sennrich sequence could interleave one between two
    batch members.  On fixtures without such interleavings the lists
    are identical (pinned in tests/test_vocab.py); where they differ,
    the batched list is still a valid greedy-BPE vocabulary (every
    accepted merge was the top remaining pair under exact counts at
    its acceptance), the tokenizer-quality regime all published
    batched trainers accept.

    Cost model is the honest one from the paper: training makes
    O(n_merges / batch_merges) passes over the corpus.  At 100 TB,
    train on a deterministic sample (``sampler.exact_k_sample``) —
    vocabulary statistics converge long before corpus scale — then
    ``bpe_encode`` the full corpus in ONE pass.  ``_stats``, when a
    dict, receives ``{"passes": n}`` (measurement hook, not API)."""
    if batch_merges < 1:
        raise ValueError("batch_merges must be >= 1")
    merges: list[tuple[str, str]] = []
    cur = df.select(text_col)
    passes = 0
    next_ckpt = checkpoint_every
    while len(merges) < n_merges:
        want = min(batch_merges, n_merges - len(merges))
        top = bpe_pair_counts(cur, text_col=text_col, top_n=want).collect()
        passes += 1
        accepted: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in top:
            if r["n"] < min_count:
                break  # count-ordered: everything below is too rare
            left, right = r["left"], r["right"]
            if left in used or right in used:
                continue  # interacts with an accepted merge: next pass
            accepted.append((left, right))
            used.update((left, right, left + joiner + right))
        if not accepted:
            break
        for left, right in accepted:
            merges.append((left, right))
            cur = apply_bpe_merge(
                cur, left, right, text_col=text_col, joiner=joiner
            )
            if len(merges) >= next_ckpt:
                cur = cur.localCheckpoint(eager=False)
                next_ckpt += checkpoint_every
    if _stats is not None:
        _stats["passes"] = passes
    return merges


def _bpe_encode_tokens(toks: list, merges: list[tuple[str, str]], joiner: str) -> list:
    """Pure-Python single-document BPE application — one greedy
    left-to-right pass per rule, in rule order: EXACTLY
    ``apply_bpe_merge``'s semantics (a merged token cannot re-merge
    within its own rule's pass, but can in a later rule's).  Shared by
    the Arrow kernel and the differential test's reference."""
    for left, right in merges:
        merged = left + joiner + right
        out: list = []
        pend = None
        for x in toks:
            if pend is None:
                pend = x
            elif pend == left and x == right:
                out.append(merged)
                pend = None
            else:
                out.append(pend)
                pend = x
        if pend is not None:
            out.append(pend)
        toks = out
    return toks


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    joiner: str = "_",
) -> DataFrame:
    """Apply a TRAINED merge list to the whole corpus in one pass —
    the serving half of tokenizer training, appending ``out_col``
    (array<string>).

    ``apply_bpe_merge`` is the trainer's rewrite (one corpus pass per
    rule — O(n_merges) passes if chained); real tokenization applies
    the full rule list per document in one scan.  That inner loop is
    genuinely imperative (merge-until-done with rule precedence), i.e.
    the documented Arrow exception: a pandas UDF over token arrays,
    O(vocab) merge list shipped once in the closure, no join, no
    shuffle.  Parity with the chained-``apply_bpe_merge`` rewrite is
    asserted in tests/test_vocab_encode.py."""
    m = list(merges)

    @F.pandas_udf("array<string>")
    def _enc(texts):
        import pandas as pd

        # keep empty tokens: tokens() (the trainer's stream) is a
        # single-space split that PRESERVES empties on repeated
        # spaces — filtering them here would let the encoder merge
        # across multi-space gaps the trainer never counted, breaking
        # the asserted chained-rewrite parity on any multi-spaced text
        return pd.Series(
            [
                _bpe_encode_tokens(
                    s.split(" ") if s else [], m, joiner
                )
                for s in texts
            ]
        )

    return df.withColumn(out_col, _enc(F.col(text_col)))
