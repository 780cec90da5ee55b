"""Corpus n-gram language-model scoring — the perplexity-filter shape.

CCNet (Wenzek et al. 2020) ranks documents by the perplexity of a
KenLM 5-gram model and keeps the low-perplexity tail; the distributed
half of that recipe is (a) n-gram count statistics over a reference
corpus and (b) per-document NLL scoring against them — both plain
DataFrame aggregations/joins.  This module implements the shape at
bigram order with interpolated unigram backoff:

    p(w₂|w₁) = λ · c(w₁w₂)/c(w₁·)  +  (1−λ) · p_uni(w₂)
    p_uni(w) = (c(w)+1) / (N + V)            (Laplace)

Higher orders are the same plan with longer keys (the count tables and
the scoring join key just widen); KenLM-style Kneser-Ney discounts are
a different smoothing FORMULA over the same count tables, so the
distributed shape shown here is the one that scales, whatever the
smoothing.

Scale shape:

* count tables: one explode + map-side-combined groupBy each —
  output bounded by DISTINCT n-grams, not corpus size;
* scoring: the document's bigram stream left-joins the model tables —
  hash joins on (w1, w2)/(w1)/(w2); the model tables are
  vocabulary-sized, usually broadcastable, but the join is left to AQE
  because a 100 TB reference corpus's bigram table may not be;
* per-doc reduction: one map-side-combined groupBy(doc).

The trained-model/unigram machinery this complements: q_tfidf's
unigram-LM NLL (gate-checked), the hashed-BoW quality classifier
(operators/classifier.py), and DSIR (operators/dsir.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmap_spark.functions.text import tokens
from cosmap_spark.operators.vocab import _adjacent_pairs


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    t = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    return df.select(F.col(id_col).alias("id"), t.alias("t"))


def bigram_model(
    reference: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count statistics of the reference corpus:
    ``(unigrams[w, c], bigrams[w1, w2, c], totals[n_tokens, vocab])``.
    Each is one explode + one map-side-combined groupBy; outputs are
    distinct-n-gram-sized."""
    toks = _doc_tokens(reference, text_col, id_col)
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bi = (
        toks.select(F.explode(_adjacent_pairs(F.col("t"))).alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("c"))
        .select(
            F.split_part(F.col("p"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("p"), F.lit(" "), F.lit(2)).alias("w2"),
            "c",
        )
    )
    # SUM over zero rows is NULL (CLAUDE.md): coalesce, and refuse a
    # tokenless reference IN-PLAN — otherwise a NULL n_tokens turns
    # every downstream nll NULL and perplexity_filter's keep-null
    # branch silently passes EVERY document (a no-op filter is worse
    # than a loud one)
    totals = uni.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_tokens"),
        F.count("*").alias("vocab"),
    ).select(
        "n_tokens",
        F.when(F.col("vocab") > 0, F.col("vocab")).otherwise(
            F.raise_error(F.lit(
                "bigram_model: reference corpus has no tokens — an LM "
                "over an empty reference scores nothing; fix the "
                "reference or skip the perplexity filter"
            ))
        ).alias("vocab"),
    )
    return uni, bi, totals


def doc_nll(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.9,
) -> DataFrame:
    """Per-document average bigram negative log-likelihood under the
    interpolated model: ``[id, n_bigrams, avg_nll]`` (6 dp; documents
    with < 2 tokens get null avg_nll — no bigram evidence either way).

    Unseen words/bigrams are handled by the interpolation itself: the
    unigram term is Laplace-smoothed over (N, V), so every probability
    is strictly positive without any out-of-vocabulary special case.
    Low avg_nll ≈ reference-like text — threshold or quantile-cut for
    the CCNet head/middle/tail split (``equi_depth_bin`` gives the
    corpus-level cut points)."""
    uni, bi, totals = model
    toks = _doc_tokens(docs, text_col, id_col)
    stream = toks.select(
        "id", F.explode(_adjacent_pairs(F.col("t"))).alias("p")
    ).select(
        "id",
        F.split_part(F.col("p"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("p"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    w1c = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_w1"))
    w2c = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_w2"))
    scored = (
        stream.join(bi, ["w1", "w2"], "left")
        .join(w1c, "w1", "left")
        .join(w2c, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            (
                -F.log(
                    F.lit(lam)
                    * (
                        F.coalesce(F.col("c"), F.lit(0)).cast("double")
                        / F.greatest(F.coalesce(F.col("c_w1"), F.lit(0)), F.lit(1)).cast("double")
                    )
                    + F.lit(1.0 - lam)
                    * (
                        (F.coalesce(F.col("c_w2"), F.lit(0)) + F.lit(1)).cast("double")
                        / (F.col("n_tokens") + F.col("vocab")).cast("double")
                    )
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "avg_nll",
    )


def perplexity_filter(
    docs: DataFrame,
    reference: DataFrame,
    *,
    max_avg_nll: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.9,
) -> DataFrame:
    """CCNet-style keep-the-reference-like-tail filter: documents whose
    average bigram NLL under the reference model is ≤ ``max_avg_nll``
    (documents with no bigram evidence are kept — length rules, not LM
    rules, should judge them).  Returns the surviving rows of ``docs``
    with ``avg_nll`` attached."""
    nll = doc_nll(
        docs, bigram_model(reference, text_col=text_col, id_col=id_col),
        text_col=text_col, id_col=id_col, lam=lam,
    )
    return (
        docs.join(nll.withColumnRenamed("id", id_col), id_col)
        .where(F.col("avg_nll").isNull() | (F.col("avg_nll") <= max_avg_nll))
        .drop("n_bigrams")
    )
