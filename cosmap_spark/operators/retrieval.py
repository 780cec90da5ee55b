"""Lexical retrieval: Okapi BM25 scoring and top-k search.

The search-engine member of the text stack (TF-IDF/LM featurization
lives in queries/llm_ops.py::q_tfidf, which hash-checks the same
``bm25_weight`` expression per (doc, term) against DuckDB): given a
set of query strings, rank documents by BM25 — the standard lexical
baseline next to the embedding k-NN stack (operators/knn.py), and the
sparse half of a hybrid retriever.

Scale shape: the corpus tokenizes once into (doc, term, tf) with
per-document lengths (two map-side-combined aggregations); the
QUERY-term document frequencies are computed by filtering that table
to the query vocabulary BEFORE any shuffle (query-vocabulary-sized,
broadcasts); scoring is one broadcast join + one per-doc aggregation;
top-k cuts with orderBy+limit (TakeOrderedAndProject) per query.
Nothing corpus-sized shuffles except the one (doc, term) aggregation
every lexical index pays.

The reference has no text surface at all; this module is part of the
mandated beyond-reference pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cosmap_spark.functions.text import tokens


def bm25_weight(
    tf: Column,
    df: Column,
    n_docs: Column,
    doc_len: Column,
    avg_len: Column,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> Column:
    """The Okapi BM25 per-(doc, term) weight:
    ``idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with the
    Robertson–Spärck-Jones idf ``ln((N − df + 0.5)/(df + 0.5) + 1)``
    (the +1 keeps it positive for df > N/2, the Lucene convention).
    Pure column arithmetic — hash-checked against DuckDB at full
    (doc, term) granularity by q_tfidf's ``bm25`` column."""
    idf = F.log(
        (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
    )
    return idf * (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doc_len / avg_len)
    )


def bm25_search(
    docs: DataFrame,
    queries: dict[str, str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """Top ``top_n`` documents per query by BM25 —
    ``[query_id, doc_id, score, n_hit]`` (``n_hit`` = how many query
    terms the document contains; ties broken by id for a
    deterministic cut).

    ``queries`` maps query ids to whitespace-tokenized query strings
    (tokenization matches the corpus side's ``functions.text.tokens``;
    duplicate terms in one query count once — the standard bag-of-
    words-query BM25).  Scoring joins the corpus term table to a
    BROADCAST literal of query terms, so adding queries adds
    broadcast rows, never corpus work.
    """
    if not queries:
        raise ValueError("bm25_search: empty query set")
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("__d"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("__d", "term").agg(F.count("*").alias("tf"))
    lens = tf.groupBy("__d").agg(F.sum("tf").alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    qrows = [
        (qid, t)
        for qid, q in queries.items()
        for t in sorted(set(q.split()))
    ]
    qterms = spark.createDataFrame(qrows, "query_id string, term string")
    # df over the QUERY vocabulary only: filter before the aggregation
    qvocab = sorted({t for _, t in qrows})
    dfreq = (
        tf.where(F.col("term").isin(qvocab))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.where(F.col("term").isin(qvocab))
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(lens.withColumnRenamed("dl", "__dl")), "__d")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "__d")
        .agg(
            F.round(
                F.sum(
                    bm25_weight(
                        F.col("tf"), F.col("df"), F.col("n_docs"),
                        F.col("__dl"), F.col("avgdl"), k1=k1, b=b,
                    )
                ),
                6,
            ).alias("score"),
            F.count("*").alias("n_hit"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("__d").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_n)
        .select(
            "query_id",
            F.col("__d").alias(id_col),
            "score",
            F.col("n_hit").cast("long").alias("n_hit"),
        )
    )
