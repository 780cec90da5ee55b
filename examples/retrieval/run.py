"""Runnable hybrid-retrieval walkthrough — the round-5 retrieval
stack end-to-end on the documents + embeddings tables:

    python examples/retrieval/run.py [sf_dir]

The test tables are i.i.d. draws over a tiny vocabulary (no document
is lexically distinctive — the same reason the dedup gate queries
plant deterministic twins), so the probes are PLANTED: three extra
documents carrying unique rare terms, and three slightly-perturbed
copies of real embeddings, unioned into the corpora.

1. **lexical** — `bm25_search` for each rare term must rank its
   planted document first (the idf property doing its job against
   500 distractors that share every other token);
2. **vector** — exact cosine top-k (`knn.knn_bruteforce`) queried by
   the planted vectors (query ids offset so the operator's
   self-exclusion keys differ) — self-retrieval at sim 1.0, rank 1;
3. **hybrid** — `rrf_fuse` of the two lists: the planted id, ranked
   first by both, dominates every fused ranking;
4. **eval** — `retrieval_eval` against the planted qrels:
   MRR = nDCG@10 = 1.0 for every query on all three systems;
5. **persisted index** (round 6) — `save_lex_index` once,
   `lex_append` a fresh batch (one of the planted docs arrives
   late), then `bm25_search(prebuilt=load_lex_index(...))` —
   row-identical to the inline search, with zero re-tokenization of
   history;
6. **graded eval** (round 6) — graded qrels (the planted doc grade 3,
   a decoy sharing the filler tokens grade 1): exponential-gain
   nDCG@10 stays 1.0 only while the system ranks the grade-3 doc
   above the grade-1 decoy.

Everything distributed-side is the tested operator surface
(tests/test_retrieval.py, tests/test_dedup_knn.py,
tests/test_index_store.py); this file only composes it."""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cosmap_spark.operators.knn import knn_bruteforce  # noqa: E402
from cosmap_spark.operators.retrieval import (  # noqa: E402
    bm25_search,
    retrieval_eval,
    rrf_fuse,
)
from cosmap_spark.session import get_spark  # noqa: E402
from cosmap_spark.tables import load_table  # noqa: E402

PLANT_BASE = 900_000          # planted corpus ids
OFFSET = 1_000_000_000        # query-id shift: self-exclusion never fires
RARE = ["xylophone", "quasar", "bimetallic"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="retrieval-example",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8",
                    "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # plant three lexically-distinctive docs and three near-copy vectors
    filler = "the data table row query join"
    planted_docs = spark.createDataFrame(
        [(PLANT_BASE + i, f"{filler} {t} {filler}")
         for i, t in enumerate(RARE)],
        "doc_id long, text string",
    )
    corpus_docs = docs.select("doc_id", "text").unionByName(planted_docs)
    base_vecs = emb.orderBy("vec_id").limit(3).collect()
    # perturb hard enough that cosine-to-source rounds below 1.0 at the
    # operator's 6 dp (a 1% nudge would tie with the original and lose
    # the id tie-break); the planted vector still self-matches at 1.0
    planted_emb = spark.createDataFrame(
        [
            (PLANT_BASE + i,
             [v * (3.0 if j == 0 else 1.0)
              for j, v in enumerate(r["embedding"])])
            for i, r in enumerate(base_vecs)
        ],
        "vec_id long, embedding array<double>",
    )
    corpus_emb = emb.select("vec_id", "embedding").unionByName(planted_emb)

    # each query carries two REAL corpus tokens alongside the rare
    # term, so the bm25 lists contain genuine distractors — a
    # rare-term-only query retrieves exactly the planted doc (nothing
    # else contains it) and every ranking assertion below would be
    # vacuously true with a single candidate
    real_toks = docs.orderBy("doc_id").first()["text"].split(" ")[:2]
    queries = {
        f"q{i}": f"{t} {real_toks[0]} {real_toks[1]}"
        for i, t in enumerate(RARE)
    }
    truth = {f"q{i}": PLANT_BASE + i for i in range(len(RARE))}
    print(f"{len(queries)} planted probes over "
          f"{corpus_docs.count()} documents")

    # 1. lexical ---------------------------------------------------------
    lex = bm25_search(corpus_docs, queries, top_n=10)
    sizes = {r["query_id"]: r["n"] for r in lex.groupBy("query_id")
             .agg(F.count("*").alias("n")).collect()}
    assert all(n > 1 for n in sizes.values()), (
        "queries must retrieve real distractors", sizes)
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    top_lex = {
        r["query_id"]: r["doc_id"]
        for r in lex.withColumn("rn", F.row_number().over(w1))
        .where("rn = 1").collect()
    }
    assert top_lex == truth, (top_lex, truth)
    print("bm25_search: every rare term ranks its planted doc first")

    # 2. vector ----------------------------------------------------------
    qvecs = planted_emb.select(
        (F.col("vec_id") + OFFSET).alias("vec_id"), "embedding"
    )
    vec = knn_bruteforce(corpus_emb, qvecs, k=10).select(
        F.concat(
            F.lit("q"), (F.col("qid") - OFFSET - PLANT_BASE).cast("string")
        ).alias("query_id"),
        F.col("nid").alias("doc_id"),
        F.col("sim").alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    top_vec = {
        r["query_id"]: (r["doc_id"], r["score"])
        for r in vec.withColumn("rn", F.row_number().over(w2))
        .where("rn = 1").collect()
    }
    assert {q: d for q, (d, _) in top_vec.items()} == truth
    assert all(s == 1.0 for _, s in top_vec.values())
    print("knn_bruteforce: every planted vector self-retrieves at sim 1.0")

    # 3. hybrid ----------------------------------------------------------
    fused = rrf_fuse([lex, vec], top_n=5)
    fused_rows = fused.collect()
    for qid, did in truth.items():
        rows = sorted(
            [r for r in fused_rows if r["query_id"] == qid],
            key=lambda r: -r["rrf"],
        )
        assert rows[0]["doc_id"] == did and rows[0]["n_lists"] == 2
    print("rrf_fuse: the planted id tops every fused ranking")

    # 4. eval ------------------------------------------------------------
    qrels = spark.createDataFrame(
        list(truth.items()), "query_id string, doc_id long"
    )
    for name, res, sc in (("bm25", lex, "score"), ("knn", vec, "score"),
                          ("rrf", fused, "rrf")):
        ev = retrieval_eval(res, qrels, score_col=sc, k=10).collect()
        assert all(r["mrr"] == 1.0 and r["ndcg_at_k"] == 1.0 for r in ev)
        print(f"retrieval_eval[{name}]: MRR = nDCG@10 = 1.0 "
              f"for all {len(ev)} queries")

    # 5. persisted index (round 6) ----------------------------------------
    import tempfile

    from cosmap_spark.operators.index_store import (
        lex_append,
        load_lex_index,
        save_lex_index,
    )
    from cosmap_spark.operators.retrieval import build_lex_index

    scratch = tempfile.TemporaryDirectory(prefix="lexidx_")
    idx = os.path.join(scratch.name, "lex")
    # the last planted doc "arrives late": index history first, append.
    # lens=None on purpose: save_lex_index derives lengths from the
    # WRITTEN tf parquet, so the history corpus tokenizes exactly ONCE
    # (passing build_lex_index's lens frame would re-run a second full
    # tokenize during the save — its docstring's warning)
    late_id = PLANT_BASE + len(RARE) - 1
    save_lex_index(
        idx, build_lex_index(corpus_docs.where(F.col("doc_id") != late_id))[0]
    )
    lex_append(spark, idx, corpus_docs.where(F.col("doc_id") == late_id))
    served = bm25_search(
        None, queries, top_n=10, prebuilt=load_lex_index(spark, idx)
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, lex.collect())
    )
    print("persisted index: save + lex_append serves row-identical "
          "to the inline search (history never re-tokenized)")

    # 6. graded eval (round 6) --------------------------------------------
    # decoy = any real doc the bm25 list retrieved below the planted
    # doc (they all share the filler tokens); grade it 1 vs planted 3
    second = {
        r["query_id"]: r["doc_id"]
        for r in lex.withColumn("rn", F.row_number().over(w1))
        .where("rn = 2").collect()
    }
    graded_qrels = spark.createDataFrame(
        [(q, d, 3) for q, d in truth.items()]
        + [(q, d, 1) for q, d in second.items()],
        "query_id string, doc_id long, grade int",
    )
    gev = retrieval_eval(
        lex, graded_qrels, k=10, grade_col="grade"
    ).collect()
    assert all(len(second) == len(truth) for _ in [0]), (
        "every query needs a real rank-2 decoy", second)
    assert all(r["ndcg_at_k"] == 1.0 for r in gev), gev
    assert all(r["recall_at_k"] == 1.0 for r in gev)
    print("graded eval: exponential-gain nDCG@10 = 1.0 with the "
          "grade-3 planted doc ranked above its grade-1 decoy")

    # 7. quoted-phrase + RM3 expansion (round 7) --------------------------
    # phrase: "<rare> the data" occurs ONLY in each planted doc (the
    # rare term sits mid-text, followed by the filler restart) — exact
    # adjacency must return exactly it, while the bag-of-words list is
    # full of filler-sharing distractors
    from cosmap_spark.operators.retrieval import (
        bm25_search_weighted,
        phrase_search,
        rm3_expand,
    )

    phrase_qs = {f"p{i}": f"{t} the data" for i, t in enumerate(RARE)}
    ph = phrase_search(corpus_docs, phrase_qs, top_n=5)
    got_ph = {r["query_id"]: r["doc_id"] for r in ph.collect()}
    assert got_ph == {
        f"p{i}": PLANT_BASE + i for i in range(len(RARE))
    }, got_ph
    print("phrase_search: each quoted rare bigram returns exactly its "
          "planted doc (exact adjacency from the positional index)")

    # rm3: expansion terms come from the planted doc's own vocabulary,
    # so the original rare term keeps the dominant weight and the
    # planted doc stays rank 1 after the weighted second pass
    from cosmap_spark.operators.retrieval import bm25_scored

    sc1 = bm25_scored(corpus_docs, queries)
    # docs= pushes the feedback-doc and expansion-vocabulary filters
    # BELOW the (doc, term) aggregation (round 8 — a join above an
    # aggregate can't push through it); inline tf is only the right
    # input for a PERSISTED index
    expanded = rm3_expand(
        sc1, None, queries, fb_docs=3, fb_terms=8, docs=corpus_docs
    )
    rm3 = bm25_search_weighted(corpus_docs, expanded, top_n=5)
    w1_rm3 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    first_rm3 = {
        r["query_id"]: r["doc_id"]
        for r in rm3.withColumn("rn", F.row_number().over(w1_rm3))
        .where("rn = 1").collect()
    }
    assert first_rm3 == truth, first_rm3
    print("rm3_expand + bm25_search_weighted: expansion keeps the "
          "planted doc rank 1 (no collect between the two passes)")

    spark.stop()
    print("retrieval example: all invariants hold")


if __name__ == "__main__":
    main()
