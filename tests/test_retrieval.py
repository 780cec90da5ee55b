"""bm25_search: pure-python BM25 reference differential, ranking
sanity, and plan shape (query side broadcasts; top-k via ranked
window, no global sort)."""

from __future__ import annotations

import math

import pytest

from cosmap_spark.operators.retrieval import bm25_search


def _py_bm25(corpus: dict, query: str, k1=1.2, b=0.75):
    """Reference scores for every doc containing ≥1 query term."""
    tfs = {d: {} for d in corpus}
    for d, text in corpus.items():
        for t in text.split():
            tfs[d][t] = tfs[d].get(t, 0) + 1
    n = len(corpus)
    avgdl = sum(len(t.split()) for t in corpus.values()) / n
    out = {}
    for d, tf in tfs.items():
        s, hits = 0.0, 0
        for t in sorted(set(query.split())):
            if t not in tf:
                continue
            df = sum(1 for o in tfs.values() if t in o)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            dl = sum(tf.values())
            s += idf * tf[t] * (k1 + 1) / (tf[t] + k1 * (1 - b + b * dl / avgdl))
            hits += 1
        if hits:
            out[d] = (round(s, 6), hits)
    return out


@pytest.fixture()
def corpus(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown dog outpaces a quick fox",
        3: "lorem ipsum dolor sit amet consectetur adipiscing elit",
        4: "the dog sat on the mat with the dog",
        5: "fox fox fox fox fox",
    }
    return docs, spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )


def test_bm25_matches_python_reference(spark, corpus):
    docs, df = corpus
    queries = {"q1": "quick fox", "q2": "dog", "q3": "zebra"}
    got = {}
    for r in bm25_search(df, queries, top_n=10).collect():
        got.setdefault(r["query_id"], {})[r["doc_id"]] = (
            r["score"], r["n_hit"]
        )
    for qid, q in queries.items():
        assert got.get(qid, {}) == _py_bm25(docs, q), qid
    assert "q3" not in got  # no doc contains zebra


def test_bm25_top_n_and_tie_break(spark, corpus):
    docs, df = corpus
    out = bm25_search(df, {"q": "fox dog quick"}, top_n=2).collect()
    assert len(out) == 2
    ref = _py_bm25(docs, "fox dog quick")
    want = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:2]
    assert [(r["doc_id"], r["score"]) for r in
            sorted(out, key=lambda r: (-r["score"], r["doc_id"]))] \
        == [(d, s) for d, (s, _) in want]


def test_bm25_rare_term_outranks_common(spark):
    """A term in 1 of 50 docs must outscore a term in 40 of 50 at
    equal tf — the idf property retrieval exists for."""
    rows = []
    for i in range(50):
        parts = ["common"] if i < 40 else []
        if i == 7:
            parts.append("rareterm")
        parts += ["filler"] * (5 - len(parts))
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["query_id"]: r for r in bm25_search(
        df, {"rare": "rareterm", "comm": "common"}, top_n=1).collect()}
    assert out["rare"]["doc_id"] == 7
    assert out["rare"]["score"] > out["comm"]["score"]


def test_bm25_empty_queries_raise(spark, corpus):
    _, df = corpus
    with pytest.raises(ValueError, match="empty query set"):
        bm25_search(df, {})


def test_bm25_plan_shape(spark, corpus):
    """Query-side tables broadcast; the scored frame's top-k is a
    ranked window partitioned by query (never a one-task global
    sort), and no Python runs anywhere."""
    _, df = corpus
    plan = bm25_search(df, {"q": "quick fox"})._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    out = bm25_search(df, {"q": "quick fox"})
    out.collect()
    # executed AQE plan strings append the INITIAL plan after the
    # final one (the CLAUDE.md double-count caveat) — count only the
    # final section
    physical = out._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in physical
    # the equi-joined query-side tables (qterms, dfreq, lens) hash-
    # broadcast; only the 1-row stats frame may ride a BNLJ
    assert physical.count("BroadcastHashJoin") >= 3
    assert physical.count("BroadcastNestedLoopJoin") <= 1
