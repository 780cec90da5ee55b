"""Document chunking + markup stripping (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmap_spark.functions.text import chunk_text, strip_markup
from cosmap_spark.tables import load_table


def test_chunk_text_covers_every_token_with_overlap(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    toks = {
        r["doc_id"]: r["t"].split(" ")
        for r in docs.select("doc_id", F.col("text").alias("t")).collect()
    }
    chunks = chunk_text(docs, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(toks)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = len(toks[doc_id])
        covered = set()
        for r in rows:
            s, ln = r["chunk_start"], r["n_chunk_toks"]
            assert ln == min(64, n - s)
            # chunk text is exactly the token slice
            assert r["chunk"] == " ".join(toks[doc_id][s:s + 64])
            covered.update(range(s, s + ln))
        assert covered == set(range(n)), f"doc {doc_id} has coverage gaps"
        # consecutive chunks overlap by exactly 16 (starts step by 48)
        starts = [r["chunk_start"] for r in rows]
        assert all(b - a == 48 for a, b in zip(starts, starts[1:]))
        # no pure-overlap tail chunk
        if len(rows) > 1:
            assert rows[-1]["n_chunk_toks"] > 16


def test_chunk_text_short_doc_single_chunk(spark):
    docs = spark.createDataFrame(
        [(1, "just five little tokens here")], "doc_id long, text string"
    )
    rows = chunk_text(docs, chunk_tokens=64, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk"] == "just five little tokens here"
    assert rows[0]["n_chunk_toks"] == 5


def test_strip_markup(spark):
    df = spark.createDataFrame(
        [
            (1, "<html><body><p>Hello <b>world</b></p>"
                "<script>var x = '<evil>';</script>"
                "<style>p { color: red; }</style>"
                "Tom &amp; Jerry &lt;3&nbsp;&quot;quoted&quot;</body></html>"),
            (2, "no markup at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["clean"] for r in df.select(
        "doc_id", strip_markup(F.col("text")).alias("clean")
    ).collect()}
    assert out[1] == 'Hello world Tom & Jerry <3 "quoted"'
    assert out[2] == "no markup at all"


def test_chunk_embed_ann_composition(spark):
    """The RAG indexing path end-to-end: chunk documents, embed each
    chunk (deterministic hash features stand in for a model — the
    engine's multimodal-stub discipline), then ANN-search the chunk
    index and verify a chunk of the query doc itself ranks first."""
    from cosmap_spark.operators.knn import knn_bruteforce, knn_lsh

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    chunks = chunk_text(docs, chunk_tokens=32, overlap=8)
    dim = 16
    feats = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("chunk"), i), F.lit(1000)).cast("double")
            / 500.0 - 1.0
        ),
    )
    index = chunks.select(
        (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("vec_id"),
        feats.alias("embedding"),
    )
    queries = index.where(F.col("vec_id") % 10000 == 0).limit(5)

    exact = knn_bruteforce(index, queries, k=3).collect()
    # identical chunk text ⇒ identical features; otherwise hash features
    # are near-orthogonal, so the true top neighbors are meaningful
    assert {r["qid"] for r in exact} == {
        r["vec_id"] for r in queries.collect()
    }
    approx = knn_lsh(index, queries, k=3, dim=dim, tables=8, planes=4)
    exact_pairs = {(r["qid"], r["nid"]) for r in exact}
    approx_pairs = {(r["qid"], r["nid"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.4, f"chunk-index ANN recall {recall}"
