"""Dedup + similarity-search behavior tests: exact-dup recall of every
tier, LSH recall vs the exact pair set, and ANN recall vs brute force."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cosmap_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from cosmap_spark.operators.knn import knn_bruteforce, knn_lsh
from cosmap_spark.tables import load_table


@pytest.fixture(scope="module")
def corpus_with_dups(spark):
    """sf0.001 documents + exact copies of the first 10 docs (ids+10000)
    + light edits of the next 10 (ids+20000, one token appended)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    copies = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    edits = docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit("zzz")).alias("text"),
    )
    return docs.unionByName(copies).unionByName(edits).cache()


def test_exact_dedup_finds_copies(corpus_with_dups):
    groups = exact_dedup(corpus_with_dups)
    dup_groups = groups.where(F.col("n_copies") > 1).collect()
    assert len(dup_groups) == 10
    assert all(r["canonical_id"] < 10 for r in dup_groups)


def test_ngram_jaccard_finds_exact_and_near(corpus_with_dups):
    pairs = ngram_jaccard_pairs(corpus_with_dups, threshold=0.8)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    for i in range(10):  # exact copies: jaccard exactly 1
        assert got.get((i, i + 10000)) == 1.0
    for i in range(10, 20):  # one appended token: jaccard just below 1
        j = got.get((i, i + 20000))
        assert j is not None and 0.8 <= j < 1.0


def test_minhash_lsh_recall_on_high_similarity(corpus_with_dups):
    """LSH must recover every pair with Jaccard ≥ 0.8 here (identical
    signatures collide with certainty; near-identical with prob ≈ 1 for
    32 hashes / 8 bands at s ≥ 0.8: 1-(1-s^4)^8 ≥ 0.99)."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(corpus_with_dups, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus_with_dups, threshold=0.8).collect()
    }
    assert exact, "fixture must produce high-similarity pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall}"
    assert lsh.issubset(exact), "verification step must keep precision exact"


def test_simhash_flags_exact_copies(corpus_with_dups):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(corpus_with_dups, max_hamming=3).collect()
    }
    for i in range(10):
        assert pairs.get((i, i + 10000)) == 0  # identical token bags


def test_knn_lsh_recall_vs_bruteforce(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"]) for r in knn_bruteforce(emb, q, k=5).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in knn_lsh(emb, q, k=5, dim=64, tables=8, planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall {recall}"


def test_knn_bruteforce_self_excluded_and_ranked(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = knn_bruteforce(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    assert all(r["nid"] != 0 for r in out)
    sims = [r["sim"] for r in sorted(out, key=lambda r: r["rn"])]
    assert sims == sorted(sims, reverse=True)


def test_knn_ivf_recall_vs_bruteforce(spark):
    from cosmap_spark.operators.knn import knn_ivf

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"]) for r in knn_bruteforce(emb, q, k=5).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in knn_ivf(emb, q, k=5, nlist=16, nprobe=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall}"
    # determinism: same seed → identical result set
    again = {
        (r["qid"], r["nid"])
        for r in knn_ivf(emb, q, k=5, nlist=16, nprobe=8).collect()
    }
    assert approx == again


def test_dedup_clusters_connected_components(spark):
    from cosmap_spark.operators.dedup import dedup_clusters

    # two chains + one triangle + an isolated pair:
    # {1-2-3-4}, {10-11-12}, {20,21,22 triangle}, {30-31}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12),
         (20, 21), (21, 22), (20, 22), (30, 31)],
        "id_a long, id_b long",
    )
    out = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert {out[i] for i in (1, 2, 3, 4)} == {1}
    assert {out[i] for i in (10, 11, 12)} == {10}
    assert {out[i] for i in (20, 21, 22)} == {20}
    assert {out[i] for i in (30, 31)} == {30}


def test_dedup_clusters_on_real_pairs(spark):
    from cosmap_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs
    from cosmap_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup_clusters(pairs)
    n_nodes = clusters.count()
    if n_nodes:
        # every cluster_id is a member id; canonical docs = cluster minima
        ids = {r["id"] for r in clusters.collect()}
        assert all(r["cluster_id"] in ids for r in clusters.collect())
        assert clusters.where(F.col("cluster_id") > F.col("id")).count() == 0
