"""Runnable LLM-corpus curation example — the end-to-end recipe from
tests/test_curation_e2e.py as a script:

    python examples/curation/run.py [sf_dir] [out_dir]

Stages: exact dedup -> near-dup cluster drop -> benchmark
decontamination -> quality gate -> temperature mixture -> epoch-0
shuffle -> sequence packing -> idempotent keyed upsert, then a
per-language data card of the curated corpus and a KMV cross-shard
overlap audit (pairwise Jaccard between language shards' document
fingerprints, one scan).  Everything stays one lazy DataFrame plan
until the final writes.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from cosmap_spark.functions.text import canonicalize, n_tokens, quality_score
from cosmap_spark.operators.dedup import (
    contamination_hits,
    dedup_clusters,
    exact_dedup,
    ngram_jaccard_pairs,
)
from cosmap_spark.operators.packing import pack_offsets
from cosmap_spark.operators.report import corpus_report
from cosmap_spark.operators.sampler import epoch_shuffle, temperature_mixture
from cosmap_spark.session import get_spark
from cosmap_spark.sinks.writers import merge_upsert
from cosmap_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curated_")
    spark = get_spark(app_name="curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", canonicalize(F.col("text"))
    )
    print(f"input: {docs.count()} docs")

    canon = exact_dedup(docs).select(F.col("canonical_id").alias("doc_id"))
    docs = docs.join(F.broadcast(canon), "doc_id", "left_semi")

    losers = (
        dedup_clusters(ngram_jaccard_pairs(docs, k=3, threshold=0.5,
                                           max_shingle_df=100))
        .where(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias("doc_id"))
    )
    docs = docs.join(F.broadcast(losers), "doc_id", "left_anti")

    bench = docs.where(F.col("doc_id") % 7 == 0)
    tainted = contamination_hits(
        docs.where(F.col("doc_id") % 7 != 0), bench, k=8
    ).select("doc_id")
    docs = docs.join(F.broadcast(tainted), "doc_id", "left_anti")

    docs = docs.where(quality_score(F.col("text")) >= 0.5)
    docs = temperature_mixture(docs, source_col="lang", key_cols=["doc_id"],
                               alpha=0.7)

    # keep the permutation key: pack_offsets re-orders by its order_col,
    # so packing must order by the epoch key, not the original doc_id
    ordered = epoch_shuffle(
        docs, key_cols=["doc_id"], epoch=0, key_col_out="epoch_key"
    )
    packed = pack_offsets(
        ordered.select(
            "doc_id", "lang", "epoch_key", n_tokens(F.col("text")).alias("n_toks")
        ),
        capacity=2048,
        order_col="epoch_key",
    ).drop("epoch_key")
    merge_upsert(spark, f"{out}/curated", packed, ["doc_id"])

    print(f"curated: {spark.read.parquet(f'{out}/curated').count()} docs -> {out}")
    print("data card:")
    corpus_report(docs).orderBy("lang").show(truncate=False)

    # cross-shard overlap audit (round 6): how many token-fingerprint
    # values do the language shards share?  KMV sketches answer
    # pairwise Jaccard + intersection-NDV from ONE scan — the check
    # that catches a shard accidentally duplicating another's docs
    from cosmap_spark.functions.text import fingerprint
    from cosmap_spark.operators.sketch import segment_overlap

    print("shard overlap (KMV, k=256):")
    segment_overlap(
        docs.select("lang", fingerprint(F.col("text")).alias("fp")),
        "lang", "fp", k=256,
    ).orderBy("seg_a", "seg_b").show(truncate=False)


if __name__ == "__main__":
    main()
