"""End-to-end LLM-corpus curation pipeline: the composition test that a
reference user switching to this engine actually runs — dedup → cluster
drop → decontamination → quality filter → mixture rebalance → epoch
shuffle → sequence packing → upsert sink — all lazy DataFrame ops until
the final write."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmap_spark.functions.text import n_tokens, quality_score
from cosmap_spark.operators.dedup import (
    contamination_hits,
    dedup_clusters,
    exact_dedup,
    ngram_jaccard_pairs,
)
from cosmap_spark.operators.packing import pack_offsets
from cosmap_spark.operators.sampler import epoch_shuffle, temperature_mixture
from cosmap_spark.sinks.writers import merge_upsert
from cosmap_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_curation_pipeline(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    n_in = docs.count()

    # 1. exact dedup: keep the canonical (min-id) copy of each text
    canon = exact_dedup(docs).select(F.col("canonical_id").alias("doc_id"))
    docs1 = docs.join(F.broadcast(canon), "doc_id", "left_semi")

    # 2. near-dup clusters: drop every member except the cluster min
    pairs = ngram_jaccard_pairs(docs1, k=3, threshold=0.08, max_shingle_df=100)
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    docs2 = docs1.join(F.broadcast(losers), "doc_id", "left_anti")

    # 3. benchmark decontamination: drop docs colliding with the
    # held-out eval slice on any 8-gram
    bench = docs.where(F.col("doc_id") % 7 == 0)
    tainted = contamination_hits(
        docs2.where(F.col("doc_id") % 7 != 0), bench, k=8
    ).select("doc_id")
    docs2d = docs2.join(F.broadcast(tainted), "doc_id", "left_anti")

    # 4. quality gate
    docs3 = docs2d.withColumn("quality", quality_score(F.col("text"))).where(
        F.col("quality") >= 0.5
    )

    # 5. temperature-flattened language mixture (downsample-only)
    docs4 = temperature_mixture(
        docs3, source_col="lang", key_cols=["doc_id"], alpha=0.7, seed=11
    )

    # 6. epoch-0 training order, then sequence packing over the stream —
    # packing orders by its order_col, so it must pack on the kept
    # permutation key (packing on doc_id would undo the shuffle)
    ordered = epoch_shuffle(
        docs4, key_cols=["doc_id"], epoch=0, num_partitions=4,
        key_col_out="epoch_key",
    )
    packed = pack_offsets(
        ordered.select(
            "doc_id", "epoch_key", n_tokens(F.col("text")).alias("n_toks")
        ),
        capacity=128,
        order_col="epoch_key",
    ).drop("epoch_key")

    # 7. upsert into the curated table (idempotent re-run)
    out = str(tmp_path / "curated")
    final = packed.select("doc_id", "n_toks", "start", "end", "first_bin", "last_bin")
    merge_upsert(spark, out, final, ["doc_id"])
    merge_upsert(spark, out, final, ["doc_id"])  # re-run must not duplicate

    got = spark.read.parquet(out)
    n_out = got.count()
    assert 0 < n_out <= n_in
    assert got.select("doc_id").distinct().count() == n_out
    # the packed stream is contiguous: total span == sum of lengths
    row = got.agg(
        F.max("end").alias("span"), F.sum("n_toks").alias("toks")
    ).collect()[0]
    assert row["span"] == row["toks"]
    # pipeline actually dropped something (fixtures contain dup docs)
    assert n_out < n_in
