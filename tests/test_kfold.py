"""K-fold splitters: range/determinism/balance, group integrity, and
the streaming quality gate's stream/batch equivalence."""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import functions as F

from cosmap_spark.operators.sampler import group_kfold_assign, kfold_assign
from cosmap_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kfold_range_balance_determinism(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    k = 5
    folded = kfold_assign(docs, key_cols=["doc_id"], k=k)
    sizes = {
        r["fold"]: r["cnt"]
        for r in folded.groupBy("fold").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(sizes) <= set(range(k))
    assert sum(sizes.values()) == n
    # balanced within 4 sigma of the binomial expectation
    exp = n / k
    assert all(abs(c - exp) < 4 * (exp ** 0.5) + 1 for c in sizes.values()), sizes
    # deterministic & layout-independent
    a = sorted((r["doc_id"], r["fold"]) for r in folded.collect())
    b = sorted(
        (r["doc_id"], r["fold"])
        for r in kfold_assign(docs.repartition(7), key_cols=["doc_id"], k=k).collect()
    )
    assert a == b
    # a different seed produces a different split
    c = sorted(
        (r["doc_id"], r["fold"])
        for r in kfold_assign(docs, key_cols=["doc_id"], k=k, seed=60).collect()
    )
    assert a != c


def test_group_kfold_integrity(spark):
    docs = load_table(spark, SF, "documents")
    folded = group_kfold_assign(docs, group_col="source", k=3)
    # every group maps to exactly one fold
    per_group = folded.groupBy("source").agg(
        F.countDistinct("fold").alias("nf")
    )
    assert per_group.where(F.col("nf") != 1).count() == 0
    # and the mapping is the pure hash of the group key: a disjoint
    # DataFrame with the same groups gets the same assignment
    only_groups = docs.select("source").distinct()
    remap = {
        r["source"]: r["fold"]
        for r in group_kfold_assign(only_groups, group_col="source", k=3).collect()
    }
    for r in folded.select("source", "fold").distinct().collect():
        assert remap[r["source"]] == r["fold"]


def test_quality_gate_stream_batch_equivalence(spark, tmp_path):
    from cosmap_spark.streaming.ops import quality_gate

    # prose tail so the stopword-free fixture corpus can pass the gate
    docs = load_table(spark, SF, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" and that is to be the end of it.")),
        ).otherwise(F.lit("too short.")),
    )
    batch_kept = quality_gate(docs).select("doc_id", "clean_text")
    want = sorted(map(tuple, batch_kept.collect()))
    assert 0 < len(want) < docs.count()

    landing = tmp_path / "landing"
    landing.mkdir()
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    shutil.copy(
        next((tmp_path / "stage").glob("part-*.parquet")),
        landing / "d.parquet",
    )
    sdf = spark.readStream.schema(docs.schema).parquet(str(landing))
    gated = quality_gate(sdf)
    assert gated.isStreaming
    name = f"qg_{uuid.uuid4().hex[:8]}"
    q = (
        gated.select("doc_id", "clean_text")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    assert got == want
