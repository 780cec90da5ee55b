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


def test_exact_k_sample(spark):
    from cosmap_spark.operators.sampler import exact_k_sample

    docs = load_table(spark, SF, "documents")
    s = exact_k_sample(docs, k=40, key_cols=["doc_id"])
    assert s.count() == 40
    # deterministic & layout-independent
    a = sorted(r["doc_id"] for r in s.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in exact_k_sample(
            docs.repartition(9), k=40, key_cols=["doc_id"]
        ).select("doc_id").collect()
    )
    assert a == b
    # different seed → mostly different rows
    c = set(
        r["doc_id"]
        for r in exact_k_sample(docs, k=40, key_cols=["doc_id"], seed=84)
        .select("doc_id").collect()
    )
    assert len(set(a) & c) < 30
    # plan: distributed top-k, not a global sort
    plan = s._sc._jvm.PythonSQLUtils.explainString(
        s._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan


def test_equi_depth_bin(spark):
    import numpy as np

    from cosmap_spark.operators.sampler import equi_depth_bin

    # heavy-tailed data: equal-width would dump ~everything in bin 0
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.lognormal(0, 2, 2000), [1e8, 1e9]])
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, x double"
    )
    out = equi_depth_bin(df, "x", n_bins=10)
    sizes = {
        r["x_bin"]: r["n"]
        for r in out.groupBy("x_bin").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(10))
    # equi-depth: every bin within 2x of the ideal share even on the
    # lognormal tail (sketch accuracy + ties allow slack)
    ideal = len(vals) / 10
    assert all(0.5 * ideal <= n <= 2.0 * ideal for n in sizes.values()), sizes
    # monotone: bin index ordered with value
    rows = sorted(
        ((r["x"], r["x_bin"]) for r in out.collect()), key=lambda t: t[0]
    )
    bins = [b for _, b in rows]
    assert bins == sorted(bins)
