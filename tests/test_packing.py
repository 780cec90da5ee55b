"""Sequence packing (operators/packing.py): correctness vs a local
reference, determinism across shard counts, and the no-global-window
plan guarantee."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cosmap_spark.functions.text import n_tokens
from cosmap_spark.operators.packing import pack_bins, pack_offsets
from cosmap_spark.tables import load_table

SF = "/root/testdata/sf0.001"
CAP = 64


def _docs(spark):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", n_tokens(F.col("text")).alias("n_toks"))
    )


def _reference_offsets(rows):
    """Single-threaded concat-then-chunk reference."""
    out, acc = {}, 0
    for doc_id, n in sorted(rows):
        start, end = acc, acc + n
        out[doc_id] = (start, end, start // CAP, max(end - 1, start) // CAP)
        acc = end
    return out


def test_pack_offsets_matches_reference(spark):
    docs = _docs(spark)
    rows = [(r["doc_id"], r["n_toks"]) for r in docs.collect()]
    expect = _reference_offsets(rows)
    got = pack_offsets(docs, capacity=CAP).collect()
    assert len(got) == len(expect)
    for r in got:
        assert (
            r["start"], r["end"], r["first_bin"], r["last_bin"]
        ) == expect[r["doc_id"]], r["doc_id"]


def test_pack_offsets_shard_count_invariant(spark):
    """The global offsets must not depend on how the scan is sharded."""
    docs = _docs(spark)
    a = {r["doc_id"]: r["start"] for r in pack_offsets(docs, capacity=CAP, num_shards=2).collect()}
    b = {r["doc_id"]: r["start"] for r in pack_offsets(docs, capacity=CAP, num_shards=13).collect()}
    assert a == b


def test_pack_offsets_no_global_window(spark):
    """Scale evidence: the prefix sum must never plan a SinglePartition
    exchange (the naive global orderBy window would)."""
    docs = _docs(spark)
    plan = pack_offsets(docs, capacity=CAP)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_pack_bins_tiles_the_stream(spark):
    """Every context window except the last is exactly full; documents'
    sub-intervals tile each window without gaps or overlap."""
    docs = _docs(spark)
    bins = pack_bins(docs, capacity=CAP).collect()
    by_bin: dict[int, list] = {}
    for r in bins:
        by_bin.setdefault(r["bin"], []).append((r["bin_start"], r["bin_end"]))
    total = sum(e - s for spans in by_bin.values() for s, e in spans)
    assert total == sum(r["n_toks"] for r in docs.collect())
    last_bin = max(by_bin)
    for b, spans in by_bin.items():
        spans.sort()
        assert spans[0][0] == 0
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2, (b, spans)  # contiguous, no gap/overlap
        if b != last_bin:
            assert spans[-1][1] == CAP, (b, spans)


def test_merge_upsert(spark, tmp_path):
    from cosmap_spark.sinks.writers import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    merge_upsert(spark, path, base, ["k"])
    updates = spark.range(8, 13).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_upsert(spark, path, updates, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 13
    for k in range(8):
        assert got[k] == k * 10  # untouched rows survive
    for k in range(8, 13):
        assert got[k] == -1  # updates win / inserts land


def test_row_index_dense_and_ordered(spark):
    from cosmap_spark.operators.packing import row_index

    docs = _docs(spark)
    got = row_index(docs, num_shards=7).collect()
    by_id = sorted((r["doc_id"], r["row_idx"]) for r in got)
    assert [idx for _, idx in by_id] == list(range(len(by_id)))


def test_global_rank_matches_one_task_window(spark):
    """Sharded global rank ≡ row_number over an unpartitioned window
    (the plan we refuse to run), including ties on the first column."""
    from cosmap_spark.operators.packing import global_rank

    df = spark.range(5_000).select(
        (F.col("id") % 97).cast("double").alias("price"),  # heavy ties
        F.col("id").alias("oid"),
    )
    ranked, n = global_rank(df, ["price", "oid"], out_col="g")
    assert n == 5_000
    got = {r["oid"]: r["g"] for r in ranked.collect()}
    w = Window.orderBy("price", "oid")
    want = {
        r["oid"]: r["rn"]
        for r in df.select("oid", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_global_rank_layout_independent(spark):
    from cosmap_spark.operators.packing import global_rank

    df = spark.range(2_000).select(
        F.col("id").cast("double").alias("price"), F.col("id").alias("oid")
    )
    base, _ = global_rank(df, ["price", "oid"], out_col="g")
    base_m = {r["oid"]: r["g"] for r in base.collect()}
    for parts in (1, 17):
        got, _ = global_rank(
            df.repartition(parts), ["price", "oid"], out_col="g"
        )
        assert {r["oid"]: r["g"] for r in got.collect()} == base_m, parts


def test_ntile_from_rank_matches_spark_ntile(spark):
    """Exact SQL ntile semantics for divisible and ragged n/k."""
    from cosmap_spark.operators.packing import ntile_from_rank

    for n, k in ((10, 4), (12, 4), (7, 3), (5, 8), (1, 4)):
        df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
        got = {
            r["rn"]: r["b"]
            for r in df.select(
                "rn", ntile_from_rank(F.col("rn"), n, k).alias("b")
            ).collect()
        }
        w = Window.orderBy("rn")
        want = {
            r["rn"]: r["b"]
            for r in df.select(
                "rn", F.ntile(k).over(w).cast("long").alias("b")
            ).collect()
        }
        assert got == want, (n, k)
