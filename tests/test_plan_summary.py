"""plan_summary introspection: counters against plans whose shapes the
repo already guarantees elsewhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.report import plan_summary
from cosmap_spark.queries.registry import all_queries
from cosmap_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_cone_search_counters(spark):
    df = all_queries()["q_cone_search"](spark, SF)
    s = plan_summary(df)
    assert s["broadcast_joins"] >= 1
    assert s["cartesian_products"] == 0
    assert s["nested_loop_joins"] == 0
    assert s["python_evals"] == 0
    # codegen spans materialize only in AQE's FINAL plan, and only for
    # THIS DataFrame's own query execution — collect(), not count()
    # (count() builds a separate aggregated execution)
    df.collect()
    assert plan_summary(df)["codegen_spans"] >= 1


def test_scan_pruning_visible(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.where(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    s = plan_summary(df)
    assert s["exchanges"] == 0
    assert len(s["scans"]) == 1
    scan = s["scans"][0]
    assert "l_quantity" in (scan["pushed_filters"] or ""), scan
    rs = scan["read_schema"] or ""
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs, "column pruning must reach the scan"


def test_udf_paths_classified(spark):
    s = plan_summary(all_queries()["q_udtf_grouped_map"](spark, SF))
    assert s["python_evals"] == 0
    assert s["arrow_evals"] >= 1


def test_counts_match_plan_audit_expectations(spark):
    # the allowlisted BNLJ query reports exactly what the audit sees
    s = plan_summary(all_queries()["q_knn_cosine"](spark, SF))
    assert s["nested_loop_joins"] >= 1  # intended broadcast of k queries
    assert s["cartesian_products"] == 0


def test_table_profile_one_pass(spark):
    from cosmap_spark.operators.report import table_profile

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.5), (3, None, None), (3, "a", 4.0)],
        "id long, s string, x double",
    )
    p = table_profile(df)
    assert p["n_rows"] == 4
    assert p["columns"]["s"]["nulls"] == 1
    assert p["columns"]["x"]["nulls"] == 1
    assert p["columns"]["id"]["min"] == 1 and p["columns"]["id"]["max"] == 3
    assert p["columns"]["x"]["avg"] == pytest.approx(2.5)
    # HLL distinct within rsd of truth (3 distinct ids, 2 strings)
    assert abs(p["columns"]["id"]["approx_distinct"] - 3) <= 1
    assert abs(p["columns"]["s"]["approx_distinct"] - 2) <= 1


def test_table_profile_star_schema(spark):
    from cosmap_spark.operators.report import table_profile

    li = load_table(spark, SF, "lineitem")
    p = table_profile(li)
    assert p["n_rows"] == li.count()
    assert set(p["columns"]) == set(li.columns)
    q = p["columns"]["l_quantity"]
    assert q["min"] >= 0 and q["max"] >= q["min"]
    assert q["std"] is not None


def test_counters_are_exact_not_doubled(spark):
    from cosmap_spark.operators.report import plan_summary

    a = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    s = plan_summary(a)
    assert s["exchanges"] == 1  # the one aggregation shuffle, not 2
    b = a.join(F.broadcast(spark.range(5).selectExpr("id as k")), "k")
    s2 = plan_summary(b)
    assert s2["broadcast_joins"] == 1
    assert s2["broadcast_exchanges"] == 1
    assert s2["exchanges"] == 1  # broadcast exchange not counted here


# --- beyond-ledger operators: the same exchange/Python-path gates the
# --- 50 ledger queries get from tests/test_plan_audit.py


def _clean(s):
    assert s["cartesian_products"] == 0
    assert s["nested_loop_joins"] == 0
    assert s["python_evals"] == 0


def test_classifier_training_iteration_plan(spark):
    """Every data pass of the GD trainer: weight table broadcasts
    (O(dim), never a shuffle of the feature table against it), both
    aggregations are groupBys, zero Python anywhere."""
    from cosmap_spark.operators.classifier import (
        _iteration_frames,
        hashed_features,
    )

    docs = load_table(spark, SF, "documents")
    feats = hashed_features(docs, dim=64)
    s = plan_summary(feats)
    _clean(s)
    assert s["exchanges"] == 1  # the one (id, fid) combine shuffle
    assert s["arrow_evals"] == 0  # hashing is JVM-side

    labels = docs.select(
        F.col("doc_id").alias("id"), (F.col("doc_id") % 2).cast("double").alias("y")
    )
    err, grad = _iteration_frames(feats, labels, [0.0] * 64, 0.0)
    for df in (err, grad):
        s = plan_summary(df)
        _clean(s)
        assert s["broadcast_joins"] >= 1, "weight table must broadcast"
        assert s["arrow_evals"] == 0


def test_classifier_serving_plan_is_map_side(spark):
    """score_documents ships weights as a plan literal: no join, no
    shuffle, no Python."""
    from cosmap_spark.operators.classifier import score_documents

    docs = load_table(spark, SF, "documents")
    s = plan_summary(score_documents(docs, [0.1] * 64))
    _clean(s)
    assert s["exchanges"] == 0
    assert s["arrow_evals"] == 0
    assert s["broadcast_joins"] + s["sortmerge_joins"] + s["shuffled_hash_joins"] == 0


def test_vocab_induction_plans(spark):
    """token_vocab/bpe_pair_counts: one combine shuffle each, top-n via
    TakeOrderedAndProject (never a global sort); apply_bpe_merge is a
    pure map-side fold."""
    from cosmap_spark.operators.vocab import (
        apply_bpe_merge,
        bpe_pair_counts,
        token_vocab,
    )

    docs = load_table(spark, SF, "documents")
    for df in (token_vocab(docs, top_n=50), bpe_pair_counts(docs, top_n=50)):
        s = plan_summary(df)
        _clean(s)
        assert s["arrow_evals"] == 0
        assert s["exchanges"] == 1
        assert "TakeOrderedAndProject" in s["plan"]
        assert "Sort " not in s["plan"].split("TakeOrderedAndProject")[0]
    s = plan_summary(apply_bpe_merge(docs, "the", "quick"))
    _clean(s)
    assert s["exchanges"] == 0
    assert s["arrow_evals"] == 0


def test_incremental_dedup_plan(spark):
    """incremental_minhash_dedup: the arriving batch's bands broadcast
    against (store ∪ new); history is read as signatures only — the
    candidate join must be a broadcast hash join, never quadratic.
    Audited via _incremental_pairs (the public entry localCheckpoints
    the result, which truncates the auditable lineage)."""
    from cosmap_spark.operators.dedup import (
        _incremental_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, SF, "documents")
    new_sig = minhash_signatures(docs.where(F.col("doc_id") % 2 == 1))
    old_sig = minhash_signatures(docs.where(F.col("doc_id") % 2 == 0))
    out = _incremental_pairs(
        new_sig, new_sig.unionByName(old_sig),
        bands=8, rows=4, num_hashes=32, threshold=0.5,
    )
    s = plan_summary(out)
    _clean(s)
    assert s["broadcast_joins"] >= 1, "new-batch bands must broadcast"


def test_skew_report_flags_planted_hot_key(spark):
    from cosmap_spark.operators.report import skew_report

    df = spark.range(10_000).select(
        F.when(F.col("id") < 5_000, F.lit(7)).otherwise(F.col("id") % 100).alias("k")
    )
    rep = skew_report(df, ["k"])
    assert rep["n_rows"] == 10_000
    assert rep["top"][0]["k"] == 7 and rep["top"][0]["count"] >= 5_000
    assert rep["max_count"] >= 5_000
    assert rep["skew_ratio"] > 50
    assert rep["suggested_salt"] > 10


def test_skew_report_uniform_key_needs_no_salt(spark):
    from cosmap_spark.operators.report import skew_report

    df = spark.range(10_000).select((F.col("id") % 100).alias("k"))
    rep = skew_report(df, ["k"])
    assert rep["n_keys"] == 100
    assert rep["suggested_salt"] == 1
    assert rep["skew_ratio"] <= 1.5


def test_skew_report_empty_input(spark):
    from cosmap_spark.operators.report import skew_report

    rep = skew_report(spark.range(0).select(F.col("id").alias("k")), ["k"])
    assert rep["n_rows"] == 0 and rep["top"] == [] and rep["suggested_salt"] == 1
