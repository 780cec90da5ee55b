"""Empty-input behavior of the round-3 operators: every operator must
return an empty (or well-defined) result with the declared schema —
never raise — because at 100 TB a filter upstream routinely leaves a
partition-empty table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_series(spark):
    return spark.createDataFrame([], "k long, t long, v double")


def test_subsequence_search_empty(spark, empty_series):
    from cosmap_spark.operators.tseries import subsequence_search

    out = subsequence_search(
        empty_series, [0.0, 1.0, 2.0], key_col="k", order_col="t",
        val_col="v",
    )
    assert out.count() == 0
    assert out.columns == ["k", "start", "dist"]


def test_edit_distance_pairs_empty(spark, empty_docs):
    from cosmap_spark.operators.dedup import edit_distance_pairs

    out = edit_distance_pairs(empty_docs)
    assert out.count() == 0 and out.columns == ["id_a", "id_b", "dist"]


def test_rollups_empty(spark):
    from cosmap_spark.operators.sketch import distinct_rollup, quantile_rollup

    ids = spark.createDataFrame([], "g string, c string, uid long")
    d = distinct_rollup(ids, ["g", "c"], "uid").collect()
    assert all(r["ndv"] == 0 for r in d)
    df = spark.createDataFrame([], "g string, c string, v double")
    q = quantile_rollup(df, ["g", "c"], "v").collect()
    for r in q:
        assert r["n"] in (0, None)


def test_corpus_diff_empty_sides(spark, empty_docs):
    from cosmap_spark.operators.diff import corpus_diff

    full = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    added = corpus_diff(empty_docs, full)
    removed = corpus_diff(full, empty_docs)
    assert {r["status"] for r in added.collect()} == {"added"}
    assert {r["status"] for r in removed.collect()} == {"removed"}
    assert corpus_diff(empty_docs, empty_docs).count() == 0


def test_expectations_empty(spark, empty_docs):
    from cosmap_spark.operators.expectations import validate

    rows = validate(
        empty_docs, [{"name": "r", "expr": "doc_id >= 0"}]
    ).collect()
    assert rows[0]["n_rows"] == 0 and rows[0]["passed"]


def test_pair_metrics_empty(spark):
    from cosmap_spark.operators.report import pair_metrics, threshold_sweep

    e = spark.createDataFrame([], "id_a long, id_b long")
    t = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = pair_metrics(e, t).collect()[0]
    assert (r["precision"], r["recall"], r["f1"]) == (0.0, 0.0, 0.0)
    es = spark.createDataFrame([], "id_a long, id_b long, score double")
    sw = threshold_sweep(es, t, [0.5]).collect()[0]
    assert sw["kept"] == 0 and sw["recall"] == 0.0


def test_heavy_hitters_and_hll_empty(spark):
    from cosmap_spark.operators.sketch import heavy_hitters_sketch

    e = spark.createDataFrame([], "k long")
    assert heavy_hitters_sketch(e, "k", k=8).count() == 0


def test_global_rank_empty(spark):
    from cosmap_spark.operators.packing import global_rank

    e = spark.createDataFrame([], "price double, oid long")
    ranked, n = global_rank(e, ["price", "oid"])
    assert n == 0 and ranked.count() == 0


def test_semantic_contamination_empty_bench(spark):
    """An empty benchmark must yield an empty result (not a crash in
    probe generation), with the declared schema."""
    from cosmap_spark.operators.knn import semantic_contamination
    from cosmap_spark.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    out = semantic_contamination(emb, emb.where(F.lit(False)), nlist=4)
    assert out.columns == ["corpus_id", "bench_id", "sim"]
    assert out.count() == 0


def test_funnel_family_empty_events(spark):
    """Empty events through the whole behavioral family: per-user
    funnels, latency, summaries (0-count rows with 0.0 rates — the
    coalesced-SUM contract), and cohort retention all return
    well-defined frames, never raise."""
    from cosmap_spark.operators.funnel import (
        cohort_retention,
        funnel,
        funnel_latency,
        funnel_summary,
        funnel_summary_levels,
    )

    ev = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp"
    )
    per_user = funnel(ev, ["A", "B"])
    assert per_user.count() == 0
    assert funnel_latency(per_user, 2).count() == 0
    s = funnel_summary(per_user, 2).collect()
    assert [(r["step"], r["n_users"], r["conversion_from_start"])
            for r in sorted(s, key=lambda r: r["step"])] == [
        (1, 0, 0.0), (2, 0, 0.0)]
    # segmented summary over an empty frame has no segments at all
    seg = per_user.withColumn("g", F.lit("x"))
    assert funnel_summary(seg, 2, by=["g"]).count() == 0
    lv = spark.createDataFrame([], "user_id long, steps_completed long")
    assert funnel_summary_levels(lv, 2).count() == 2  # 0-count rows
    assert cohort_retention(ev).count() == 0


def test_dedup_clusters_twophase_single_and_self_edges(spark):
    from cosmap_spark.operators.dedup import dedup_clusters

    # only self-pairs: no real edges, empty assignment
    selfs = spark.createDataFrame([(3, 3), (7, 7)], "id_a long, id_b long")
    assert dedup_clusters(selfs, method="twophase").count() == 0
    # one real pair converges in one round
    one = spark.createDataFrame([(9, 4)], "id_a long, id_b long")
    out = {r["id"]: r["cluster_id"]
           for r in dedup_clusters(one, method="twophase").collect()}
    assert out == {4: 4, 9: 4}


def test_train_bpe_batched_empty_corpus(spark):
    from cosmap_spark.operators.vocab import train_bpe

    empty = spark.createDataFrame([], "doc_id long, text string")
    s: dict = {}
    assert train_bpe(empty, n_merges=4, batch_merges=4, _stats=s) == []
    assert s["passes"] == 1
