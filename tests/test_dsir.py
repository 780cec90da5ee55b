"""DSIR importance resampling: weight direction on a planted domain
shift, an independent recomputation of the weights from collected
bucket counts, determinism/partition independence, exact-k Gumbel
sampling with target enrichment, and the plan gates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.dsir import (
    dsir_sample,
    dsir_weights,
    hashed_ngram_features,
)

BUCKETS = 512


@pytest.fixture(scope="module")
def corpora(spark):
    """raw = 100 'web' docs + 50 'sci' docs; target = 40 fresh 'sci'
    docs.  sci and web vocabularies are disjoint, so DSIR weights must
    separate them cleanly."""
    def sci(i):
        return f"quantum tensor spectrum lattice boson field theory run {i % 7}"

    def web(i):
        return f"click buy now sale cheap deal offer shop cart {i % 7}"

    raw = spark.createDataFrame(
        [(i, web(i)) for i in range(100)]
        + [(100 + i, sci(i)) for i in range(50)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(1000 + i, sci(i + 3)) for i in range(40)],
        "doc_id long, text string",
    )
    return raw, target


def test_weights_separate_domains(spark, corpora):
    raw, target = corpora
    w = {r["id"]: r["log_w"] for r in
         dsir_weights(raw, target, buckets=BUCKETS).collect()}
    assert len(w) == 150
    sci_w = [w[i] for i in range(100, 150)]
    web_w = [w[i] for i in range(100)]
    assert min(sci_w) > max(web_w), (
        "every sci doc must outweigh every web doc under a sci target"
    )
    assert min(sci_w) > 0 > max(web_w)


def test_weights_match_independent_recompute(spark, corpora):
    """Recompute log_w in plain Python from the collected per-bucket
    counts (same hashed features, independent aggregation/smoothing
    code path) and compare to 6 dp."""
    raw, target = corpora
    rf = hashed_ngram_features(raw, buckets=BUCKETS).collect()
    tf = hashed_ngram_features(target, buckets=BUCKETS).collect()
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for r in rf:
        rc[r["bucket"]] = rc.get(r["bucket"], 0) + 1
    for r in tf:
        tc[r["bucket"]] = tc.get(r["bucket"], 0) + 1
    rtot, ttot = len(rf), len(tf)

    def llr(b):
        return math.log((tc.get(b, 0) + 1.0) / (ttot + BUCKETS)) - math.log(
            (rc.get(b, 0) + 1.0) / (rtot + BUCKETS)
        )

    expect: dict[int, float] = {}
    for r in rf:
        expect[r["id"]] = expect.get(r["id"], 0.0) + llr(r["bucket"])
    got = {r["id"]: r["log_w"] for r in
           dsir_weights(raw, target, buckets=BUCKETS).collect()}
    for i, e in expect.items():
        assert got[i] == pytest.approx(e, abs=2e-6), i


def test_weights_partition_independent(spark, corpora):
    raw, target = corpora
    a = sorted(map(tuple, dsir_weights(raw, target, buckets=BUCKETS).collect()))
    b = sorted(map(tuple, dsir_weights(
        raw.repartition(13), target.repartition(7), buckets=BUCKETS
    ).collect()))
    assert a == b


def test_featureless_docs_keep_zero_weight(spark, corpora):
    raw, target = corpora
    raw2 = raw.unionByName(
        raw.sparkSession.createDataFrame([(999, "")], "doc_id long, text string")
    )
    row = {r["id"]: r for r in dsir_weights(raw2, target, buckets=BUCKETS).collect()}[999]
    assert row["log_w"] == 0.0 and row["n_feats"] == 0


def test_gumbel_sample_exact_k_and_enriched(spark, corpora):
    raw, target = corpora
    got = dsir_sample(raw, target, k=30, buckets=BUCKETS).collect()
    assert len(got) == 30
    # sci docs are 1/3 of raw but must dominate the importance sample
    n_sci = sum(1 for r in got if r["id"] >= 100)
    assert n_sci >= 20, f"only {n_sci}/30 target-domain docs selected"
    # deterministic under re-run and re-partitioning
    again = dsir_sample(raw.repartition(11), target, k=30, buckets=BUCKETS).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_dsir_plan_gates(spark, corpora):
    """The scale contract: llr table broadcasts, no Python, no
    quadratic joins; the sampler plans TakeOrderedAndProject."""
    from cosmap_spark.operators.report import plan_summary

    raw, target = corpora
    s = plan_summary(dsir_weights(raw, target, buckets=BUCKETS))
    assert s["python_evals"] == 0 and s["arrow_evals"] == 0
    assert s["cartesian_products"] == 0
    assert s["broadcast_joins"] >= 1
    s2 = plan_summary(dsir_sample(raw, target, k=10, buckets=BUCKETS))
    assert "TakeOrderedAndProject" in s2["plan"]
