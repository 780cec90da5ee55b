"""Hash-feature logistic-regression quality classifier: the trainer
must separate a synthetically-labeled corpus, scoring must be the exact
map-side dual of the trained model, and everything is deterministic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cosmap_spark.operators.classifier import (
    classifier_auc,
    hashed_features,
    score_documents,
    train_quality_classifier,
)
from cosmap_spark.tables import load_table


def _labeled(spark):
    """Synthetic separable task: documents containing 'table' or 'query'
    are 'wiki-like' (label 1)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    return docs.withColumn(
        "label",
        (
            F.array_contains(F.split("text", " "), "table")
            | F.array_contains(F.split("text", " "), "query")
        ).cast("int"),
    )


def test_trainer_separates_and_auc(spark):
    labeled = _labeled(spark).cache()
    w, b = train_quality_classifier(labeled, dim=256, iters=15, lr=1.0)
    scores = score_documents(labeled, w, bias=b)
    labels = labeled.select(F.col("doc_id").alias("id"), F.col("label").alias("y"))
    auc = classifier_auc(scores, labels)
    assert auc > 0.95, f"AUC {auc}"


def test_training_deterministic(spark):
    labeled = _labeled(spark).limit(200).cache()
    w1, b1 = train_quality_classifier(labeled, dim=128, iters=3)
    w2, b2 = train_quality_classifier(labeled, dim=128, iters=3)
    assert w1 == w2 and b1 == b2


def test_scoring_matches_manual_model(spark):
    """score_documents must equal sigmoid(b + Σ_tokens w[h(token)])
    computed via the feature table — the serving/training duality."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "c"), (3, "b c b c")], ["doc_id", "text"]
    )
    w = [round(math.sin(i + 1) * 0.1, 6) for i in range(64)]
    served = {r["id"]: r["score"] for r in score_documents(docs, w, bias=0.2).collect()}
    feats = hashed_features(docs, dim=64).collect()
    manual: dict[int, float] = {1: 0.2, 2: 0.2, 3: 0.2}
    for r in feats:
        manual[r["id"]] += r["c"] * w[int(r["fid"])]
    for i, s in manual.items():
        expect = 1.0 / (1.0 + math.exp(-s))
        assert abs(served[i] - expect) < 1e-9, (i, served[i], expect)


def test_feature_hashing_partition_independent(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    a = {(r["id"], r["fid"]): r["c"] for r in hashed_features(docs, dim=128).collect()}
    b = {
        (r["id"], r["fid"]): r["c"]
        for r in hashed_features(docs.repartition(7), dim=128).collect()
    }
    assert a == b
