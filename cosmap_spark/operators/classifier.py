"""Hash-feature linear quality classifier (SURVEY.md §2.5, round 3).

The fastText-style document filter every large-scale curation pipeline
runs (GPT-3's WebText-likeness LR, CCNet's linear quality model): a
logistic regression over hashed bag-of-words counts, trained by batch
gradient descent where EVERY per-example pass is a DataFrame
aggregation and only the O(dim) weight vector ever touches the driver
(the same driver/executor split as the IVF Lloyd step in
operators/knn.py — tiny model state driver-side, all data passes
distributed).

Scale shape per training iteration:

* scores: (doc, feature, count) ⋈ broadcast(weights) → groupBy(doc) —
  one exchange on doc_id, map-side combined;
* gradient: the per-doc error joins back to the feature table on
  doc_id, then groupBy(feature) — one exchange each; the gradient
  table is dim-sized, collected to the driver (dim ≤ a few thousand).

Serving (``score_documents``) is map-side only: the weight vector
ships with the plan as one literal array (the centroid-literal
pattern), each document folds its tokens through ``aggregate`` — no
join, no shuffle, whole-stage codegen.

Feature hashing uses ``xxhash64(token, seed) mod dim`` (Weinberger et
al. 2009) — no vocabulary, no driver state, deterministic across
partitionings and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmap_spark.functions.text import tokens


def _weight_literal(weights: list[float]):
    """The weight vector as ONE parsed literal array expression (a
    single py4j round trip; see operators/knn.py:_centroid_array)."""
    body = ", ".join(f"CAST({float(w)!r} AS DOUBLE)" for w in weights)
    return F.expr(f"array({body})")


def hashed_features(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    seed: int = 41,
) -> DataFrame:
    """Sparse hashed bag-of-words: ``[id, fid, c]`` with
    ``fid = xxhash64(token, seed) mod dim`` and ``c`` the in-document
    count.  One explode + one map-side-combined groupBy."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .select("id", F.pmod(F.xxhash64("tok", F.lit(seed)), F.lit(dim)).alias("fid"))
        .groupBy("id", "fid")
        .agg(F.count("*").cast("double").alias("c"))
    )


def score_documents(
    df: DataFrame,
    weights: list[float],
    *,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 41,
) -> DataFrame:
    """Map-side serving: ``[id, score]`` with
    ``score = sigmoid(bias + Σ_tokens w[h(token)])`` — the per-token
    fold form (each occurrence adds its hashed weight), identical to
    the count-weighted sum the trainer optimizes.  No join, no shuffle;
    the weight vector is a plan literal."""
    dim = len(weights)
    w_lit = _weight_literal(weights)
    s = F.aggregate(
        tokens(F.col(text_col)),
        F.lit(float(bias)),
        lambda acc, x: acc
        + F.element_at(w_lit, (F.pmod(F.xxhash64(x, F.lit(seed)), F.lit(dim)) + 1).cast("int")),
    )
    return df.select(
        F.col(id_col).alias("id"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-s))).alias("score"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    dim: int = 1024,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 41,
) -> tuple[list[float], float]:
    """Batch-gradient logistic regression over hashed features.

    ``labeled`` needs a {0,1} ``label_col``.  Returns ``(weights,
    bias)`` for ``score_documents``.  Deterministic: zero init, fixed
    hashing, fixed step schedule — the same inputs give the same model
    on any cluster or partitioning.

    The feature table is computed ONCE and cached across iterations
    (it is the only corpus-sized state); each iteration runs two
    bounded aggregations and collects only the dim-sized gradient.
    """
    feats = hashed_features(
        labeled, text_col=text_col, id_col=id_col, dim=dim, seed=seed
    ).localCheckpoint(eager=True)
    labels = labeled.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    ).localCheckpoint(eager=True)
    n = labels.count()

    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        _, grad = _iteration_frames(feats, labels, w, b)
        # ONE job per iteration: the bias gradient rides the same
        # collect as fid = -1 (two actions re-ran the corpus-sized
        # scored lineage twice — cross-job exchange reuse doesn't exist)
        b_grad = 0.0
        for r in grad.collect():
            i = int(r["fid"])
            if i == -1:
                b_grad = r["g"] / n
            else:
                w[i] -= lr * (r["g"] / n + l2 * w[i])
        b -= lr * b_grad
    return w, b


def _iteration_frames(
    feats: DataFrame, labels: DataFrame, w: list[float], b: float
) -> tuple[DataFrame, DataFrame]:
    """One gradient-descent iteration's two DataFrames: per-document
    error ``[id, e]`` and per-feature gradient ``[fid, g]``.

    Separated from the loop so the plan-audit suite can gate the shape
    of EVERY data pass the trainer makes (tests/test_plan_summary.py):
    the O(dim) weight table broadcasts, both aggregations are
    map-side-combined groupBys, and no Python ever touches the
    corpus-sized feature table.  The bias gradient rides the gradient
    frame as the ``fid = -1`` row, so one action evaluates the whole
    iteration — the duplicated ``scored`` subtree inside one job is an
    identical exchange AQE reuses, where two separate actions re-ran
    it."""
    w_df = F.broadcast(
        feats.sparkSession.createDataFrame(
            [(i, float(wi)) for i, wi in enumerate(w)], "fid long, w double"
        )
    )
    scored = (
        feats.join(w_df, "fid")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("w")).alias("s"))
    )
    err = (
        labels.join(scored, "id", "left")
        .select(
            "id",
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(b))))
                - F.col("y")
            ).alias("e"),
        )
    )
    grad = (
        feats.join(err, "id")
        .groupBy("fid")
        .agg(F.sum(F.col("c") * F.col("e")).alias("g"))
        .unionByName(
            err.agg(
                F.coalesce(F.sum("e"), F.lit(0.0)).alias("g")
            ).select(F.lit(-1).cast("long").alias("fid"), "g")
        )
    )
    return err, grad


def classifier_auc(scores: DataFrame, labels: DataFrame) -> float:
    """Rank-based AUC (Mann-Whitney) computed distributed: the global
    score rank comes from the sharded prefix-sum ``global_rank`` (never
    a one-task ``Window.orderBy`` — the serialization hazard every
    global rank here avoids), then one aggregation; the driver sees
    three numbers.  Tied scores rank by ``(score, id)`` — a TOTAL
    order, so the result is deterministic across runs and partition
    layouts even when scores saturate/repeat (ranking by score alone
    left tie order to row arrival).  The tie treatment is
    arbitrary-but-consistent distinct ranks; the mid-rank tie
    correction is negligible for continuous scores."""
    from cosmap_spark.operators.packing import global_rank

    joined = scores.join(labels, "id").select(
        "id", "score", F.col("y").cast("double").alias("y")
    )
    ranked, _ = global_rank(joined, ["score", "id"], out_col="r")
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1.0, F.col("r"))).alias("rpos"),
        F.sum(F.when(F.col("y") == 1.0, 1.0).otherwise(0.0)).alias("npos"),
        F.count("*").cast("double").alias("n"),
    ).collect()[0]
    # SUM over zero rows is NULL: an empty score set must yield the
    # same NaN as a single-class one, not a driver TypeError
    npos, n = agg["npos"] or 0.0, agg["n"]
    nneg = n - npos
    if npos == 0 or nneg == 0:
        return float("nan")
    return (agg["rpos"] - npos * (npos + 1) / 2.0) / (npos * nneg)


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
