"""Link-graph operators for corpus curation.

Web-scale training-data pipelines score documents by the link structure
of their sources (PageRank over the domain graph is the classic
quality prior — used as a filter signal from the original Common Crawl
pipelines onward).  The graph here is any ``(src, dst)`` edge
DataFrame; at 100 TB the natural unit is the DOMAIN graph (~10^8
nodes), built by one groupBy from per-page link tables.

Scale shape of the iteration (same discipline as
``dedup.dedup_clusters``):

* edges carry ``(src, dst, out_deg)`` and are hash-partitioned on
  ``src`` ONCE and cached — every iteration's rank join reuses that
  layout, so the per-iteration cost is one shuffle (the contribution
  aggregation on ``dst``) plus the map-side join;
* the only driver traffic per iteration is two scalars (dangling mass,
  L1 delta) — never rank rows;
* ``localCheckpoint`` every few iterations truncates the lineage that
  would otherwise grow linearly with iterations (the classic iterative-
  DataFrame failure mode);
* hot ``dst`` keys (every domain links to wikipedia) are absorbed by
  partial aggregation (map-side combine) — the agg input is edges, the
  output one row per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, *, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node ``(node, out_deg, in_deg)`` — one aggregation each side,
    full-outer merged; missing side = 0."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Power-iteration PageRank → ``(node, rank)``; ranks sum to 1.

    Standard semantics (Page et al. 1999): uniform init, damping d,
    dangling-node mass redistributed uniformly each step:

        rank'(v) = (1-d)/N + d·(Σ_{u→v} rank(u)/out_deg(u) + dangling/N)

    Stops after ``max_iterations`` or when the L1 rank change drops
    below ``tol``.  Deterministic — no RNG, no order dependence (sums
    are per-key aggregations).

    Driver cost per iteration: two 1-row collects (dangling mass + L1
    delta).  Cluster cost per iteration: one map-side join on the
    cached src-partitioned edge table + one aggregation shuffle on
    ``dst``.  Lineage is truncated with ``localCheckpoint`` every
    ``checkpoint_every`` iterations."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    # partition the (static) weighted edge list on src once; every
    # iteration's join then reuses this exchange
    ew = (
        e.join(out_deg, e["src"] == out_deg["node"])
        .select("src", "dst", "out_deg")
        .repartition("src")
        .cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    has_out = out_deg.select("node")
    for it in range(max_iterations):
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_sum"))
        )
        new_ranks = (
            ranks.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("in_sum", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        checkpointed = (it + 1) % checkpoint_every == 0 or it == max_iterations - 1
        if checkpointed:
            new_ranks = new_ranks.localCheckpoint()
        delta = (
            new_ranks.withColumnRenamed("rank", "new_rank")
            .join(ranks, "node")
            .agg(F.sum(F.abs(F.col("new_rank") - F.col("rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta < tol:
            if not checkpointed:
                # the early-convergence exit must not hand back a frame
                # whose lineage replays up to checkpoint_every iterations
                # of joins over the edge cache unpersisted just below
                ranks = ranks.localCheckpoint()
            break
    ew.unpersist()
    return ranks.select("node", F.round("rank", 9).alias("rank"))
