"""End-to-end WEB-curation composition: the scrape-side pipeline that
precedes test_curation_e2e's corpus pipeline — markup strip → C4 line
cleaning → script routing → Gopher gate → source-quality PageRank over
a citation graph → quality-weighted sampling.  All lazy until the final
actions; each stage is an operator this engine ships."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmap_spark.functions.text import (
    c4_clean,
    gopher_rules,
    script_profile,
    strip_markup,
)
from cosmap_spark.operators.graph import pagerank
from cosmap_spark.operators.sampler import weighted_sample
from cosmap_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_web_curation_pipeline(spark):
    docs = load_table(spark, SF, "documents")
    n_in = docs.count()

    # 0. wrap fixtures in scrape-shaped noise so the cleaners have work:
    # markup around the text, a boilerplate line, a too-short line.
    # The fixture corpus is stopword-free word salad, so the wrapper
    # also supplies the natural-prose tail a real document would have
    # (otherwise the Gopher stopword rule correctly rejects everything).
    raw = docs.select(
        "doc_id", "lang", "source",
        F.concat(
            F.lit("<html><script>var x=1;</script><body>"),
            F.col("text"),
            F.lit(" and that is to be the end of it with closure.\n"),
            F.lit("Enable javascript to continue please now.\nToo short.\n"),
            F.lit("</body></html>"),
        ).alias("raw_html"),
    )

    # 1. markup strip (regex boilerplate core), then C4 line rules
    stripped = raw.withColumn("text", strip_markup(F.col("raw_html")))
    cleaned = stripped.withColumn("c4", c4_clean(F.col("text")))
    # every injected doc keeps its (now one-line) body and loses the
    # boilerplate/short lines — the text survives as ≥1 kept line
    assert cleaned.where(F.col("c4.n_kept") < 1).count() == 0
    boiler_free = cleaned.where(
        ~F.lower(F.col("c4.clean_text")).contains("javascript")
    )
    assert boiler_free.count() == n_in

    # 2. script routing: keep the latin-script lane
    routed = boiler_free.withColumn("sp", script_profile(F.col("c4.clean_text")))
    latin = routed.where(F.col("sp.dominant_script") == "latin")
    assert latin.count() == n_in  # fixture corpus is latin

    # 3. Gopher document gate (audit columns kept alongside the verdict)
    gated = latin.withColumn("g", gopher_rules(F.col("c4.clean_text")))
    kept = gated.where(F.col("g.passes"))
    n_kept = kept.count()
    assert 0 < n_kept <= n_in

    # 4. source-quality prior: PageRank over a deterministic synthetic
    # citation graph between sources (doc i cites doc i*2+1's source)
    edges = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("b.doc_id") == F.col("a.doc_id") * 2 + 1)
        .select(
            F.col("a.source").alias("src"), F.col("b.source").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
    )
    ranks = pagerank(edges, max_iterations=8)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6

    # 5. quality-weighted sampling: keep probability ∝ source rank
    # (normalized to max 1), deterministic
    max_rank = ranks.agg(F.max("rank")).collect()[0][0]
    weighted = kept.join(
        F.broadcast(ranks.withColumnRenamed("node", "source")), "source", "left"
    ).withColumn(
        "w", F.coalesce(F.col("rank") / F.lit(max_rank), F.lit(0.1))
    )
    sampled = weighted_sample(
        weighted, weight_col="w", key_cols=["doc_id"], seed=3
    )
    n_sampled = sampled.count()
    assert n_sampled <= n_kept
    # determinism of the whole tail
    again = weighted_sample(
        weighted, weight_col="w", key_cols=["doc_id"], seed=3
    ).count()
    assert again == n_sampled
