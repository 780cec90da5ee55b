"""Runnable WEB-curation example — the scrape-side pipeline that feeds
examples/curation (same composition as tests/test_webcuration_e2e.py):

    python examples/webcuration/run.py [sf_dir] [out_dir]

Stages, all lazy until the final writes:

1. markup strip (line structure preserved for the line-level filters);
2. C4 line cleaning (Raffel et al. 2020 §2.2);
3. Unicode script routing (keep the latin lane);
4. Gopher document gate (Rae et al. 2021), audit struct kept;
5. source-quality PageRank over a synthetic citation graph;
6. rank-weighted deterministic sampling;
7. parquet write + a one-pass table profile of the result.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from cosmap_spark.functions.text import (
    c4_clean,
    gopher_rules,
    script_profile,
    strip_markup,
)
from cosmap_spark.operators.graph import pagerank
from cosmap_spark.operators.report import table_profile
from cosmap_spark.operators.sampler import weighted_sample
from cosmap_spark.session import get_spark
from cosmap_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="webcurated_")
    spark = get_spark(app_name="webcuration-example")
    spark.sparkContext.setLogLevel("WARN")

    docs = load_table(spark, sf_dir, "documents")
    # fixture corpus is stopword-free word salad; give each doc the
    # natural-prose tail a real page would have so the Gopher stopword
    # rule has something to find (see tests/test_webcuration_e2e.py)
    raw = docs.select(
        "doc_id", "lang", "source",
        F.concat(
            F.lit("<html><body>"),
            F.col("text"),
            F.lit(" and that is to be the end of it with closure.\n"),
            F.lit("Enable javascript to continue.\n</body></html>"),
        ).alias("raw_html"),
    )

    cleaned = (
        raw.withColumn("text", strip_markup(F.col("raw_html")))
        .withColumn("c4", c4_clean(F.col("text")))
        .withColumn("sp", script_profile(F.col("c4.clean_text")))
        .where(F.col("sp.dominant_script") == "latin")
        .withColumn("g", gopher_rules(F.col("c4.clean_text")))
        .where(F.col("g.passes"))
    )

    edges = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("b.doc_id") == F.col("a.doc_id") * 2 + 1)
        .select(F.col("a.source").alias("src"), F.col("b.source").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    ranks = pagerank(edges, max_iterations=8)
    max_rank = ranks.agg(F.max("rank")).collect()[0][0]

    sampled = weighted_sample(
        cleaned.join(
            F.broadcast(ranks.withColumnRenamed("node", "source")), "source", "left"
        ).withColumn("w", F.coalesce(F.col("rank") / F.lit(max_rank), F.lit(0.1))),
        weight_col="w", key_cols=["doc_id"], seed=3,
    )

    result = sampled.select(
        "doc_id", "lang", "source",
        F.col("c4.clean_text").alias("text"),
        F.col("g").alias("quality_audit"),
        F.col("rank").alias("source_rank"),
    )
    result.write.mode("overwrite").parquet(f"{out}/web_curated")
    # read the WRITTEN table back for the count/profile: each of those
    # is an action, and re-running the lazy pipeline (strip + C4 +
    # PageRank + joins) twice more would triple the run for no reason
    written = spark.read.parquet(f"{out}/web_curated")
    profile = table_profile(
        written.select("doc_id", "lang", "source", "text", "source_rank")
    )
    print(json.dumps({
        "n_in": docs.count(),
        "n_out": written.count(),
        "out": f"{out}/web_curated",
        "profile_n_rows": profile["n_rows"],
        "null_ranks": profile["columns"]["source_rank"]["nulls"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
