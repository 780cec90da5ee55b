#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is executed to completion (count() — forces full evaluation
without driver-side materialization of rows) after a shared-session
warm-up; per-query wall-clock is reported, plus the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: the headline set: one per engine capability pillar
HEADLINE = [
    "q_sample_agg",       # flagship: spatial cone join + per-sample agg
    "q_cone_search",      # raw spatial join throughput
    "q_join_variants",    # the equi-join zoo (inner/broadcast/outer/semi/anti)
    "q_window_frames",    # window functions (running/first/last frames)
    "q_agg_suite",        # shuffle aggregation (distinct/bit/arg-max)
    "q_stream_windows",   # time-window aggregation (tumble/slide/late)
    "q_udtf_grouped_map", # Arrow applyInPandas path
    "q_text_profile",     # text analysis over documents
    "q_dedup_exact",      # dedup hash-agg
    "q_knn_cosine",       # vector similarity search
    "q_topk",             # global top-k
    "q_tpch_local_supplier",  # 6-way mixed broadcast/shuffle join
    "q_dedup_ngram",      # shingle-join near-dup (capped candidate gen)
    "q_passage_dedup",    # sub-document passage dedup (md5 winner election)
    "q_join_overlap",     # interval-overlap join (grid equi-join + residual)
    "q_knn_ann",          # bucketed approximate vector search (LSH + IVF)
    "q_tfidf",            # corpus featurization (explode + two groupBys)
    "q_resample",         # time-series grid resample + window fills
    "q_decontam",         # benchmark decontamination (broadcast shingle join)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from cosmap_spark.session import get_spark

    spark = get_spark(app_name="cosmap-bench", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from cosmap_spark.queries import all_queries

    queries = all_queries()
    # Warm-up at the smallest SF: JVM JIT + whole-stage-codegen compile,
    # parquet footer caches, and the reusable Python-worker pool (Arrow
    # UDF path) — one-time environment costs, not per-query costs.
    warm_dir = "/root/testdata/sf0.001"
    for w in ("q_topk", "q_sample_agg", "q_udtf_grouped_map", "q_knn_cosine",
              "q_dedup_ngram", "q_knn_ann"):
        queries[w](spark, warm_dir).count()

    # Two timed runs per query, report the min: the first run at the
    # target SF still pays one-time plan costs (AQE stats, codegen for
    # this plan's shape, shuffle-file creation); the min is the
    # steady-state per-query throughput a resident engine delivers.
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt
    spark.stop()

    print(json.dumps({
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
