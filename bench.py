#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...,
     "machine_calibration_sec": ...,
     "knn_ann_split": {"train": ..., "serve": ...},
     "scaling": {"factors": [...], "queries": {...}}}

``machine_calibration_sec`` times a fixed engine-independent synthetic
workload (hash + shuffle agg over 20M generated rows): rounds run on
sandboxes differing up to ~2× in speed, so cross-round query
comparisons should be made on time/calibration ratios.
``calibration_sections`` re-runs the same probe before the headline
loop, before the knn split, and before EVERY scaling factor (round-5
verdict ask: mid-run sandbox load was invisible in the artifact, so a
slow cell could not be told apart from a slow machine).

Each query is executed to completion (count() — forces full evaluation
without driver-side materialization of rows) after a shared-session
warm-up; per-query wall-clock is reported, plus the total (``value`` is
the HEADLINE total only — the split/scaling sections are supplementary
measurements, not double-counted).

``knn_ann_split`` separates q_knn_ann's one-time index training
(ivf_build + pq_train) from the serving path (the union re-run against
prebuilt artifacts) — the serve number is the decision-relevant
throughput of a persisted index.  The tsearch branch is excluded from
the split (tsearch=False): it has no trainable artifact, so including
it would blur the persisted-index signal the split exists to isolate
(its cost is visible in the headline q_knn_ann number).

``scaling`` times the scale-sensitive queries on replicated-but-
DECORRELATED copies of the sf0.1 documents/embeddings (per-replica
token suffixes / cyclic vector rotation, so dedup pair structure stays
replica-local and the workload per row matches the original — plain
replication would instead make every document a 10-way exact dup and
measure a different workload).  Slopes near 1.0 in the factor mean
linear scaling; SCALE.md interprets the numbers.  Set
SPARK_GRAFT_SKIP_SCALING=1 to skip (e.g. quick local iterations).
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


#: queries re-timed at growing data factors (all read only
#: documents/embeddings/events, the tables the builder replicates)
SCALING_SET = [
    "q_dedup_ngram", "q_passage_dedup", "q_decontam", "q_knn_ann",
    "funnel_sliding", "merge_upsert", "bm25_scored", "kmv_overlap",
]
SCALING_FACTORS = [1, 4, 10]


def _funnel_sliding_bench(spark, sf_dir: str):
    """Scaling workload for the sliding-anchor funnel kernel (round-5
    verdict ask #7): one user exchange + one Arrow pass over the
    replicated events (replicas shift user ids, so per-replica funnel
    work equals the original's — cells should scale flat-to-linear)."""
    from cosmap_spark.operators.funnel import funnel_sliding
    from cosmap_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return funnel_sliding(ev, ["view", "click", "purchase"], horizon="2 days")


def _merge_upsert_bench(spark, sf_dir: str):
    """Scaling workload for the CDC merge algebra: a FIXED 500-row
    change batch (updates + inserts + tombstones) merged into the
    growing documents snapshot.  The claim under test is the plan
    shape — the snapshot side passes through one broadcastable anti
    join and never shuffles — so cells should scale with the
    snapshot SCAN (linear ceiling), never with batch × snapshot."""
    from pyspark.sql import functions as F

    from cosmap_spark.operators.merge import merge_upsert

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = (
        spark.range(0, 500)
        .select(
            (F.col("id") * 7).alias("doc_id"),
            F.concat(F.lit("updated text "), F.col("id").cast("string"))
            .alias("text"),
            F.col("id").alias("seq"),
            (F.col("id") % 10 == 0).alias("deleted"),
        )
    )
    for f in docs.schema.fields:
        if f.name not in batch.columns:
            batch = batch.withColumn(f.name, F.lit(None).cast(f.dataType))
    return merge_upsert(docs, batch, ["doc_id"], seq_col="seq",
                        delete_col="deleted")


_BM25_PROBES: dict = {}


def _bm25_scored_bench(spark, sf_dir: str):
    """Scaling workload for the lexical-retrieval corpus pass (round
    6): fixed 3-query probe set over the growing documents table —
    the one tokenize + vocabulary-filtered (doc, term) aggregation
    every inline search pays.  Probe terms come from replica-0 docs,
    so matches stay replica-local (the builder suffixes tokens per
    replica) and query-side work is CONSTANT; cells should scale with
    the corpus scan alone (linear ceiling)."""
    from pyspark.sql import functions as F

    from cosmap_spark.operators.retrieval import bm25_scored

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # probe terms collected ONCE per factor dir and cached: the
    # probe-building scan+collect is query-side setup, not the corpus
    # workload under test — inside the timed runs it grew with the
    # factor and contaminated the scaling slope
    probe = _BM25_PROBES.get(sf_dir)
    if probe is None:
        probe = {
            f"q{r['doc_id']}": " ".join(r["text"].split(" ")[:5])
            for r in docs.where(F.col("doc_id").isin(1, 2, 3))
            .select("doc_id", "text").collect()
        }
        _BM25_PROBES[sf_dir] = probe
    return bm25_scored(
        docs, probe, variants={"s_bm25": (1.2, 0.75), "s_idf": (0.0, 0.75)}
    )


def _kmv_overlap_bench(spark, sf_dir: str):
    """Scaling workload for the KMV sketch family (round 6): pairwise
    distinct-value overlap between 4 derived segments of the growing
    documents table.  One corpus scan feeding bounded per-partition
    partials (O(segments·k) int64s each) + a 6-pair sketch self-join
    — post-scan work is CONSTANT, so cells should track the scan."""
    from pyspark.sql import functions as F

    from cosmap_spark.operators.sketch import segment_overlap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return segment_overlap(
        docs.select(
            F.pmod(F.col("doc_id"), F.lit(4)).alias("seg"), "doc_id"
        ),
        "seg", "doc_id", k=256,
    )


#: non-registry workloads timed in the scaling section (the registry
#: is capped at 50; these are operators, not gate queries)
EXTRA_SCALING = {"funnel_sliding": _funnel_sliding_bench,
                 "merge_upsert": _merge_upsert_bench,
                 "bm25_scored": _bm25_scored_bench,
                 "kmv_overlap": _kmv_overlap_bench}


def _build_scaled(spark, base_dir: str, out_dir: str, factor: int) -> None:
    """Materialize documents/embeddings at ``factor``× the base size,
    decorrelated per replica: every token gets a replica suffix (so no
    shingle/passage ever matches across replicas and per-replica dedup
    structure equals the original's) and every embedding is CYCLICALLY
    ROTATED by a replica-specific shift — on i.i.d. coordinates the
    rotation is as good as a fresh draw (cosine to the source and to
    every other replica ≈ 0, far below any dedup threshold; an additive
    jitter would instead make every replica a 0.99+ near-dup of its
    source and measure a dup-saturated workload).  Factor 1 is ALSO
    materialized through this path (replica-0 transform only) so every
    factor reads the same array<double> layout — comparing a float32
    base against double-cast replicas would conflate data growth with a
    2× element-width change."""
    import os

    from pyspark.sql import functions as F

    # version the cache marker: a marker from an older builder (e.g. the
    # round-3 additive-jitter data) must NOT satisfy this build, or the
    # scaling section would silently compare incompatible datasets
    done = os.path.join(out_dir, "_done_rot_v3")
    if os.path.exists(done):
        return
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    # events feed q_knn_ann's tsearch branch: replicate with shifted
    # user/event ids (disjoint key spaces — windows never span
    # replicas, so per-replica search work equals the original's); ts
    # normalization via load_table so every factor lands MICROS
    from cosmap_spark.tables import load_table

    ev = load_table(spark, base_dir, "events")
    ev_parts = [
        ev if r == 0 else ev.select(
            (F.col("event_id") + r * 100_000_000).alias("event_id"),
            (F.col("user_id") + r * 1_000_000).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        ).select(*ev.columns)
        for r in range(factor)
    ]
    doc_parts = []
    emb_parts = []
    for r in range(factor):
        e = F.col("embedding")
        if r == 0:
            doc_parts.append(docs)
            emb_parts.append(
                emb.select("vec_id", F.transform(
                    e, lambda x: x.cast("double")).alias("embedding"),
                    *[c for c in emb.columns if c not in ("vec_id", "embedding")])
                .select(*emb.columns)
            )
            continue
        suffixed = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"·{r}")),
            ),
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                suffixed.alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            ).select(*docs.columns)
        )
        shift = (7 * r) % 63 + 1  # 1..63, never the identity rotation
        rotated = F.concat(
            F.slice(e, shift + 1, 64 - shift), F.slice(e, 1, shift)
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                F.transform(rotated, lambda x: x.cast("double")).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            ).select(*emb.columns)
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    v = emb_parts[0]
    for p in emb_parts[1:]:
        v = v.unionByName(p)
    d.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    v.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    e = ev_parts[0]
    for p in ev_parts[1:]:
        e = e.unionByName(p)
    e.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    with open(done, "w") as f:
        f.write("ok")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from cosmap_spark.session import get_spark

    # local-mode = ONE JVM doing driver + all executor work; the 1g
    # default heap GC-thrashes 32 concurrent tasks at the scaling
    # factors. Static conf, so it must be set here before JVM start.
    spark = get_spark(app_name="cosmap-bench", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory":
                                      os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")})
    spark.sparkContext.setLogLevel("ERROR")

    from cosmap_spark.queries import all_queries

    queries = all_queries()
    # Warm-up at the smallest SF: JVM JIT + whole-stage-codegen compile,
    # parquet footer caches, and the reusable Python-worker pool (Arrow
    # UDF path) — one-time environment costs, not per-query costs.
    warm_dir = "/root/testdata/sf0.001"
    for w in ("q_topk", "q_sample_agg", "q_udtf_grouped_map", "q_knn_cosine",
              "q_dedup_ngram", "q_knn_ann", "q_passage_dedup"):
        queries[w](spark, warm_dir).count()

    # Machine calibration: a fixed synthetic workload (hash + shuffle
    # agg over 20M generated rows — none of this repo's code) whose
    # wall-clock measures the sandbox, not the engine.  Rounds run on
    # machines that differ up to ~2×; divide query times by this number
    # before comparing across rounds.
    from pyspark.sql import functions as F

    def _calibrate() -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            (spark.range(20_000_000)
             .select(F.xxhash64("id").alias("h"))
             .groupBy(F.pmod("h", F.lit(1000)).alias("k"))
             .agg(F.count("*"), F.avg("h")).count())
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    sections: dict[str, float] = {}
    calibration = sections["headline"] = _calibrate()

    # Three timed runs per query, report the min: the first run at the
    # target SF still pays one-time plan costs (AQE stats, codegen for
    # this plan's shape, shuffle-file creation) and single-JVM GC
    # pauses add multi-second one-off noise (round-3 VERDICT finding
    # #2: a min-of-2 headline read 2× its own steady state); the min
    # is the steady-state per-query throughput a resident engine
    # delivers.
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt

    # --- q_knn_ann train/serve split (persisted-index reuse) --------------
    # train = every corpus-sized derivation a real deployment persists:
    # IVF centroids + assignment, PQ codebooks + coded corpus, LSH
    # corpus buckets (materialized via localCheckpoint, standing in for
    # the stored index tables). serve = query-side probing + candidate
    # scoring + re-rank only.
    from pyspark.sql import functions as F

    from cosmap_spark.operators.knn import ivf_build, lsh_build
    from cosmap_spark.operators.pq import (
        opq_train_gate,
        pq_encode,
        pq_train,
        rotate_vectors,
    )
    from cosmap_spark.queries.llm_ops import knn_ann_union
    from cosmap_spark.tables import load_table

    # drain the headline section's garbage before timing this cell:
    # the round-10 paired cross-tree A/B (SCALE.md "Round 10") showed
    # the serve leg at ~2.5-3.3 s on a FRESH session in BOTH the r8 and
    # r10 trees, while the in-bench cell read 6.0-6.2 s in r9/r10 runs
    # and 2.9 s in r8's — the spread is post-headline JVM state (heap
    # churn from 19 query plans), not the serve plan
    spark._jvm.System.gc()
    sections["knn_split"] = _calibrate()
    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    cents, assigned = ivf_build(emb, nlist=16, iters=1)
    assigned = assigned.localCheckpoint(eager=True)
    index = (cents, assigned)
    books = pq_train(emb, m=16, ksub=64, iters=1, dim=64)
    coded = pq_encode(
        assigned, books, id_col="nid", vec_col="nvec", keep=["cid"]
    ).localCheckpoint(eager=True)
    lsh_idx = lsh_build(emb, dim=64).localCheckpoint(eager=True)
    # OPQ artifacts (the ledger's 4th embedding branch): rotation +
    # codebooks off a hash-sample, coded rotated corpus materialized —
    # same params as the self-contained gate path
    opq_rot, opq_books = opq_train_gate(emb)
    opq_coded = pq_encode(
        rotate_vectors(emb, opq_rot), opq_books
    ).localCheckpoint(eager=True)
    # binary-quantization words (the bq branch's persisted artifact)
    from cosmap_spark.operators.knn import binarize_vectors

    bq_bits = binarize_vectors(emb, dim=64).localCheckpoint(eager=True)
    train_t = time.perf_counter() - t0
    serve_t = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        knn_ann_union(
            spark, sf_dir, index=index, codebooks=books,
            lsh_index=lsh_idx, coded=coded, tsearch=False,
            opq_rot=opq_rot, opq_books=opq_books, opq_coded=opq_coded,
            bq_bits=bq_bits,
        ).count()
        serve_t = min(serve_t, time.perf_counter() - t0)
    split = {"train": round(train_t, 3), "serve": round(serve_t, 3)}

    # --- sf-scaling section ----------------------------------------------
    scaling = None
    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        import tempfile

        scale_root = os.path.join(tempfile.gettempdir(), "cosmap_scale")
        scaling = {"base_sf": sf, "factors": SCALING_FACTORS, "queries": {}}
        per_q: dict[str, dict[str, float]] = {q: {} for q in SCALING_SET}
        # ALL factors are materialized BEFORE any timing: interleaving
        # a multi-GB parquet write with the very next factor's timed
        # runs was the round-3 ×4 anomaly (q_knn_ann 24.5 s at ×4 vs
        # 7.7 s at ×10 — write-dirtied heap + cold page cache, not a
        # plan flip; re-measured clean at 7.0 s).  A full GC between
        # build and timing drains the write's garbage.
        for factor in SCALING_FACTORS:
            # factor 1 is materialized through the same builder so all
            # factors read identical array<double> layout (see
            # _build_scaled docstring)
            _build_scaled(spark, sf_dir,
                          os.path.join(scale_root, f"{sf}x{factor}"), factor)
        spark._jvm.System.gc()
        for factor in SCALING_FACTORS:
            fdir = os.path.join(scale_root, f"{sf}x{factor}")
            sections[f"scaling_x{factor}"] = _calibrate()
            for q in SCALING_SET:
                fn = queries.get(q) or EXTRA_SCALING[q]
                # TWO untimed warm runs first: the round-6 "ngram x10"
                # repro showed single-JVM steady state for the
                # shuffle-heavy plans at x10 needs several executions
                # (C2 compilation of this plan shape at this size),
                # and the round-8 decontam repro (50.6 → 3.0 → 2.05 →
                # 1.97 s across consecutive cycles) showed ONE warm
                # run still leaves the first timed run 1-2 executions
                # short of steady state — min-of-3 was measuring the
                # warm-up descent, not throughput
                fn(spark, fdir).count()
                fn(spark, fdir).count()
                best = float("inf")
                # min-of-3: single-JVM GC pauses at the larger factors
                # add multi-second one-off noise
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, fdir).count()
                    best = min(best, time.perf_counter() - t0)
                per_q[q][str(factor)] = round(best, 3)
        scaling["queries"] = per_q
        # ×10 core-scaling probes (round 11, additions-only): every
        # sf0.1 headline cell is overhead-bound (r10 scaling block: no
        # 8→32-core ratio above 1.45), so the driver's low-core re-run
        # cannot distinguish serial code from small data.  Surfacing
        # the two shuffle-heavy cells AT ×10 as extra ``queries``
        # entries gives the cross-core comparison a data volume where
        # parallelism is visible.  They are NOT added to ``value`` —
        # the 19-cell headline total stays comparable round-over-round
        # — and they reuse the scaling section's measurements (same 2
        # warms + min-of-3), so the timed path is unchanged.
        for q in ("q_dedup_ngram", "q_passage_dedup"):
            timings[f"{q}_x10"] = per_q[q]["10"]

    spark.stop()

    out = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "machine_calibration_sec": calibration,
        "calibration_sections": sections,
        "knn_ann_split": split,
    }
    if scaling is not None:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
