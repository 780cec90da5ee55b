"""Corpus report — the "data card" summary a curation pipeline publishes
with every corpus snapshot (per-source composition, token statistics,
quality, duplication), computed in two passes over the corpus:

* one ``groupBy(group_col)`` for all per-document statistics (Spark's
  partial/final split ships O(groups) accumulator tuples, including the
  exact-percentile buffers);
* one hash-dedup aggregate for the duplicate rate (shuffles 16-byte
  md5s, never documents — same shape as ``exact_dedup``).

Everything is JVM-side expressions over :mod:`cosmap_spark.functions.text`;
the output is groups-sized (tiny), safe to collect or publish anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmap_spark.functions.text import n_tokens, quality_score


def corpus_report(
    df: DataFrame,
    *,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per ``group_col`` value:

    ``n_docs, total_tokens, p50_tokens, p90_tokens, avg_quality,
    n_distinct_texts, dup_rate`` — ``dup_rate`` is the fraction of
    documents whose exact text occurs more than once within the group
    (the quantity exact dedup would remove, canonical copies excluded).
    """
    text = F.col(text_col)
    nt = n_tokens(text)
    stats = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(nt).alias("total_tokens"),
        F.percentile(nt, F.lit(0.5)).cast("double").alias("p50_tokens"),
        F.percentile(nt, F.lit(0.9)).cast("double").alias("p90_tokens"),
        F.round(F.avg(quality_score(text)), 6).alias("avg_quality"),
    )
    per_text = df.groupBy(group_col, F.md5(text).alias("__h")).agg(
        F.count("*").alias("n_copies")
    )
    dup = per_text.groupBy(group_col).agg(
        F.count("*").alias("n_distinct_texts"),
        F.sum(F.col("n_copies") - 1).alias("__n_dropped"),
    ).withColumnRenamed(group_col, "__g")
    # null-safe join key: unlabeled documents (NULL group) are a real
    # row of the data card, not silently dropped by the equi-join
    return (
        stats.join(dup, stats[group_col].eqNullSafe(dup["__g"]))
        .drop("__g")
        .withColumn(
            "dup_rate",
            F.round(F.col("__n_dropped").cast("double") / F.col("n_docs"), 6),
        )
        .drop("__n_dropped")
    )


def plan_summary(df) -> dict:
    """Parse a DataFrame's FORMATTED physical plan into the counters
    that decide whether it survives a 100× scale-up — the
    introspection tool behind the repo's plan-audit discipline
    (tests/test_plan_audit.py), exposed for users and CI gates:

    ``exchanges``            SHUFFLE exchanges only (each is a full
                             network pass; broadcast/reused exchanges
                             are counted separately);
    ``broadcast_exchanges``  broadcast ships of a small side;
    ``broadcast_joins`` /
    ``sortmerge_joins`` /
    ``shuffled_hash_joins``  join strategy mix;
    ``nested_loop_joins`` /
    ``cartesian_products``   the quadratic hazards (should be 0);
    ``python_evals``         row-at-a-time Python (should be 0) vs
    ``arrow_evals``          sanctioned Arrow-vectorized Python;
    ``codegen_spans``        WholeStageCodegen regions (bigger = more
                             of the plan fused JVM-side);
    ``scans``                per-scan ``(pushed_filters, read_schema)``
                             so column pruning and predicate pushdown
                             are checkable.

    Counters come from the formatted plan's NODE HEADERS
    (``(n) NodeName`` lines) — each physical node appears exactly once
    there, unlike raw substring counts, which see every node twice
    (tree + detail section) and would double every counter.  String
    parsing by necessity — Spark exposes no stable structured plan API
    to Python — keyed on operator names stable across 3.x/4.x.

    AQE caveat: before execution the summary reflects the INITIAL
    adaptive plan; ``codegen_spans`` (and runtime join demotions)
    appear only after executing THIS DataFrame's own query execution —
    ``df.collect()``, not ``df.count()``, which builds a separate
    aggregated execution."""
    import re

    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # codegen regions only surface as `*(n)` stars in SIMPLE mode (and
    # for AQE plans only once executed — isFinalPlan=true)
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    scans = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        scans.append({"pushed_filters": m.group(1), "read_schema": None})
    for i, m in enumerate(re.finditer(r"ReadSchema: (\S+)", plan)):
        if i < len(scans):
            scans[i]["read_schema"] = m.group(1)
        else:
            scans.append({"pushed_filters": None, "read_schema": m.group(1)})
    from collections import Counter

    nodes = Counter(
        re.findall(r"(?m)^\(\d+\) (\S+)", plan)
    )
    return {
        "exchanges": nodes["Exchange"],
        "broadcast_exchanges": nodes["BroadcastExchange"],
        "broadcast_joins": nodes["BroadcastHashJoin"],
        "sortmerge_joins": nodes["SortMergeJoin"],
        "shuffled_hash_joins": nodes["ShuffledHashJoin"],
        "nested_loop_joins": nodes["BroadcastNestedLoopJoin"],
        "cartesian_products": nodes["CartesianProduct"],
        "python_evals": nodes["BatchEvalPython"],
        "arrow_evals": (
            nodes["ArrowEvalPython"]
            + nodes["FlatMapGroupsInPandas"]
            + nodes["MapInPandas"]
            + nodes["PythonMapInArrow"]
            + nodes["FlatMapCoGroupsInPandas"]
        ),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "scans": scans,
        "plan": plan,
    }


def table_profile(df, *, rsd: float = 0.02) -> dict:
    """One-pass data profile of ANY table: per column — null count,
    approximate distinct count (HLL sketch aggregate), min/max, and for
    numerics mean/stddev — the generic data-card a pipeline publishes
    next to every table it writes (``corpus_report`` is the
    documents-specialized sibling).

    ONE aggregation job regardless of column count: every statistic is
    an aggregate expression in a single ``agg`` pass, so the scan cost
    is paid once and the sketch/partial states shuffle as one combine —
    never a per-column job (the ``describe()`` trap at 100 TB is
    per-column passes and exact distincts).  Returns
    ``{"n_rows": ..., "columns": {name: {stat: value}}}``."""
    from pyspark.sql import functions as F

    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, dtype in df.dtypes:
        c = F.col(name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"__nulls__{name}"))
        base = dtype.split("(")[0]
        if base in numeric or base in ("string", "date", "timestamp", "boolean", "decimal"):
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"__dist__{name}"))
            aggs.append(F.min(c).alias(f"__min__{name}"))
            aggs.append(F.max(c).alias(f"__max__{name}"))
        if base in numeric or base == "decimal":
            aggs.append(F.round(F.avg(c), 6).alias(f"__avg__{name}"))
            aggs.append(F.round(F.stddev(c), 6).alias(f"__std__{name}"))
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict = {"n_rows": row["__n"], "columns": {}}
    for name, dtype in df.dtypes:
        col: dict = {"dtype": dtype, "nulls": row[f"__nulls__{name}"]}
        for stat in ("dist", "min", "max", "avg", "std"):
            key = f"__{stat}__{name}"
            if key in row:
                col["approx_distinct" if stat == "dist" else stat] = row[key]
        out["columns"][name] = col
    return out


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    *,
    top_n: int = 10,
    accuracy: int = 10_000,
) -> dict:
    """Key-distribution diagnostics for a prospective join/aggregation
    key — the decision input for the engine's three skew remedies
    (AQE skew-join splitting, salting via ``salted_agg``, broadcast):

    ``n_rows, n_keys, max_count, p50/p90/p99_count``, the ``top``
    heavy-hitter list, ``skew_ratio`` (max/p50 — >100 means AQE will
    split or a salt is needed), and ``suggested_salt`` (the factor that
    levels the heaviest key down to p99; 1 = no salting needed).

    Cost: ONE groupBy over the key (the same shuffle the real
    join/agg would pay) feeding one sketch aggregation and one
    ``top_n`` TakeOrdered — output is O(top_n), driver-safe at any
    scale."""
    import math

    counts = df.groupBy(*key_cols).agg(F.count("*").alias("__c"))
    stats = counts.agg(
        F.sum("__c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("__c").alias("max_count"),
        F.percentile_approx(
            "__c", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), accuracy
        ).alias("q"),
    ).collect()[0]
    if stats["n_rows"] is None:  # empty input: report zeros, don't crash
        return {
            "n_rows": 0, "n_keys": 0, "max_count": 0,
            "p50_count": 0.0, "p90_count": 0.0, "p99_count": 0.0,
            "skew_ratio": 0.0, "suggested_salt": 1, "top": [],
        }
    heavy = (
        counts.orderBy(F.col("__c").desc(), *key_cols)
        .limit(top_n)
        .collect()
    )
    p50, p90, p99 = (float(x) for x in stats["q"])
    max_count = int(stats["max_count"])
    skew_ratio = max_count / max(p50, 1.0)
    suggested_salt = max(1, math.ceil(max_count / max(p99, 1.0)))
    return {
        "n_rows": int(stats["n_rows"]),
        "n_keys": int(stats["n_keys"]),
        "max_count": max_count,
        "p50_count": p50,
        "p90_count": p90,
        "p99_count": p99,
        "skew_ratio": round(skew_ratio, 2),
        "suggested_salt": suggested_salt,
        "top": [
            {**{c: r[c] for c in key_cols}, "count": int(r["__c"])}
            for r in heavy
        ],
    }


def pair_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    *,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """One-row ``[n_candidates, n_truth, tp, fp, fn, precision,
    recall, f1]`` for a pair-emitting operator against ground truth —
    the tuning loop for every approximate dedup path (MinHash bands,
    SimHash chunks, SemDeDup thresholds...).

    Pairs on both sides are canonicalized to (min, max) id order and
    deduplicated first, so callers may emit either orientation.  Cost:
    two tiny aggregations + one equi-join on the pair key — both
    inputs are PAIR sets (operator output), never the corpus."""
    a, b = id_cols

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        ).distinct()

    c, t = canon(candidates), canon(truth)
    tp = c.join(t, ["u", "v"]).count()
    n_c, n_t = c.count(), t.count()
    fp, fn = n_c - tp, n_t - tp
    prec = tp / n_c if n_c else 0.0
    rec = tp / n_t if n_t else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    spark = candidates.sparkSession
    return spark.createDataFrame(
        [(n_c, n_t, tp, fp, fn, round(prec, 6), round(rec, 6),
          round(f1, 6))],
        "n_candidates LONG, n_truth LONG, tp LONG, fp LONG, fn LONG, "
        "precision DOUBLE, recall DOUBLE, f1 DOUBLE",
    )


def threshold_sweep(
    scored_pairs: DataFrame,
    truth: DataFrame,
    thresholds: list[float],
    *,
    score_col: str = "score",
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    higher_is_better: bool = True,
) -> DataFrame:
    """Precision/recall/F1 at EVERY cut-off in ONE pass over the
    scored pairs: each candidate is truth-flagged by one left join,
    then every threshold is a pair of conditional sums inside a single
    aggregate (the expectations-validator discipline — no per-
    threshold re-scan).  Candidates are canonicalized to (min, max)
    orientation and DEDUPLICATED to one row per pair first — keeping
    the best score (max, or min when ``higher_is_better=False``) — so
    a pair emitted in both orientations counts once, same contract as
    :func:`pair_metrics`.  Returns ``[threshold, kept, tp, precision,
    recall, f1]`` ordered by threshold."""
    if not thresholds:
        raise ValueError("need at least one threshold")
    a, b = id_cols
    t = truth.select(
        F.least(F.col(a), F.col(b)).alias("u"),
        F.greatest(F.col(a), F.col(b)).alias("v"),
    ).distinct()
    n_truth = t.count()
    best = F.max("__s") if higher_is_better else F.min("__s")
    flagged = (
        scored_pairs.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
            F.col(score_col).alias("__s"),
        )
        .groupBy("u", "v")
        .agg(best.alias("__s"))
        .join(t.withColumn("__t", F.lit(True)), ["u", "v"], "left")
        .withColumn("__t", F.coalesce(F.col("__t"), F.lit(False)))
    )
    keep = (
        (lambda th: F.col("__s") >= th)
        if higher_is_better
        else (lambda th: F.col("__s") <= th)
    )
    agg = flagged.agg(
        *[
            x
            for i, th in enumerate(thresholds)
            for x in (
                F.coalesce(F.sum(keep(th).cast("long")), F.lit(0)).alias(
                    f"__k_{i}"
                ),
                F.coalesce(
                    F.sum((keep(th) & F.col("__t")).cast("long")), F.lit(0)
                ).alias(f"__tp_{i}"),
            )
        ]
    )
    per = F.array(
        *[
            F.struct(
                F.lit(float(th)).alias("threshold"),
                F.col(f"__k_{i}").alias("kept"),
                F.col(f"__tp_{i}").alias("tp"),
            )
            for i, th in enumerate(thresholds)
        ]
    )
    prec = F.when(
        F.col("__r.kept") > 0, F.col("__r.tp") / F.col("__r.kept")
    ).otherwise(0.0)
    rec = (F.col("__r.tp") / F.lit(n_truth)) if n_truth else F.lit(0.0)
    f1 = F.when(
        (prec + rec) > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(0.0)
    return (
        agg.select(F.explode(per).alias("__r"))
        .select(
            F.col("__r.threshold").alias("threshold"),
            F.col("__r.kept").alias("kept"),
            F.col("__r.tp").alias("tp"),
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(f1, 6).alias("f1"),
        )
        .orderBy("threshold")
    )
