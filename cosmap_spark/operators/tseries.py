"""Distributed time-series subsequence similarity search.

Find the top-k length-``m`` windows of a keyed, ordered value series
that are closest to one or more query patterns under (optionally
z-normalized) Euclidean distance — the UCR-suite/MASS semantics,
re-expressed for a partitioned engine.  The reference has no
time-series surface at all
(`/root/reference/src/cosmap/analysis/analysis.py:19-33` — per-sample
spatial work only); this operator exists for the engine's own
time-series pillar (asof/resample/session already in the ledger) and
follows the segment-with-halo decomposition of the distributed
subsequence-search literature (EDBT 2019, PAPERS.md).

Scale shape, in order of cost:

1. ONE exchange: rows shuffle/sort by (key, order) to number positions
   — the same exchange any per-key window function pays.  No other
   corpus-sized movement exists.
2. Segments with halo: each key's series is cut into length-``L``
   segments, and the FIRST ``m-1`` rows of each segment are also
   copied to the previous one, so every window crossing a boundary is
   computed by exactly one owner.  Duplication factor is
   1 + (m-1)/L — <1% at the L=4096 default and m≤64 — versus the
   O(m)× blow-up a collect_list-over-window formulation would shuffle
   (every row repeated into m arrays).
3. ONE Arrow kernel call per PARTITION, not per group: rows hash to
   partitions by (key, segment) and sort within them, and a
   ``mapInPandas`` kernel walks the partition's batches computing
   every group's sliding windows with numpy — the engine's documented
   dense-linear-algebra exception to the stay-JVM rule
   (operators/knn.py:_bucketize discusses the measured trade).
   Windows that would span a (key, segment) boundary are masked out
   VECTORIZED — there is no Python loop over groups at all
   (``groupBy().applyInPandas`` pays one Python invocation per
   (key, segment): measured at 1,500 short series that was ~7× slower,
   and key cardinality only grows with the corpus).  ALL patterns
   score inside that one pass — the window matrix is built once and
   every pattern scores against it vectorized, so P probes cost one
   corpus pipeline, not P.
4. Bounded result exchange: each partition emits only its k best rows
   per pattern under the SAME total order (dist, key, start) the
   global winner uses — a partial top-k over a partition of the window
   set (the pq._topk_by_dist_nid discipline), so results are
   partition-layout independent even on distance ties and the final
   election reads O(partitions·k·P) rows.

Z-normalization treats a flat window (σ≈0) as the all-zero z-vector
(UCR convention), giving it the deterministic distance √m to any
z-normalized query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPS = 1e-12


def _znorm(v: np.ndarray) -> np.ndarray:
    sd = v.std()
    if sd < _EPS:
        return np.zeros_like(v)
    return (v - v.mean()) / sd


def subsequence_search_multi(
    series: DataFrame,
    patterns: list[list[float]],
    *,
    key_col: str = "user_id",
    order_col: str | list[str] = "ts",
    val_col: str = "value",
    k: int = 5,
    znorm: bool = True,
    segment: int = 4096,
    per_key: bool = False,
) -> DataFrame:
    """``[qid, key_col, start, dist]`` — for EACH pattern (``qid`` =
    its index in ``patterns``), the ``k`` nearest length-``m`` windows
    of the per-key series ordered by ``order_col``; ``start`` is the
    window's 1-based position in its key's series, ``dist`` the
    (z-normalized when ``znorm``) Euclidean distance.  ``per_key=True``
    returns the best ``k`` per (pattern, key) instead of per pattern.

    All patterns must share one length (one halo width, one window
    matrix); ``order_col`` (a column name or a LIST of names) must
    totally order each key's rows — pass the tie-break columns
    explicitly (e.g. ``["ts", "event_id"]``) when the primary order
    can repeat, or window positions (and distances) become
    partition-layout dependent on the ties, the repo-wide total-order
    rule.  Windows never span keys.  Keys shorter than the patterns
    yield no windows.
    """
    if not patterns:
        raise ValueError("need at least one pattern")
    m = len(patterns[0])
    if m < 2:
        raise ValueError("patterns must have at least 2 points")
    if any(len(p) != m for p in patterns):
        raise ValueError("all patterns must share one length")
    if segment < m:
        raise ValueError(f"segment ({segment}) must be >= pattern length ({m})")
    q = np.asarray(patterns, dtype=np.float64)  # (P, m)
    qz = np.stack([_znorm(p) for p in q]) if znorm else q
    key_type = series.schema[key_col].dataType.simpleString()

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pos = series.select(
        key_col,
        F.col(val_col).cast("double").alias("__v"),
        (F.row_number().over(w) - F.lit(1)).alias("__i"),  # 0-based
    )
    # halo: first m-1 rows of segment s>0 are ALSO sent to segment s-1
    seg = (F.col("__i") / segment).cast("long")
    segs = F.when(
        (seg > 0) & (F.col("__i") % segment < m - 1),
        F.array(seg, seg - 1),
    ).otherwise(F.array(seg))
    owned = pos.select(
        key_col, "__v", "__i", F.explode(segs).alias("__seg")
    )

    def kernel(batches):
        # ONE call per partition, ZERO Python loops over groups: the
        # partition's rows (already sorted by key/seg/pos) concatenate
        # into one value array, sliding windows are built over the
        # whole thing, and windows that would span a (key, segment)
        # boundary are masked out vectorized — per-group work never
        # drops out of numpy.  Partition memory is the partition's
        # share of the (halo-inflated) series rows plus one n×m window
        # copy, the same order the shuffle itself already pays.
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        keys = pdf[key_col].to_numpy()
        segs = pdf["__seg"].to_numpy(dtype=np.int64)
        idx = pdf["__i"].to_numpy(dtype=np.int64)
        vals = pdf["__v"].to_numpy(dtype=np.float64)
        if len(vals) < m:
            return
        b = (keys[1:] != keys[:-1]) | (segs[1:] != segs[:-1])
        gid = np.concatenate(([0], np.cumsum(b)))
        win = np.lib.stride_tricks.sliding_window_view(vals, m)
        nw = len(win)
        # a window is real iff it stays inside one (key, seg) run, and
        # this partition OWNS it iff its start is not a halo copy
        mask = (gid[:nw] == gid[m - 1 :]) & (idx[:nw] // segment == segs[:nw])
        if not mask.any():
            return
        w = win[mask]
        starts = idx[:nw][mask]
        wkeys = keys[:nw][mask]
        if znorm:
            mu = w.mean(axis=1, keepdims=True)
            sd = w.std(axis=1, keepdims=True)
            z = np.where(sd < _EPS, 0.0, (w - mu) / np.maximum(sd, _EPS))
        else:
            z = w
        q_out, k_out, s_out, d_out = [], [], [], []
        for qid in range(len(qz)):
            # direct (z − q)² per pattern, NOT the ‖z‖²−2z·q+‖q‖² Gram
            # form: same windows → bit-identical distances regardless
            # of how many patterns share the pass (the Gram matmul
            # rounds differently per operand shape), and no
            # cancellation error near dist≈0 — the region that decides
            # winners
            dq = np.sqrt(((z - qz[qid]) ** 2).sum(axis=1))
            if per_key:
                # k best per key: sort by (key, dist, start), rank
                # within each key run, keep rank < k
                order = np.lexsort((starts, dq, wkeys))
                ks = wkeys[order]
                run = np.concatenate(
                    ([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1)
                )
                rank = np.arange(len(ks)) - np.repeat(
                    run, np.diff(np.concatenate((run, [len(ks)])))
                )
                sel = order[rank < k]
            else:
                # the partition's k best under the GLOBAL total order
                # (dist, key, start) — a partial top-k over a PARTITION
                # of the window set, so the global winners survive and
                # the result exchange is O(partitions·k·P)
                sel = np.lexsort((starts, wkeys, dq))[:k]
            q_out.append(np.full(len(sel), qid, dtype=np.int64))
            k_out.append(wkeys[sel])
            s_out.append(starts[sel] + 1)  # 1-based
            d_out.append(dq[sel])
        yield pd.DataFrame(
            {
                "qid": np.concatenate(q_out),
                "key": np.concatenate(k_out),
                "start": np.concatenate(s_out),
                "dist": np.concatenate(d_out),
            }
        )

    cand = (
        owned.repartition(key_col, "__seg")
        .sortWithinPartitions(key_col, "__seg", "__i")
        .mapInPandas(kernel, f"qid long, key {key_type}, start long, dist double")
    )
    total_order = [
        F.col("dist").asc(), F.col("key").asc(), F.col("start").asc()
    ]
    if not per_key and len(qz) == 1:
        # single pattern, global winners: TakeOrderedAndProject, never
        # a one-partition window exchange
        winners = cand.orderBy(*total_order).limit(k)
    else:
        rank_w = Window.partitionBy(
            *(["qid", "key"] if per_key else ["qid"])
        ).orderBy(*total_order)
        winners = (
            cand.withColumn("__rn", F.row_number().over(rank_w))
            .where(F.col("__rn") <= k)
            .drop("__rn")
        )
    return winners.select("qid", F.col("key").alias(key_col), "start", "dist")


def subsequence_search(
    series: DataFrame,
    query: list[float],
    *,
    key_col: str = "user_id",
    order_col: str | list[str] = "ts",
    val_col: str = "value",
    k: int = 5,
    znorm: bool = True,
    segment: int = 4096,
    per_key: bool = False,
) -> DataFrame:
    """``[key_col, start, dist]`` — single-pattern form of
    :func:`subsequence_search_multi` (same semantics, ``qid`` column
    dropped)."""
    return subsequence_search_multi(
        series,
        [query],
        key_col=key_col,
        order_col=order_col,
        val_col=val_col,
        k=k,
        znorm=znorm,
        segment=segment,
        per_key=per_key,
    ).select(key_col, "start", "dist")


def grouped_trend(
    df: DataFrame,
    keys: list[str],
    *,
    x: str,
    y: str,
    extra: dict | None = None,
) -> DataFrame:
    """Per-group OLS trend of ``y`` against ``x`` in ONE partial-
    aggregable pass: ``keys…, slope, intercept, r2, n_fit`` via the
    SQL-standard ``regr_*`` aggregates (closed-form from co-moments —
    map-side combine, O(1) state per group, never a per-group sort or
    matrix).  Rows where either side is NULL are excluded (standard
    ``regr_count`` semantics).  A constant ``x`` within a group yields
    NULL slope/intercept (zero variance), matching every SQL engine.

    ``extra`` merges additional ``{name: aggregate Column}`` into the
    SAME groupBy so callers fitting trends alongside other per-group
    stats pay one scan and one shuffle, not two (q_stats_suite does
    exactly this under the driver gate).
    """
    aggs = [
        F.regr_slope(y, x).alias("slope"),
        F.regr_intercept(y, x).alias("intercept"),
        F.regr_r2(y, x).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n_fit"),
    ]
    for name, col in (extra or {}).items():
        aggs.append(col.alias(name))
    return df.groupBy(*keys).agg(*aggs)


def _cp_candidates(
    rows: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    *,
    min_seg: int,
) -> DataFrame:
    """Per-(partition, position) mean-shift statistic — the shared core
    of :func:`grouped_changepoint` and :func:`changepoints_binseg`.

    ``rows`` must carry ``__q`` (the integer-quantized value).  Appends
    ``__i`` (1-based local position), ``__n`` (partition length) and
    ``__sq`` — the CUSUM/AMOC mean-shift statistic at a split AFTER
    position i, in quantized units²::

        Q(i) = i·(n−i)/n · (mean(x₁..i) − mean(xᵢ₊₁..n))²

    (the reduction in within-segment SSE a split at i buys — the
    classic at-most-one-changepoint score).  Every input to Q is an
    EXACT integer (running sums of ``__q``), so the double arithmetic
    is bit-deterministic across engines and across partition layouts —
    the argmax over i needs no tolerance.  Splits leaving either side
    shorter than ``min_seg`` are excluded.

    One exchange: the ordered prefix-sum window, the unordered
    whole-partition aggregates, and every downstream rank in the
    callers all share the same ``part_cols`` hash partitioning."""
    wo = Window.partitionBy(*part_cols).orderBy(*order_cols)
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*part_cols)
    c = F.sum("__q").over(wcum)
    i = F.row_number().over(wo)
    t = F.sum("__q").over(wall)
    n = F.count(F.lit(1)).over(wall)
    with_sums = rows.select(
        "*", c.alias("__c"), i.alias("__i"), t.alias("__t"), n.alias("__n")
    )
    d = (
        F.col("__c").cast("double") / F.col("__i")
        - (F.col("__t") - F.col("__c")).cast("double")
        / (F.col("__n") - F.col("__i"))
    )
    w = (F.col("__i") * (F.col("__n") - F.col("__i"))).cast("double") / F.col(
        "__n"
    )
    return with_sums.where(
        (F.col("__i") >= min_seg) & (F.col("__n") - F.col("__i") >= min_seg)
    ).withColumn("__sq", w * d * d)


def grouped_changepoint(
    df: DataFrame,
    keys: list[str],
    *,
    order_cols: list[str],
    val_col: str,
    min_len: int = 8,
    min_seg: int = 1,
    quantize_dp: int = 6,
) -> DataFrame:
    """Per-group single changepoint (AMOC) in the mean of ``val_col``
    over the series ordered by ``order_cols``: the split position
    maximizing the CUSUM mean-shift statistic

    ``Q(i) = i·(n−i)/n · (mean_left − mean_right)²``

    — equivalently the one-changepoint least-squares fit, the score
    both AMOC and every binary-segmentation round rank by.  Returns one
    row per group with ``n ≥ min_len``: ``keys…, order_cols…`` (of the
    LAST row of the left segment — the boundary row), ``n`` (series
    length), ``cp_pos`` (1-based left-segment size), ``stat`` (Q in
    original units², the SSE reduction the split buys), ``mean_left``,
    ``mean_right``.  Ties in Q break on the earliest split.

    Determinism contract: values are quantized to ``quantize_dp``
    decimals and prefix-summed as EXACT integers, so every Q is the
    same IEEE double on any engine and any partition layout and the
    argmax needs no tolerance — the discipline that lets the ledger
    hash-match a DuckDB replay of this operator (q_stream_windows
    ``chgpt`` branch).  Means are computed from the quantized sums.

    Scale shape: ONE exchange on ``keys`` — the prefix-sum window, the
    length/total aggregates, and the final rank all reuse the same
    keyed partitioning; per-group state is O(1) per row, never a
    collected series.  Rows with NULL in any key/order/value column
    are dropped (they cannot be ordered or summed).

    The reference has no time-series surface (see module docstring);
    this is the engine's own tseries pillar — the offline twin of a
    monitoring system's level-shift detector."""
    if min_len < max(2, 2 * min_seg):
        raise ValueError(
            f"min_len ({min_len}) must be >= max(2, 2*min_seg)"
        )
    scale = float(10 ** quantize_dp)
    notnull = F.lit(True)
    for c in [*keys, *order_cols, val_col]:
        notnull = notnull & F.col(c).isNotNull()
    rows = df.where(notnull).select(
        *keys, *order_cols,
        F.round(F.col(val_col).cast("double") * F.lit(scale))
        .cast("long").alias("__q"),
    )
    cand = _cp_candidates(rows, keys, order_cols, min_seg=max(1, min_seg))
    best = Window.partitionBy(*keys).orderBy(
        F.col("__sq").desc(), F.col("__i").asc()
    )
    return (
        cand.where(F.col("__n") >= min_len)
        .withColumn("__rn", F.row_number().over(best))
        .where(F.col("__rn") == 1)
        .select(
            *keys, *order_cols,
            F.col("__n").cast("long").alias("n"),
            F.col("__i").cast("long").alias("cp_pos"),
            (F.col("__sq") / F.lit(scale * scale)).alias("stat"),
            (F.col("__c").cast("double") / F.col("__i") / F.lit(scale))
            .alias("mean_left"),
            (
                (F.col("__t") - F.col("__c")).cast("double")
                / (F.col("__n") - F.col("__i")) / F.lit(scale)
            ).alias("mean_right"),
        )
    )


def changepoints_binseg(
    df: DataFrame,
    keys: list[str],
    *,
    order_cols: list[str],
    val_col: str,
    max_changepoints: int = 3,
    min_seg: int = 4,
    min_gain: float = 0.0,
    quantize_dp: int = 6,
) -> DataFrame:
    """Multiple changepoints per group by budgeted PARALLEL binary
    segmentation: each round, every current segment proposes its best
    admissible split (both sides ≥ ``min_seg``, SSE reduction >
    ``min_gain`` in original units²); per group, proposals are ranked
    (stat desc, position asc) and accepted up to the remaining
    ``max_changepoints`` budget; accepted splits partition their
    segment and the next round recurses — classic binary segmentation
    with all segments advanced per round instead of one (same greedy
    scores; the acceptance order is pinned by the rank, so the result
    is layout-independent and mirrored exactly by the pure-python
    reference in tests/test_tseries.py).

    Returns accepted splits: ``keys…, order_cols…`` (boundary row),
    ``cp_pos`` (1-based GLOBAL position in the group's series — stable
    across rounds), ``stat`` (units²), ``iter`` (0-based round).  At
    most ``max_changepoints`` rows per group.

    Scale shape (the ``dedup_clusters`` iterative discipline): per
    round ONE keyed-window pass over the corpus computes all local
    prefix sums — partitioned on ``keys`` so every round reuses one
    exchange shape — plus a groups-sized broadcast join of the
    accepted splits to renumber segments; the per-row frame is
    ``localCheckpoint``-ed each round to truncate the otherwise
    linearly-growing lineage (measured to pay exactly in this re-run-
    per-iteration shape, CLAUDE.md).  Rounds ≤ ``max_changepoints``;
    driver state is one empty/non-empty flag per round, never rows."""
    if max_changepoints < 1:
        raise ValueError("max_changepoints must be >= 1")
    if min_seg < 1:
        raise ValueError("min_seg must be >= 1")
    scale = float(10 ** quantize_dp)
    min_gain_q = float(min_gain) * scale * scale
    notnull = F.lit(True)
    for c in [*keys, *order_cols, val_col]:
        notnull = notnull & F.col(c).isNotNull()
    wo = Window.partitionBy(*keys).orderBy(*order_cols)
    rows = df.where(notnull).select(
        *keys, *order_cols,
        F.round(F.col(val_col).cast("double") * F.lit(scale))
        .cast("long").alias("__q"),
    ).withColumn("__pos", F.row_number().over(wo)).withColumn(
        "__seg", F.lit(0).cast("long")
    ).localCheckpoint()

    accepted_rounds: list[DataFrame] = []
    spent = None  # per-key accepted count so far (tiny DataFrame)
    for it in range(max_changepoints):
        cand = _cp_candidates(
            rows, [*keys, "__seg"], ["__pos"], min_seg=min_seg
        )
        per_seg = Window.partitionBy(*keys, "__seg").orderBy(
            F.col("__sq").desc(), F.col("__pos").asc()
        )
        props = (
            cand.where(F.col("__sq") > F.lit(min_gain_q))
            .withColumn("__rn", F.row_number().over(per_seg))
            .where(F.col("__rn") == 1)
            .select(
                *keys, *order_cols, "__seg", "__pos", "__sq",
            )
        )
        per_key = Window.partitionBy(*keys).orderBy(
            F.col("__sq").desc(), F.col("__pos").asc()
        )
        ranked = props.withColumn("__kr", F.row_number().over(per_key))
        if spent is not None:
            ranked = ranked.join(
                spent.withColumnRenamed("__cnt", "__spent"),
                list(keys), "left",
            ).where(
                F.col("__kr")
                <= F.lit(max_changepoints) - F.coalesce("__spent", F.lit(0))
            ).drop("__spent")
        else:
            ranked = ranked.where(F.col("__kr") <= max_changepoints)
        # groups-sized — checkpoint so the acceptance set is computed
        # once, not re-derived by the emptiness probe, the segment
        # renumber join, AND the final union
        acc = ranked.drop("__kr").localCheckpoint()
        if acc.isEmpty():
            break
        accepted_rounds.append(
            acc.select(
                *keys, *order_cols,
                F.col("__pos").cast("long").alias("cp_pos"),
                (F.col("__sq") / F.lit(scale * scale)).alias("stat"),
                F.lit(it).cast("int").alias("iter"),
            )
        )
        if it == max_changepoints - 1:
            # the spent table and the segment renumber (an eager
            # corpus-sized localCheckpoint) only feed the NEXT round —
            # skip a whole wasted pass when this was the last one
            break
        counts = acc.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("__cnt")
        )
        spent = (
            counts if spent is None
            else spent.unionByName(counts).groupBy(*keys).agg(
                F.sum("__cnt").cast("long").alias("__cnt")
            )
        ).localCheckpoint()
        splits = acc.select(
            *keys, "__seg", F.col("__pos").alias("__cp")
        )
        rows = (
            rows.join(F.broadcast(splits), [*keys, "__seg"], "left")
            .withColumn(
                "__seg",
                # EVERY segment moves into the doubled id space each
                # round — an unsplit segment keeping its old id could
                # collide with a split sibling's child (old seg 1 vs
                # child 0·2+1), silently merging two segments and
                # re-proposing an already-accepted boundary (found by
                # the hypothesis differential)
                F.when(F.col("__cp").isNull(), F.col("__seg") * 2)
                .when(F.col("__pos") <= F.col("__cp"),
                      F.col("__seg") * 2)
                .otherwise(F.col("__seg") * 2 + 1),
            )
            .drop("__cp")
            .localCheckpoint()
        )
    if not accepted_rounds:
        return rows.drop("__q", "__pos", "__seg").where(F.lit(False)).select(
            "*",
            F.lit(None).cast("long").alias("cp_pos"),
            F.lit(None).cast("double").alias("stat"),
            F.lit(None).cast("int").alias("iter"),
        )
    out = accepted_rounds[0]
    for a in accepted_rounds[1:]:
        out = out.unionByName(a)
    return out
