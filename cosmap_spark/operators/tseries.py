"""Distributed time-series subsequence similarity search.

Find the top-k length-``m`` windows of a keyed, ordered value series
that are closest to a query pattern under (optionally z-normalized)
Euclidean distance — the UCR-suite/MASS semantics, re-expressed for a
partitioned engine.  The reference has no time-series surface at all
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
3. Arrow kernel per (key, segment): numpy sliding windows + one BLAS
   matmul against the constant query — the engine's documented
   dense-linear-algebra exception to the stay-JVM rule
   (operators/knn.py:_bucketize discusses the measured trade).
4. Bounded result exchange: each group emits only its k best rows
   under the SAME total order (dist, key, start) the global winner
   uses — the pq._topk_by_dist_nid discipline, so results are
   partition-layout independent even on distance ties — and the global
   top-k is a TakeOrderedAndProject over O(groups·k) rows.

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


def subsequence_search(
    series: DataFrame,
    query: list[float],
    *,
    key_col: str = "user_id",
    order_col: str = "ts",
    val_col: str = "value",
    k: int = 5,
    znorm: bool = True,
    segment: int = 4096,
    per_key: bool = False,
) -> DataFrame:
    """``[key_col, start, dist]`` — the ``k`` windows of length
    ``len(query)`` (series rows ordered by ``order_col`` within
    ``key_col``) nearest to ``query``; ``start`` is the window's
    1-based position in its key's series, ``dist`` the (z-normalized
    when ``znorm``) Euclidean distance.  ``per_key=True`` returns the
    best ``k`` PER key instead of globally.

    ``order_col`` must totally order each key's rows (ties broken by
    the column's own values would be nondeterministic); windows never
    span keys.  Keys shorter than the query yield no windows.
    """
    m = len(query)
    if m < 2:
        raise ValueError("query must have at least 2 points")
    if segment < m:
        raise ValueError(f"segment ({segment}) must be >= len(query) ({m})")
    q = np.asarray(query, dtype=np.float64)
    qz = _znorm(q) if znorm else q
    key_type = series.schema[key_col].dataType.simpleString()

    w = Window.partitionBy(key_col).orderBy(order_col)
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

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__i")
        vals = pdf["__v"].to_numpy(dtype=np.float64)
        idx = pdf["__i"].to_numpy(dtype=np.int64)
        this_seg = int(pdf["__seg"].iloc[0])
        if len(vals) < m:
            return pd.DataFrame({"key": [], "start": [], "dist": []}).astype(
                {"key": pdf[key_col].dtype, "start": np.int64, "dist": np.float64}
            )
        win = np.lib.stride_tricks.sliding_window_view(vals, m)
        if znorm:
            mu = win.mean(axis=1, keepdims=True)
            sd = win.std(axis=1, keepdims=True)
            z = np.where(sd < _EPS, 0.0, (win - mu) / np.maximum(sd, _EPS))
        else:
            z = win
        dist = np.sqrt(np.maximum(((z - qz) ** 2).sum(axis=1), 0.0))
        starts = idx[: len(win)]
        # emit only windows this segment OWNS (halo rows are context)
        mine = (starts // segment) == this_seg
        starts, dist = starts[mine], dist[mine]
        # bounded exchange: the group's k best under the GLOBAL total
        # order (dist, start) — key is constant within the group, so
        # this is the same order the final winner election uses
        order = np.lexsort((starts, dist))[:k]
        return pd.DataFrame(
            {
                "key": pdf[key_col].iloc[0],
                "start": starts[order] + 1,  # 1-based for the caller
                "dist": dist[order],
            }
        )

    cand = owned.groupBy(key_col, "__seg").applyInPandas(
        kernel, f"key {key_type}, start long, dist double"
    )
    if per_key:
        rank_w = Window.partitionBy("key").orderBy(
            F.col("dist").asc(), F.col("start").asc()
        )
        return (
            cand.withColumn("__rn", F.row_number().over(rank_w))
            .where(F.col("__rn") <= k)
            .select(F.col("key").alias(key_col), "start", "dist")
        )
    return (
        cand.orderBy(F.col("dist").asc(), F.col("key").asc(), F.col("start").asc())
        .limit(k)
        .select(F.col("key").alias(key_col), "start", "dist")
    )
