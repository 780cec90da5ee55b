"""Interval coalescing: merge overlapping/adjacent intervals per key.

The compaction primitive behind sessionization, downtime reports, byte-
range dedup, and time-range indexes.  Intervals sort within their key
partition, a running maximum of ``end`` detects gaps, and the gap
flags' prefix sum numbers the merged groups — the classic
gaps-and-islands plan.  Both window passes share ONE (key, start)
Sort + Exchange; the final groupBy of merged runs adds a second, much
smaller exchange (merged-group cardinality, not input rows).  No
self-join, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(
    df: DataFrame,
    *,
    key_cols: list[str],
    start_col: str = "start",
    end_col: str = "end",
    min_gap: int = 0,
) -> DataFrame:
    """One row per maximal run of overlapping intervals:
    ``key_cols…, start, end, n_merged``.

    Intervals are half-open ``[start, end)``; two intervals merge when
    the next ``start`` is within ``min_gap`` of the running maximum
    ``end`` (``min_gap=0`` merges touching intervals; a positive gap
    bridges small holes, the session-gap analog).  Work per key is the
    sort; state per row is one running max — no buffering of whole
    groups, so a key with 10⁹ intervals streams through the window
    operator.
    """
    w_sort = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w_sort.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_run = F.when(
        prev_max_end.isNull()
        | (F.col(start_col) > prev_max_end + F.lit(min_gap)),
        1,
    ).otherwise(0)
    runs = df.withColumn(
        "__run",
        F.sum(new_run).over(
            w_sort.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy(*key_cols, "__run")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count("*").alias("n_merged"),
        )
        .drop("__run")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame | None = None,
    *,
    start_col: str = "start",
    end_col: str = "end",
    id_col: str = "id",
    by: list[str] | None = None,
    grid: int = 86_400,
) -> DataFrame:
    """All overlapping interval pairs — the generic grid-bucketed
    overlap join (the time-domain twin of the cone search's zone
    trick, factored out of q_join_overlap for reuse).

    Each interval explodes to every ``grid``-second cell it spans
    (``sequence``), candidates come from an EQUI-join on
    (by..., cell) — executable by a hash join, never |A|×|B| — the
    exact closed-interval overlap predicate runs as residual, and
    cross-cell duplicates fold on the id pair.  Work scales with
    cells-per-interval × intervals-per-cell; pick ``grid`` near the
    typical interval length so both factors stay small.

    ``right=None`` ⇒ self-join, emitting each unordered pair once
    (``id_a < id_b``).  Output: ``by… , id_a, id_b, start_a, end_a,
    start_b, end_b, overlap`` (overlap in the interval's units,
    ≥ 0 for closed-interval touching).

    Cross-cell duplicate folding keys on (ids, endpoints, by-keys), so
    rows that share an id but carry DIFFERENT intervals each keep their
    overlap pairs; two rows with identical (id, start, end) still
    collapse to one — give rows distinct ids if that matters.  In the
    two-table form the id spaces are assumed disjoint: a shared id
    produces an ``id_a == id_b`` pair the caller must filter if the two
    sides are really one population."""
    keys = by or []
    self_join = right is None
    rhs_src = left if self_join else right

    def cell(df: DataFrame, name: str):
        # integral endpoints use EXACT integer floor division: the
        # double division `floor(col / grid)` rounds endpoints past 2⁵³
        # (nanosecond epochs ≈ 1.7e18 lose ~2⁷ ns), so a boundary
        # interval can land in the wrong cell and a genuinely
        # overlapping pair whose only shared cell is that boundary is
        # silently missing.  pmod is non-negative, so subtracting it
        # gives the floor multiple and `div` stays in long arithmetic.
        if dict(df.dtypes)[name] in ("tinyint", "smallint", "int", "bigint"):
            c = f"`{name}`"
            return F.expr(f"({c} - pmod({c}, {grid})) div {grid}").cast("long")
        return F.floor(F.col(name) / grid).cast("long")

    def spanned(df: DataFrame, p: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"__{p}_{k}") for k in keys],
            F.col(id_col).alias(f"id_{p}"),
            F.col(start_col).alias(f"start_{p}"),
            F.col(end_col).alias(f"end_{p}"),
            F.explode(
                F.sequence(cell(df, start_col), cell(df, end_col))
            ).alias(f"__cell_{p}"),
        )

    a, b = spanned(left, "a"), spanned(rhs_src, "b")
    cond = F.col("__cell_a") == F.col("__cell_b")
    for k in keys:
        cond = cond & (F.col(f"__a_{k}") == F.col(f"__b_{k}"))
    cond = cond & (F.col("start_a") <= F.col("end_b")) & (F.col("start_b") <= F.col("end_a"))
    if self_join:
        cond = cond & (F.col("id_a") < F.col("id_b"))
    pairs = (
        a.join(b, cond)
        .dropDuplicates([
            "id_a", "id_b", "start_a", "end_a", "start_b", "end_b",
            *[f"__a_{k}" for k in keys],
        ])
    )
    return pairs.select(
        *[F.col(f"__a_{k}").alias(k) for k in keys],
        "id_a", "id_b", "start_a", "end_a", "start_b", "end_b",
        (F.least("end_a", "end_b") - F.greatest("start_a", "start_b")).alias("overlap"),
    )
