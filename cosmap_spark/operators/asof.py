"""Generic distributed as-of join (the ``pandas.merge_asof`` analog).

For every left row, attach the single closest right row by the ``on``
ordering — most recent earlier (``backward``) or nearest later
(``forward``) — optionally scoped to equal ``by`` keys, with or
without exact-timestamp matches.  The reference shape for market data,
sensor alignment, and attribution (purchase ← last click).

Scale-first plan (the one q_join_asof has always used, now factored
for reuse): instead of a range theta-join + per-key top-1 — quadratic
in rows-per-key and a BroadcastNestedLoopJoin hazard — both sides are
tagged and UNIONED, sorted once per key, and the right side's payload
is forward/backward-filled with ``last``/``first(ignorenulls)`` over a
running window: ONE shuffle on the ``by`` key, linear work, no join
node at all.  All right-side payload columns ride in a single struct,
so the fill is one window expression regardless of how many columns
are attached.

Equal-key ordering encodes the exactness semantics: the right row
sorts before the left row at equal ``on`` iff exact matches should be
visible (``allow_exact``), mirrored for ``forward``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = False,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    allow_unkeyed: bool = False,
) -> DataFrame:
    """Left rows + ``prefix``-renamed columns of the matched right row
    (null when no right row qualifies).

    ``direction='backward'``: match the LAST right row with
    ``right.on < left.on`` (``<=`` when ``allow_exact``);
    ``'forward'``: the FIRST right row with ``right.on > left.on``
    (``>=`` when ``allow_exact``).  Ties among equal right ``on``
    values break on the first payload column for determinism.

    ``by=None`` sorts and fills BOTH TABLES IN ONE PARTITION (an
    unkeyed window has nowhere to parallelize — the exact
    single-partition shape the repo's plan audit forbids in ledger
    queries), so it must be opted into with ``allow_unkeyed=True`` —
    legitimate only when both sides are known-small (e.g. aligning two
    reference series); at corpus scale always pass ``by``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward; got {direction!r}")
    if not by and not allow_unkeyed:
        raise ValueError(
            "asof_join with by=None serializes both tables through ONE "
            "window partition; pass by=[...] (the scale path) or opt in "
            "with allow_unkeyed=True for known-small inputs"
        )
    reserved = {"__tag", "__payload", "__is_left", "__m"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(reserved)}; "
            f"rename input columns {sorted(clash)}"
        )
    keys = by or []
    payload_cols = right_cols or [
        c for c in right.columns if c != on and c not in keys
    ]
    if not payload_cols:
        raise ValueError("right side has no payload columns to attach")

    payload = F.struct(*[F.col(c) for c in payload_cols])
    # tag ordering ⇔ visibility at equal `on` (see module docstring);
    # for backward fills the LAST preceding row wins, for forward the
    # FIRST following row wins.
    if direction == "backward":
        right_tag, left_tag = (0, 1) if allow_exact else (1, 0)
    else:
        right_tag, left_tag = (1, 0) if allow_exact else (0, 1)

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__payload"),
        F.lit(True).alias("__is_left"),
    )
    rhs = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c != on and c not in keys],
        *[F.col(c) for c in (*keys, on)],
        F.lit(right_tag).alias("__tag"),
        payload.alias("__payload"),
        F.lit(False).alias("__is_left"),
    ).select(*[F.col(c) for c in left.columns],
             "__tag", "__payload", "__is_left")

    combined = lhs.unionByName(rhs)
    tie = F.col("__payload")[payload_cols[0]]
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__tag").asc(), tie.asc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__tag").asc(), tie.asc_nulls_first())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("__payload", ignorenulls=True).over(w)

    out = combined.withColumn("__m", matched).where(F.col("__is_left"))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m")[c].alias(f"{prefix}{c}") for c in payload_cols],
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str],
    direction: str = "backward",
    allow_exact: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """The COGROUP twin of :func:`asof_join`: both sides are cogrouped
    on ``by`` and each key's pair of pandas frames is merged with
    ``pandas.merge_asof`` inside ``applyInPandas``.

    This is the remaining member of the Arrow-UDF family (scalar /
    grouped-agg / grouped-map / table-function / map / stateful /
    COGROUP) and the reference pattern for per-key logic that needs
    BOTH sides as local frames.  It is NOT the scale path — a hot key's
    two sides must fit one executor's pandas frame, where the
    union+window ``asof_join`` streams — so its role here is
    cross-validation: equality with ``asof_join`` over every
    direction/exactness combination is asserted in tests/test_asof.py,
    pinning the distributed implementation to pandas semantics."""
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward; got {direction!r}")
    payload_cols = [c for c in right.columns if c != on and c not in by]
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    schema = ", ".join(
        [f"{c} {ltypes[c]}" for c in left.columns]
        + [f"{prefix}{c} {rtypes[c]}" for c in payload_cols]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf):
            return pd.DataFrame(columns=list(lpdf.columns)
                                + [f"{prefix}{c}" for c in payload_cols])
        out = pd.merge_asof(
            lpdf.sort_values(on),
            rpdf.sort_values(on)[[on, *payload_cols]],
            on=on,
            direction=direction,
            allow_exact_matches=allow_exact,
            suffixes=("", "__r"),
        )
        # a payload column sharing its name with a LEFT column comes
        # back suffixed "__r" (the un-suffixed copy is the left's) — a
        # blanket rename would grab the left column instead, so pick
        # the right-side source per column explicitly
        res = out[list(lpdf.columns)].copy()
        for c in payload_cols:
            src = f"{c}__r" if f"{c}__r" in out.columns else c
            res[f"{prefix}{c}"] = out[src]
        return res

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, schema)
    )
