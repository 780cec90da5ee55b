"""Event-funnel analysis: ordered step completion per user within a
time horizon — the classic product-analytics sequence operator
(A then B then C, each within ``horizon`` of the FIRST step).

Scale shape: one step-filtered scan of events PLUS one user-keyed
join+aggregate shuffle PER LATER STEP — honestly N−1 exchanges for an
N-step funnel, not one (each step's filter is a distinct subplan, so
nothing is exchange-reusable); steps are few (2-8) and every exchange
carries at most one row per user per step.  The property that matters
at scale is the STATE bound: each pass reduces map-side to at most
one timestamp per user — the earliest candidate valid given the
previous step's timestamp, which is optimal for a fixed anchor
(advancing a later step can only shrink the next step's feasible set)
— so no per-user event log is ever collected.  State is O(steps), not
O(events), the property that survives power users with 10⁶ events.

Returns one row per user that completed step 1, with per-step
timestamps (NULL once the funnel stalls) and ``steps_completed`` /
``converted``.  ``funnel_summary`` folds that into the step-by-step
conversion table dashboards want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon: str | None = None,
) -> DataFrame:
    """Per-user funnel completion over ``steps`` (ordered event types).

    ``horizon`` (an INTERVAL string like ``'7 days'``) bounds the whole
    funnel relative to the step-1 timestamp; ``None`` = unbounded.

    SEMANTICS: the funnel is ANCHORED at each user's FIRST step-1
    event (the fixed-anchor convention; given the anchor, picking the
    earliest feasible event per later step is optimal because it
    maximizes remaining slack).  A sliding-anchor funnel — retrying
    every step-1 occurrence, ClickHouse ``windowFunnel`` style — needs
    per-user O(events) state; implement it with the tseries
    partition-walk pattern if that semantic matters.

    Returns ``[user_col, ts_1..ts_N, steps_completed, converted]``."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    ).where(F.col("__t").isin(list(steps)) & F.col("__ts").isNotNull())

    # step 1: earliest occurrence per user
    cur = ev.where(F.col("__t") == steps[0]).groupBy("__u").agg(
        F.min("__ts").alias("ts_1")
    )
    deadline = (
        (F.col("ts_1") + F.expr(f"INTERVAL {horizon}")) if horizon else None
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("__t") == step).select(
            "__u", F.col("__ts").alias("__cand")
        )
        cond = F.col("__cand") > F.col(f"ts_{i - 1}")
        if deadline is not None:
            cond = cond & (F.col("__cand") <= deadline)
        # earliest feasible candidate; users with no feasible candidate
        # keep NULL and stay NULL for all later steps
        cur = (
            cur.join(nxt, "__u", "left")
            .groupBy("__u", *[f"ts_{j}" for j in range(1, i)])
            .agg(
                F.min(F.when(cond, F.col("__cand"))).alias(f"ts_{i}")
            )
        )
    done = [F.col(f"ts_{i}").isNotNull().cast("int") for i in
            range(1, len(steps) + 1)]
    out = cur.select(
        F.col("__u").alias(user_col),
        *[f"ts_{i}" for i in range(1, len(steps) + 1)],
        sum(done[1:], done[0]).cast("long").alias("steps_completed"),
        F.col(f"ts_{len(steps)}").isNotNull().alias("converted"),
    )
    return out


def funnel_summary(per_user: DataFrame, n_steps: int) -> DataFrame:
    """``[step, n_users, conversion_from_start, retention_from_prev]``
    from a :func:`funnel` result — the dashboard table (drop-off is
    1 − retention_from_prev).  One aggregation."""
    agg = per_user.agg(
        *[
            F.coalesce(
                F.sum(F.col(f"ts_{i}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"__n_{i}")
            for i in range(1, n_steps + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"),
                F.col(f"__n_{i}").alias("n_users"),
                F.col(f"__n_{max(i - 1, 1)}").alias("__prev"),
                F.col("__n_1").alias("__first"),
            )
            for i in range(1, n_steps + 1)
        ]
    )
    r = F.col("__r")
    return agg.select(F.explode(rows).alias("__r")).select(
        r["step"].alias("step"),
        r["n_users"].alias("n_users"),
        F.round(
            F.when(r["__first"] > 0, r["n_users"] / r["__first"])
            .otherwise(0.0), 6,
        ).alias("conversion_from_start"),
        F.round(
            F.when(r["__prev"] > 0, r["n_users"] / r["__prev"])
            .otherwise(0.0), 6,
        ).alias("retention_from_prev"),
    )
