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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _step_conds(steps: list, type_col: str) -> list:
    """The ONE definition of the step contract shared by funnel and
    funnel_sliding: an event-type string becomes a type-equality
    predicate, a boolean Column passes through."""
    return [
        (F.col(type_col) == s) if isinstance(s, str) else s for s in steps
    ]


def funnel(
    events: DataFrame,
    steps: list,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon: str | None = None,
) -> DataFrame:
    """Per-user funnel completion over ``steps`` — ordered event types
    (strings) or arbitrary boolean ``Column`` predicates, freely mixed
    (same step contract as :func:`funnel_sliding`).

    ``horizon`` (an INTERVAL string like ``'7 days'``) bounds the whole
    funnel relative to the step-1 timestamp; ``None`` = unbounded.

    SEMANTICS: the funnel is ANCHORED at each user's FIRST step-1
    event (the fixed-anchor convention; given the anchor, picking the
    earliest feasible event per later step is optimal because it
    maximizes remaining slack).  For the sliding-anchor semantics —
    retrying every step-1 occurrence, ClickHouse ``windowFunnel``
    style — use :func:`funnel_sliding`, which keeps the same O(steps)
    per-user state bound via a latest-anchor-per-level pass.

    Returns ``[user_col, ts_1..ts_N, steps_completed, converted]``."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    conds = _step_conds(steps, type_col)
    base = events.where(F.col(ts_col).isNotNull())
    frames = [
        base.where(c).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        for c in conds
    ]

    # step 1: earliest occurrence per user
    cur = frames[0].groupBy("__u").agg(F.min("__ts").alias("ts_1"))
    deadline = (
        (F.col("ts_1") + F.expr(f"INTERVAL {horizon}")) if horizon else None
    )
    for i, nxt_frame in enumerate(frames[1:], start=2):
        nxt = nxt_frame.select("__u", F.col("__ts").alias("__cand"))
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


def funnel_sliding(
    events: DataFrame,
    steps: list,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon: str | None = None,
) -> DataFrame:
    """Sliding-anchor funnel (ClickHouse ``windowFunnel`` semantics):
    per user, the MAXIMUM number of consecutive steps completed by ANY
    chain — every step-1 occurrence is a candidate anchor, the whole
    chain must fit within ``horizon`` of its OWN anchor, and chain
    timestamps must strictly increase (same-timestamp events never
    chain, matching :func:`funnel`'s strict ``>``).

    ``steps`` elements are event-type strings OR arbitrary boolean
    ``Column`` predicates (windowFunnel's cond1..condN — e.g.
    ``(F.col("event_type") == "purchase") & (F.col("value") > 100)``),
    freely mixed.  One event may satisfy SEVERAL steps (including the
    same type listed twice, e.g. view→click→view): it is exploded to
    one row per matched level, and the strict-time rule already
    prevents an event from chaining with itself.

    Where :func:`funnel` fixes the anchor at the user's FIRST step-1
    event, this variant retries later anchors — the semantics that
    catches a user who stalled on an early attempt and converted on a
    later one.

    Algorithm — the O(steps)-state pass the fixed-anchor docstring
    promised: events are repartitioned by user and sorted by (user,
    ts); ONE kernel pass maintains, per level s, the LATEST anchor of
    any chain reaching s (latest-anchor greed is exact: a later anchor
    dominates — strictly more horizon slack — and is extendable by any
    event that extends an earlier one).  A step-s event at time t
    extends level s−1 iff the level-(s−1) cummax anchor over events at
    strictly smaller ts satisfies ``t − anchor ≤ horizon``.  The level
    loop is OUTSIDE the data (S vectorized passes over the partition,
    pandas group-cummax + one strict-predecessor gather), so per-user
    state is S anchors and no per-user event log ever materializes —
    the partition-walk discipline of ``tseries``.  Differential vs an
    exhaustive per-anchor pandas reference in tests/test_funnel.py.

    Returns ``[user_col, anchor_ts, steps_completed, converted]`` —
    one row per user with ≥ 1 step-1 event; ``anchor_ts`` is the
    latest anchor among chains reaching the user's maximum level.

    Scale shape: one shuffle (user repartition + in-partition sort),
    kernel memory = the partition's columnar rows + S level arrays;
    output is one row per user."""
    import numpy as np
    import pandas as pd

    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    n_steps = len(steps)
    horizon_us = (
        int(pd.Timedelta(horizon) // pd.Timedelta("1us")) if horizon else None
    )
    utype = events.schema[user_col].dataType.simpleString()
    ttype = events.schema[ts_col].dataType.simpleString()
    if not ttype.startswith("timestamp"):
        # the kernel round-trips anchors through datetime64[us]; an
        # integral ts column would declare a bigint anchor the Arrow
        # cast then rejects at task time — fail at build time instead
        raise ValueError(
            f"{ts_col!r} must be a timestamp column, got {ttype}"
        )
    schema = (
        f"{user_col} {utype}, anchor_ts {ttype}, "
        "steps_completed long, converted boolean"
    )
    # matched-level explode: one row per (event, satisfied step) —
    # string steps become type-equality predicates; an event matching
    # no step produces no rows (the old isin filter, generalized)
    conds = _step_conds(steps, type_col)
    matched = F.filter(
        F.array(*[
            F.when(c, F.lit(i + 1)).cast("int") for i, c in enumerate(conds)
        ]),
        lambda x: x.isNotNull(),
    )
    ev = (
        events.where(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("__ts"),
            F.explode(matched).alias("__lvl"),
        )
        .repartition("__u")
        .sortWithinPartitions("__u", "__ts")
    )
    NEG = np.int64(np.iinfo(np.int64).min)

    def kernel(batches):
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        u = pdf["__u"].to_numpy()
        ts = pdf["__ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        lvl = pdf["__lvl"].to_numpy(dtype=np.int64)
        n = len(ts)
        idx = np.arange(n, dtype=np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        new_run = new_user.copy()
        new_run[1:] |= ts[1:] != ts[:-1]
        user_first = np.maximum.accumulate(np.where(new_user, idx, 0))
        run_first = np.maximum.accumulate(np.where(new_run, idx, 0))
        # strict predecessor: last event of the SAME user at strictly
        # smaller ts (−1 = none) — equal-ts events never chain
        prev = run_first - 1
        prev[run_first <= user_first] = -1
        ug = pd.Series(np.cumsum(new_user))  # group label for cummax
        best = np.where(lvl == 1, ts, NEG)
        anchors = [None, pd.Series(best).groupby(ug).cummax().to_numpy()]
        for s in range(2, n_steps + 1):
            pa = np.where(prev >= 0, anchors[s - 1][np.maximum(prev, 0)], NEG)
            ok = (lvl == s) & (pa != NEG)
            if horizon_us is not None:
                # the subtraction is masked to rows already feasible:
                # ts - NEG on masked-out rows would wrap int64 (silent
                # today, an error under np.errstate('raise'))
                ok &= np.where(ok, ts - pa, 0) <= horizon_us
            a_s = np.where(ok, pa, NEG)
            anchors.append(pd.Series(a_s).groupby(ug).cummax().to_numpy())
        last = np.zeros(n, dtype=bool)
        last[:-1] = new_user[1:]
        last[-1] = True
        per_user = [a[last] for a in anchors[1:]]  # (S, n_users)
        reached = np.stack([a != NEG for a in per_user])  # (S, U)
        completed = reached.sum(axis=0)  # consecutive by construction
        keep = completed >= 1
        if not keep.any():
            return
        comp = completed[keep]
        best_anchor = np.stack(per_user)[comp - 1, np.flatnonzero(keep)]
        yield pd.DataFrame(
            {
                user_col: u[last][keep],
                "anchor_ts": best_anchor.view("datetime64[us]"),
                "steps_completed": comp.astype(np.int64),
                "converted": comp == n_steps,
            }
        )

    return ev.mapInPandas(kernel, schema)


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention matrix — the other classic product-analytics
    sequence operator next to :func:`funnel`: users are cohorted by the
    period of their FIRST event, and ``retention[cohort][n]`` is the
    fraction of that cohort active ``n`` periods later.

    ``period`` ∈ {``day``, ``week``, ``month``} — the units whose
    whole-period distance the implementation computes correctly
    (day-delta division for day/week, ``months_between`` for month);
    anything else raises rather than silently mis-binning.  Period
    index n = whole periods between the truncated cohort start and the
    truncated activity time, so n=0 is the cohort period itself
    (retention 1.0 by construction — every cohort member is active in
    it; NULL users are excluded up front so the inner join back cannot
    silently drop cohort mass).  ``max_periods`` bounds the matrix
    width.

    Scale shape: ONE user-keyed exchange total — events aggregate
    straight to (first period, distinct-period set) per user
    (``collect_set`` state is bounded by the user's distinct ACTIVE
    periods, not events), the set explodes to (cohort, period_n) rows
    that are distinct per user by construction (no separate
    ``distinct`` pass, no join back over the events), and cohort sizes
    reduce off the same per-user frame (AQE reuses its exchange).
    O(cohorts · periods) output, never a per-user matrix.  Returns
    ``[cohort, period_n, n_active, retention]`` with ``retention``
    rounded to 6 dp (fraction of the cohort's size)."""
    if max_periods < 1:
        raise ValueError("max_periods must be >= 1")
    if period not in ("day", "week", "month"):
        raise ValueError(
            f"period must be day/week/month, got {period!r} (other "
            "date_trunc units would need their own whole-period "
            "arithmetic)"
        )
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(period, F.col(ts_col)).alias("__p"),
    ).where(F.col("__p").isNotNull() & F.col("__u").isNotNull())
    per_user = ev.groupBy("__u").agg(
        F.min("__p").alias("cohort"),
        F.collect_set("__p").alias("__ps"),
    )
    sizes = per_user.groupBy("cohort").agg(
        F.count("*").alias("__cohort_size")
    )
    # whole-period distance via month/day arithmetic on TRUNCATED
    # stamps: months_between is exact for month cohorts; day/week use
    # day deltas (truncated stamps are aligned, so division is exact)
    exploded = per_user.select(
        "cohort", F.explode("__ps").alias("__p")
    )
    if period == "month":
        n = F.round(F.months_between("__p", "cohort")).cast("long")
    else:
        days = F.datediff(F.col("__p"), F.col("cohort"))
        n = (days / (7 if period == "week" else 1)).cast("long")
    active = (
        # one row per (user, active period) by set construction, so a
        # plain count per (cohort, n) IS the distinct-user count
        exploded.select("cohort", n.alias("period_n"))
        .where(n < max_periods)
        .groupBy("cohort", "period_n")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        active.join(sizes, "cohort")
        .select(
            "cohort",
            "period_n",
            "n_active",
            F.round(
                F.col("n_active") / F.col("__cohort_size"), 6
            ).alias("retention"),
        )
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Per-user next-event transition matrix — the flow-analysis
    readout next to funnels and cohorts (what a sankey/path-analysis
    dashboard draws): for every ordered pair of consecutive events of
    one user, count (from_type → to_type) and the row-normalized
    transition probability P(next = to | current = from).

    ``tie_cols`` break same-timestamp ordering deterministically
    (default ``["event_id"]`` when present — REQUIRED for a stable
    cross-engine answer; without a total order, equal-ts neighbors
    would pair up partition-dependently).

    Scale shape: one user-keyed window (lead over (ts, ties)) + one
    (from, to) groupBy + one from-keyed window for the normalizer —
    output O(|types|²), never per-user.  Returns ``[from_type,
    to_type, n, p]`` with ``p`` rounded to 6 dp."""
    if tie_cols is None:
        tie_cols = ["event_id"] if "event_id" in events.columns else []
    ev = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, *tie_cols)
    pairs = (
        ev.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("p"),
    )


def event_paths(
    events: DataFrame,
    *,
    k: int = 3,
    top_n: int | None = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Top ``k``-step event paths — the path-analysis complement of
    :func:`event_transitions` (which sees only pairs): every run of
    ``k`` consecutive events of one user becomes a path string
    ``"A>B>C"``, counted corpus-wide.

    Implemented as ``k−1`` chained ``lead`` columns over ONE user-keyed
    window (one sort serves all of them) — never a per-user event-log
    collect; ``top_n`` cuts via orderBy+limit (TakeOrderedAndProject,
    no global sort), ties broken on the path string.  Returns
    ``[path, n]``."""
    if k < 2:
        raise ValueError("a path needs at least 2 steps")
    if tie_cols is None:
        tie_cols = ["event_id"] if "event_id" in events.columns else []
    ev = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, *tie_cols)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, k)
    ]
    paths = (
        ev.select(F.concat_ws(">", *steps).alias("path"), steps[-1].alias("__last"))
        # a run shorter than k has a NULL tail: concat_ws silently
        # skips NULLs, so gate on the LAST lead instead
        .where(F.col("__last").isNotNull())
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
    if top_n is not None:
        paths = paths.orderBy(F.col("n").desc(), "path").limit(top_n)
    return paths


def funnel_latency(
    per_user: DataFrame,
    n_steps: int,
    *,
    quantiles: tuple = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert distributions from a :func:`funnel` result — the
    third classic behavioral readout next to conversion and retention:
    for each transition into step s (2..N), over the users who reached
    s, the latency in seconds from the PREVIOUS step and from the
    step-1 ANCHOR: count, mean, and the requested quantiles.

    Implementation is one explode + one groupBy over the per-user
    frame (rows = users, already aggregated — never the event log);
    quantiles use ``percentile_approx`` (a mergeable sketch: partials
    combine map-side, exact while per-group n is below the default
    accuracy, the right trade at 10⁹ users).  All JVM-side.

    Returns ``[step, n_users, mean_from_prev, mean_from_start,
    p<NN>_from_prev..., p<NN>_from_start...]`` (``p50``/``p90``-style
    tags) with seconds rounded to 3 dp, one row per step with at least
    one completing user."""
    if n_steps < 2:
        raise ValueError("a funnel needs at least 2 steps")
    # timestampdiff, not unix_micros: it accepts BOTH TimestampType and
    # TimestampNTZType (parquet events normalize to NTZ via load_table;
    # unix_micros rejects NTZ outright)
    rows = F.array(
        *[
            F.struct(
                F.lit(s).alias("step"),
                F.expr(
                    f"timestampdiff(MICROSECOND, ts_{s - 1}, ts_{s})"
                ).alias("__d_prev"),
                F.expr(
                    f"timestampdiff(MICROSECOND, ts_1, ts_{s})"
                ).alias("__d_start"),
            )
            for s in range(2, n_steps + 1)
        ]
    )
    r = F.col("__r")
    exploded = (
        per_user.select(F.explode(rows).alias("__r"))
        .select(
            r["step"].alias("step"),
            (r["__d_prev"] / 1e6).alias("__p"),
            (r["__d_start"] / 1e6).alias("__s"),
        )
        .where(F.col("__p").isNotNull())  # user stalled before this step
    )
    aggs = [
        F.count("*").alias("n_users"),
        F.round(F.avg("__p"), 3).alias("mean_from_prev"),
        F.round(F.avg("__s"), 3).alias("mean_from_start"),
    ]
    for q in quantiles:
        # percentile tag: 0.5 -> p50, 0.9 -> p90 (str-mangling 0.5 to
        # "p5" would read as the 5th percentile)
        tag = f"p{int(round(q * 100)):02d}"
        aggs.append(
            F.round(F.percentile_approx("__p", float(q)), 3).alias(
                f"{tag}_from_prev"
            )
        )
        aggs.append(
            F.round(F.percentile_approx("__s", float(q)), 3).alias(
                f"{tag}_from_start"
            )
        )
    return exploded.groupBy("step").agg(*aggs)


def funnel_summary_levels(
    per_user: DataFrame, n_steps: int, *, by: list[str] | None = None
) -> DataFrame:
    """The :func:`funnel_summary` dashboard table from a LEVEL-shaped
    result (:func:`funnel_sliding` / ``streaming.funnel_stream``
    output: one ``steps_completed`` per user instead of per-step
    timestamps): a user counts toward every step ≤ their level.  Same
    output columns, one aggregation.  ``by`` segments as in
    :func:`funnel_summary`."""
    counts = [
        F.coalesce(
            F.sum((F.col("steps_completed") >= i).cast("long")), F.lit(0)
        ).alias(f"__n_{i}")
        for i in range(1, n_steps + 1)
    ]
    agg = per_user.groupBy(*by).agg(*counts) if by else per_user.agg(*counts)
    return _summary_from_counts(agg, n_steps, by=by)


def funnel_summary(
    per_user: DataFrame, n_steps: int, *, by: list[str] | None = None
) -> DataFrame:
    """``[step, n_users, conversion_from_start, retention_from_prev]``
    from a :func:`funnel` result — the dashboard table (drop-off is
    1 − retention_from_prev).  One aggregation.

    ``by`` segments the table: a list of columns already present on
    ``per_user`` (join user attributes on beforehand — e.g. signup
    channel, country) produces one conversion table PER SEGMENT with
    the segment columns leading.  Still one groupBy — O(segments ·
    steps) output, never per-user."""
    counts = [
        F.coalesce(
            F.sum(F.col(f"ts_{i}").isNotNull().cast("long")), F.lit(0)
        ).alias(f"__n_{i}")
        for i in range(1, n_steps + 1)
    ]
    agg = per_user.groupBy(*by).agg(*counts) if by else per_user.agg(*counts)
    return _summary_from_counts(agg, n_steps, by=by)


def _summary_from_counts(
    agg: DataFrame, n_steps: int, *, by: list[str] | None = None
) -> DataFrame:
    """Shared tail of the two summaries: a (1- or per-segment-row)
    ``__n_i`` count frame → the per-step conversion/retention table."""
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
    return agg.select(*(by or []), F.explode(rows).alias("__r")).select(
        *(by or []),
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


#: credit models attribution() understands
ATTRIBUTION_MODELS = ("first", "last", "linear", "position", "time_decay")


def attribution(
    events: DataFrame,
    *,
    conversion: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_cols: list[str] | None = None,
    models: tuple[str, ...] = ("first", "last"),
    halflife: str = "1 day",
) -> DataFrame:
    """Conversion attribution — the revenue-assignment member of the
    behavioral family.  Each ``conversion`` event's credit is split
    over the user's PRECEDING non-conversion touches (strictly earlier
    in ``(ts, tie_cols)`` row order; a touch after a user's last
    conversion earns nothing) under the requested credit ``models``:

    * ``first`` / ``last`` — the classic single-touch models: the
      whole credit to the first / most recent preceding touch,
      ``'direct'`` when none precedes;
    * ``linear`` — 1/m to each of the conversion's m touches;
    * ``position`` — U-shaped: 40% first, 40% last, the middle
      touches share 20% (m=1 → 100%, m=2 → 50/50);
    * ``time_decay`` — credit ∝ ``0.5^(Δt/halflife)`` (Δt = time to
      conversion), normalized per conversion; computed with the
      exponent anchored at the newest touch (mathematically
      identical — the anchor cancels — but immune to the all-decays-
      underflow 0/0 a conversion-anchored form hits when every touch
      is ≫ halflife old).

    Path-model lookback windows are NON-OVERLAPPING: each conversion's
    touch set is the touches since the user's previous conversion (the
    standard per-conversion reset), whereas ``first`` looks back over
    the user's entire history — the two conventions coincide for
    single-conversion users.  Path models credit ``'direct'``
    (weight 1) for a conversion with no preceding touch, mirroring
    the single-touch convention.

    Returns ``[model, touch, n, credit, share]`` — ``n`` = credited
    (conversion, touch-event) rows, ``credit`` = summed weight
    (rounded 4 dp; for single-touch models credit = n), ``share`` =
    credit / model total (rounded 6 dp).

    Scale shape: ONE user-keyed window pass serves every model.  The
    single-touch pair rides running first/last with ``ignorenulls``
    (per-row state two values); the path models stamp each row with
    its conversions-remaining count — constant per-row state, the
    running-sum trick, never a buffered event log — making (user,
    conversion) the credit group key for three more KEYED windows
    (group size = path length).  One O(models·types) aggregation
    finishes.  No extra exchange beyond the user repartition every
    per-user sequence operator pays: the (user, cid) windows are
    sub-partitions of the user sort."""
    bad = [m for m in models if m not in ATTRIBUTION_MODELS]
    if bad or not models:
        raise ValueError(
            f"attribution: models must be a non-empty subset of "
            f"{ATTRIBUTION_MODELS}, got {models}"
        )
    if tie_cols is None:
        tie_cols = ["event_id"] if "event_id" in events.columns else []
    ev = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    parts = []
    single = [m for m in models if m in ("first", "last")]
    path = [m for m in models if m not in ("first", "last")]
    if single:
        w = (
            Window.partitionBy(user_col)
            .orderBy(ts_col, *tie_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        touch = F.when(F.col(type_col) != conversion, F.col(type_col))
        credited = ev.select(
            F.col(type_col).alias("__ty"),
            F.coalesce(
                F.first(touch, ignorenulls=True).over(w), F.lit("direct")
            ).alias("first"),
            F.coalesce(
                F.last(touch, ignorenulls=True).over(w), F.lit("direct")
            ).alias("last"),
        ).where(F.col("__ty") == conversion)
        parts.append(
            credited.select(
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(m).alias("model"),
                            F.col(m).alias("touch"),
                        )
                        for m in single
                    ])
                ).alias("__c")
            ).select("__c.model", "__c.touch", F.lit(1.0).alias("__w"))
        )
    if path:
        is_conv = F.col(type_col) == conversion
        w_rem = (
            Window.partitionBy(user_col)
            .orderBy(ts_col, *tie_cols)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        stamped = ev.select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__ty"),
            *[F.col(c).alias(f"__t_{i}") for i, c in enumerate(tie_cols)],
            is_conv.alias("__ic"),
            F.sum(is_conv.cast("int")).over(w_rem).alias("__cid"),
        ).where(F.col("__cid") >= 1)
        ties = [F.col(f"__t_{i}") for i in range(len(tie_cols))]
        wg = Window.partitionBy("__u", "__cid")
        wgo = wg.orderBy("__ts", *ties)
        grouped = stamped.select(
            "*",
            F.sum((~F.col("__ic")).cast("int")).over(wg).alias("__m"),
            F.max(F.when(~F.col("__ic"), F.col("__ts"))).over(wg)
            .alias("__mts"),
            F.row_number().over(wgo).alias("__pos"),
        )
        touches = grouped.where(~F.col("__ic"))
        m = F.col("__m").cast("double")
        pos = F.col("__pos")
        import pandas as pd

        halflife_us = float(pd.Timedelta(halflife) // pd.Timedelta("1us"))
        # exponent anchored at the NEWEST TOUCH in the group, not the
        # conversion: normalized weights are shift-invariant (the
        # anchor factors out of numerator and denominator), and the
        # anchor touch contributes 0.5^0 = 1 so the denominator is
        # always >= 1 — anchoring at the conversion instead lets a
        # group whose touches ALL predate it by >> halflife underflow
        # every decay to 0.0 and 0/0-crash under ANSI (a ~1100-
        # halflife-old touch is pow(0.5, 1100) = exact 0.0)
        decay_exp = (
            F.expr("timestampdiff(MICROSECOND, __ts, __mts)").cast("double")
            / F.lit(halflife_us)
        )
        raw_decay = F.pow(F.lit(0.5), decay_exp)
        # normalize over TOUCHES only: the conversion row sits in the
        # same (__u,__cid) group with decay 0.5^0 = 1 and would inflate
        # the denominator so per-conversion weights no longer sum to 1
        decay_total = F.sum(
            F.when(~F.col("__ic"), raw_decay)
        ).over(wg)
        weight_of = {
            "linear": F.lit(1.0) / m,
            "position": F.when(F.col("__m") == 1, F.lit(1.0))
            .when(F.col("__m") == 2, F.lit(0.5))
            .when((pos == 1) | (pos == F.col("__m")), F.lit(0.4))
            .otherwise(F.lit(0.2) / (m - 2)),
            "time_decay": raw_decay / decay_total,
        }
        for mdl in path:
            parts.append(
                touches.select(
                    F.lit(mdl).alias("model"),
                    F.col("__ty").alias("touch"),
                    weight_of[mdl].alias("__w"),
                )
            )
            # conversions with no touch: full credit to 'direct'
            parts.append(
                grouped.where(F.col("__ic") & (F.col("__m") == 0)).select(
                    F.lit(mdl).alias("model"),
                    F.lit("direct").alias("touch"),
                    F.lit(1.0).alias("__w"),
                )
            )
    credits = parts[0]
    for p in parts[1:]:
        credits = credits.unionByName(p)
    counts = credits.groupBy("model", "touch").agg(
        F.count("*").alias("n"),
        F.round(F.sum("__w"), 4).alias("credit"),
    )
    wm = Window.partitionBy("model")
    return counts.select(
        "model",
        "touch",
        "n",
        "credit",
        F.round(F.col("credit") / F.sum("credit").over(wm), 6).alias("share"),
    )
