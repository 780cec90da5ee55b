"""Corpus snapshot diff — what changed between two versions of a
keyed table (yesterday's crawl vs today's, pre- vs post-cleaning).

One keyed full-outer join decides everything: ``added`` (key only in
new), ``removed`` (key only in old), ``changed`` (both sides, content
hash differs).  Content identity is a deterministic map-side
``xxhash64`` over the compared columns (sorted by name, each slot
contributing (position, isnull flag, value) — the injective token
stream of ``merge.py::snapshot_cdc``, comparing by Spark VALUE
equality: ``NaN == NaN``, ``-0.0 == 0.0``, NULL a real value), so the
join carries keys + two 8-byte hashes per row, never the payload
columns.  MAP-typed compare columns are rejected (no canonical hash —
nondeterministic key order; canonicalize with sorted
``map_entries(...)`` first), the same contract as ``snapshot_cdc``.
``unchanged`` rows are EXCLUDED by default — at 100 TB the
interesting output is the delta (typically ≪ 1% of keys), and
materializing the unchanged 99% would dwarf it.

Duplicate keys on either side are rejected loudly (a diff keyed on a
non-key silently degrades into a many-to-many join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_hash(cols: list[str]):
    # per-slot (position, isnull flag, value): Spark hash functions
    # SKIP null arguments, so flags keep the stream injective — see
    # merge.py::snapshot_cdc's hashed() for the full argument
    return F.xxhash64(
        *[
            x
            for i, c in enumerate(sorted(cols))
            for x in (F.lit(i), F.isnull(F.col(c)).cast("int"), F.col(c))
        ]
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    check_unique: bool = True,
) -> DataFrame:
    """``[id_col, status]`` with status ∈ added / removed / changed
    (+ unchanged when ``include_unchanged``).  ``compare_cols``
    defaults to the non-key columns present on BOTH sides; columns
    only one side has are ignored (schema evolution is not content
    change — diff them explicitly if it matters).

    ``check_unique`` (default on) fails fast if either side repeats a
    key; pass ``False`` only when uniqueness is already enforced
    upstream and the extra aggregation pass matters."""
    shared = [
        c for c in old.columns if c in set(new.columns) and c != id_col
    ]
    cols = compare_cols if compare_cols is not None else shared
    if not cols:
        raise ValueError("no columns to compare")
    missing = [
        c for c in cols if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"compare_cols absent from a side: {missing}")
    mappy = [
        c for c in cols
        if "map<" in new.schema[c].dataType.simpleString()
        or "map<" in old.schema[c].dataType.simpleString()
    ]
    if mappy:
        raise ValueError(
            "corpus_diff: map-typed compare columns have no canonical "
            f"hash (nondeterministic key order): {mappy}; canonicalize "
            "first, e.g. compare map_entries(...) sorted by key"
        )

    def keyed(df: DataFrame, tag: str) -> DataFrame:
        k = df.select(
            F.col(id_col).alias(f"__id_{tag}"),
            _content_hash(cols).alias(f"__h_{tag}"),
        )
        if check_unique:
            # loud duplicate detection without a second scan of the
            # payload: count per key over the (id, hash) projection
            from pyspark.sql import Window as W

            k = k.withColumn(
                "__n", F.count("*").over(W.partitionBy(f"__id_{tag}"))
            )
            k = k.withColumn(
                f"__id_{tag}",
                F.when(F.col("__n") == 1, F.col(f"__id_{tag}")).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(f"corpus_diff: duplicate {id_col} on "
                                  f"{tag} side: "),
                            F.col(f"__id_{tag}").cast("string"),
                        )
                    )
                ),
            ).drop("__n")
        return k

    o, n = keyed(old, "old"), keyed(new, "new")
    joined = o.join(
        n, o["__id_old"] == n["__id_new"], "full_outer"
    )
    status = (
        F.when(F.col("__id_old").isNull(), F.lit("added"))
        .when(F.col("__id_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        F.coalesce(F.col("__id_new"), F.col("__id_old")).alias(id_col),
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """``[status, n]`` counts — run on a ``corpus_diff`` result (pass
    ``include_unchanged=True`` there if the unchanged count matters)."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))


_NUMERIC_BASES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
}


def _stack_numeric(df: DataFrame, cols: list[str], side: str) -> DataFrame:
    """Stack numeric columns to (side, column, value double) map-side —
    the fixed-pass drift layout; NULL values dropped (no bin)."""
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(c).cast("double").alias("value"),
        )
        for c in cols
    ]
    return df.select(F.explode(F.array(*structs)).alias("s")).select(
        F.lit(side).alias("side"),
        F.col("s.column").alias("column"),
        F.col("s.value").alias("value"),
    ).where(F.col("value").isNotNull())


def _bin_chain(cols: list[str], bounds: dict[str, list[float]]):
    """When-chain mapping the stacked ``column`` to its literal
    boundary array — evaluated once per row, outside any lambda."""
    barr = F.when(
        F.col("column") == cols[0],
        F.array(*[F.lit(b) for b in bounds[cols[0]]]),
    )
    for c in cols[1:]:
        barr = barr.when(
            F.col("column") == c, F.array(*[F.lit(b) for b in bounds[c]])
        )
    return barr


def _cat_stack(df: DataFrame, cols: list[str], null_label: str) -> DataFrame:
    """Stack categorical columns to (column, category string) map-side
    with NULL → ``null_label`` — shared by :func:`category_drift` and
    the streaming categorical monitor
    (``streaming.ops.category_drift_stream``)."""
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.coalesce(
                F.col(c).cast("string"), F.lit(null_label)
            ).alias("category"),
        )
        for c in cols
    ]
    return df.select(F.explode(F.array(*structs)).alias("s")).select(
        F.col("s.column").alias("column"),
        F.col("s.category").alias("category"),
    )


def _lit_chain(cols: list[str], values: dict[str, float]):
    """When-chain mapping ``column`` to a double literal per column."""
    out = F.when(F.col("column") == cols[0], F.lit(float(values[cols[0]])))
    for c in cols[1:]:
        out = out.when(F.col("column") == c, F.lit(float(values[c])))
    return out


def drift_bin_counts(
    df: DataFrame, cols: list[str], bounds: dict[str, list[float]]
) -> DataFrame:
    """One-sided equi-depth binning against FROZEN boundaries —
    ``[column, bin, n]``, only non-empty bins (map-side stack + one
    groupBy).  The per-batch kernel of the streaming drift monitor
    (``streaming.ops.drift_stream``): counts are exact integers, so
    accumulating them across micro-batches and re-deriving PSI gives
    BIT-identical results to :func:`snapshot_drift` over the
    concatenated data (the stream ≡ batch differential)."""
    missing = [c for c in cols if c not in bounds]
    if missing:
        raise ValueError(f"drift_bin_counts: no boundaries for {missing}")
    return (
        _stack_numeric(df, cols, "x")
        .select(
            "column",
            F.size(
                F.filter(_bin_chain(cols, bounds), lambda b: b < F.col("value"))
            ).cast("long").alias("bin"),
        )
        .groupBy("column", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_reference(
    df: DataFrame,
    cols: list[str],
    *,
    bins: int = 10,
    relative_error: float | None = None,
) -> tuple[dict[str, list[float]], DataFrame]:
    """Freeze a drift REFERENCE from a snapshot: per-column equi-depth
    boundaries (one aggregation for ALL columns — exact ``percentile``
    by default, the ``percentile_approx`` sketch with
    ``relative_error`` at scale) plus the snapshot's own bin counts
    (:func:`drift_bin_counts` against those boundaries).  Returns
    ``(bounds, counts)``; raises if any column has no non-null rows
    (no distribution to freeze).  This is the setup half of the
    streaming drift monitor; :func:`snapshot_drift` fuses the same
    steps with the new-side counts for the one-shot batch compare."""
    if bins < 2:
        raise ValueError(f"need bins >= 2; got {bins}")
    if not cols:
        raise ValueError("drift_reference: no columns given")
    probs = [i / bins for i in range(1, bins)]
    aggs = []
    for c in cols:
        if relative_error is None:
            bexpr = F.expr(
                f"percentile(`{c}`, array({', '.join(map(str, probs))}))"
            )
        else:
            bexpr = F.percentile_approx(
                c, F.array(*[F.lit(p) for p in probs]),
                int(1.0 / relative_error),
            )
        aggs.append(bexpr.alias(f"__b__{c}"))
        aggs.append(F.count(F.col(c)).alias(f"__n__{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    bounds: dict[str, list[float]] = {}
    for c in cols:
        if row[f"__n__{c}"] == 0:
            raise ValueError(
                f"drift_reference: column {c!r} has no non-null rows — "
                "no distribution to freeze"
            )
        bounds[c] = [float(x) for x in row[f"__b__{c}"]]
    return bounds, drift_bin_counts(df, cols, bounds)


def _psi_terms(pa, pb, eps: float):
    """Shared PSI arithmetic: clamped shares → (p_old, p_new,
    psi_term) select expressions.  ``pa``/``pb`` must be double
    columns built from exact integer counts and totals so the result
    is bit-deterministic across engines (the hash-gate discipline)."""
    pac = F.greatest(pa, F.lit(float(eps)))
    pbc = F.greatest(pb, F.lit(float(eps)))
    return (
        F.round(pa, 6).alias("p_old"),
        F.round(pb, 6).alias("p_new"),
        ((pbc - pac) * F.log(pbc / pac)).alias("psi_term"),
    )


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    *,
    bins: int = 10,
    relative_error: float | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution drift between two corpus snapshots — the
    Population Stability Index, the standard monitoring statistic for
    "did this feature's distribution move between yesterday's corpus
    and today's" (quality scores, lengths, balances…).  Numeric
    columns only — for string/boolean features use
    :func:`category_drift` (same PSI, category bins).

    Per column: equi-depth bin boundaries come from the OLD snapshot's
    quantiles (``bins − 1`` inner edges), both snapshots are binned by
    "count of boundaries strictly below x" (values equal to an edge
    land in the LOWER bin — ``equi_depth_bin``'s convention), and each
    bin contributes

        psi_term = (p_new' − p_old') · ln(p_new' / p_old')

    with ``p' = max(share, eps)`` (the standard clamp — an empty bin
    would otherwise divide/log zero).  Σ psi_term per column is the
    PSI; the usual reading is < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted.  Returns one row per (column, bin):
    ``[column, bin, n_old, n_new, p_old, p_new, psi_term]`` with every
    bin present (zero counts included) — ``groupBy("column").
    agg(sum("psi_term"))`` for the per-column verdict.

    FIXED job count regardless of column count (the ``table_profile``
    one-pass discipline, report.py): ONE old-side aggregation carrying
    every column's quantile boundaries AND non-null count as sibling
    agg columns, ONE new-side count aggregation, then a single lazy
    binning pass — both snapshots stacked to (side, column, value)
    map-side, binned against literal boundaries, and counted by one
    ``groupBy(column, bin)``.  A 20-feature monitor at 100 TB pays 2
    scans of old + 1 of new, not ~5 serialized jobs per column.

    ``relative_error=None`` (default) computes EXACT quantile
    boundaries (the hash-exact gate shape, q_setops' ``drift``
    branch); pass a value (e.g. 0.001) for the ``percentile_approx``
    sketch path at 100 TB, where an exact percentile would sort each
    column."""
    if bins < 2:
        raise ValueError(f"need bins >= 2; got {bins}")
    if not cols:
        raise ValueError("snapshot_drift: no columns given")
    for df, side in ((old, "old"), (new, "new")):
        for c in cols:
            base = df.schema[c].dataType.simpleString().split("(")[0]
            if base not in _NUMERIC_BASES:
                raise ValueError(
                    f"snapshot_drift: column {c!r} on the {side} side is "
                    f"{base}, not numeric — for categorical features use "
                    "category_drift (same PSI over category bins)"
                )
    spark = old.sparkSession
    probs = [i / bins for i in range(1, bins)]

    # job 1 — old side, ONE agg for all columns: boundaries + counts
    old_aggs = []
    for c in cols:
        if relative_error is None:
            bexpr = F.expr(
                f"percentile(`{c}`, array({', '.join(map(str, probs))}))"
            )
        else:
            bexpr = F.percentile_approx(
                c, F.array(*[F.lit(p) for p in probs]),
                int(1.0 / relative_error),
            )
        old_aggs.append(bexpr.alias(f"__b__{c}"))
        old_aggs.append(F.count(F.col(c)).alias(f"__n__{c}"))
    old_row = old.agg(*old_aggs).collect()[0].asDict()
    # job 2 — new side, ONE agg: non-null counts per column
    new_row = new.agg(
        *[F.count(F.col(c)).alias(f"__n__{c}") for c in cols]
    ).collect()[0].asDict()
    bounds: dict[str, list[float]] = {}
    totals: dict[str, tuple[int, int]] = {}
    for c in cols:
        ta_v, tb_v = old_row[f"__n__{c}"], new_row[f"__n__{c}"]
        if ta_v == 0 or tb_v == 0:
            raise ValueError(
                f"snapshot_drift: column {c!r} has no non-null rows on "
                f"{'the old' if ta_v == 0 else 'the new'} side — no "
                "distribution to compare"
            )
        bounds[c] = [float(x) for x in old_row[f"__b__{c}"]]
        totals[c] = (ta_v, tb_v)

    # lazy binning pass: stack every column to (side, column, value)
    # map-side, bin against the literal boundaries (a when-chain
    # selecting the column's array — evaluated once per row, outside
    # any lambda), count both sides in ONE groupBy
    both = _stack_numeric(old, cols, "o").unionByName(
        _stack_numeric(new, cols, "n")
    )
    counts = (
        both.select(
            "side", "column",
            F.size(
                F.filter(
                    _bin_chain(cols, bounds), lambda b: b < F.col("value")
                )
            ).cast("long").alias("bin"),
        )
        .groupBy("column", "bin")
        .agg(
            F.sum(F.when(F.col("side") == "o", 1).otherwise(0))
            .cast("long").alias("n_old"),
            F.sum(F.when(F.col("side") == "n", 1).otherwise(0))
            .cast("long").alias("n_new"),
        )
    )
    # every (column, bin) cell present, zero counts included: a tiny
    # literal grid left-joins the (≤ cols·bins row) aggregate —
    # broadcast, no corpus-side work
    grid = spark.createDataFrame(
        [(c,) for c in cols], "column string"
    ).select(
        "column",
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("__b"),
    ).select("column", F.col("__b").cast("long").alias("bin"))
    j = grid.join(F.broadcast(counts), ["column", "bin"], "left").select(
        "column", "bin",
        F.coalesce("n_old", F.lit(0).cast("long")).alias("n_old"),
        F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
    )
    ta = _lit_chain(cols, {c: totals[c][0] for c in cols})
    tb = _lit_chain(cols, {c: totals[c][1] for c in cols})
    pa = F.col("n_old").cast("double") / ta
    pb = F.col("n_new").cast("double") / tb
    return j.select(
        "column", "bin", "n_old", "n_new", *_psi_terms(pa, pb, eps)
    )


def heavy_hitter_categories(
    df: DataFrame,
    cols: list[str],
    *,
    top_n: int = 20,
    k: int = 1024,
    null_label: str = "(null)",
) -> dict[str, list[str]]:
    """The UNBOUNDED-vocabulary selection path for the categorical
    drift family: the top-``top_n`` categories per column by exact
    verified count, derived via Misra-Gries heavy hitters
    (``sketch.heavy_hitters_sketch``) so no vocabulary-sized state is
    ever built — feed the result to ``category_drift`` /
    ``chi2_test`` / ``streaming.ops.category_drift_stream`` as
    ``frozen_categories=``.

    All columns ride ONE composite-key sketch (column + unit-separator
    + category over the ``_cat_stack`` frame — two corpus scans total
    regardless of column count, O(k) state), then the verified EXACT
    counts rank per column by (count DESC, category ASC) — the same
    deterministic order the top-N path uses, so whenever every wanted
    category clears the MG guarantee the selection EQUALS the exact
    top-N selection (the differential pinned in tests/test_diff.py).
    The guarantee: a category is certainly present if its count exceeds
    ``N_stack/(k+1)`` with ``N_stack = rows·len(cols)`` — size ``k``
    generously (the default 1024 is sketch-sized either way).  NULL is
    a first-class ``null_label`` category, exactly as the drift
    operators treat it."""
    from cosmap_spark.operators.sketch import heavy_hitters_sketch

    if top_n < 1:
        raise ValueError(f"need top_n >= 1; got {top_n}")
    if not cols:
        raise ValueError("heavy_hitter_categories: no columns given")
    # the composite key splits on the FIRST unit separator, so a
    # category containing \\x1f round-trips — but a COLUMN NAME
    # containing it would mis-split every key it anchors
    bad = [c for c in cols if "\x1f" in c]
    if bad:
        raise ValueError(
            f"heavy_hitter_categories: column names {bad} contain the "
            "\\x1f composite-key separator"
        )
    stacked = _cat_stack(df, cols, null_label).select(
        F.concat(F.col("column"), F.lit("\x1f"), F.col("category"))
        .alias("ck")
    )
    hh = heavy_hitters_sketch(stacked, "ck", k=k)
    per_col: dict[str, list[tuple[int, str]]] = {c: [] for c in cols}
    for r in hh.collect():  # O(k) rows by construction
        col_name, cat = r["ck"].split("\x1f", 1)
        per_col[col_name].append((int(r["n"]), cat))
    out = {}
    for c in cols:
        ranked = sorted(per_col[c], key=lambda t: (-t[0], t[1]))
        out[c] = [cat for _, cat in ranked[:top_n]]
    return out


def _frozen_fold(cols: list[str], frozen: dict[str, list[str]],
                 other_label: str):
    """The map-side fold expression for a caller-frozen category
    selection: identity for frozen categories, ``other_label`` for
    everything else — applied BEFORE any aggregation, so the counts
    frame is O(cols·(|frozen|+1)) even over an unbounded vocabulary.
    Shared by ``category_drift``/``chi2_test``'s frozen paths (the
    stream monitor folds with the equivalent array literal chain).
    Callers must have canonicalized the selection via
    :func:`_check_frozen` first — values here are exact strings."""
    keep = None
    for c in cols:
        cond = (F.col("column") == c) & F.col("category").isin(
            list(frozen[c])
        )
        keep = cond if keep is None else keep | cond
    return F.when(keep, F.col("category")).otherwise(F.lit(other_label))


def _canon_category(v, op: str) -> str:
    """Canonicalize ONE frozen-category value to the exact string
    ``_cat_stack``'s ``cast('string')`` produces.  Python ``str()`` is
    NOT that function — ``str(True)`` is ``'True'`` while Spark casts
    to ``'true'``, which would silently fold every boolean row into
    OTHER and mask all drift (round-9 review finding, reproduced).
    str/bool/int render identically in both worlds; anything else
    (floats: Spark ``'1.0E-5'`` vs python ``'1e-05'`` — the CLAUDE.md
    double→varchar trap) is REFUSED: cast the column upstream and
    pass canonical strings."""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, int):
        return str(v)
    raise ValueError(
        f"{op}: frozen category {v!r} ({type(v).__name__}) has no "
        "canonical string rendering shared by Spark's cast and python "
        "— pass categories as strings (cast the column upstream)"
    )


def _check_frozen(cols: list[str], frozen: dict[str, list[str]],
                  other_label: str, op: str,
                  null_label: str | None = None) -> dict[str, list[str]]:
    """Validate AND canonicalize a frozen selection; returns the
    all-strings dict every consumer (fold expressions, sidecars,
    resume comparisons) must use.  ``null_label`` (when given) is
    checked against ``other_label`` here so every frozen consumer gets
    the guard for free: other_label == null_label would silently merge
    the OTHER fold into the null bucket (round-9 advice on
    chi2_test)."""
    if null_label is not None and other_label == null_label:
        raise ValueError(
            f"{op}: other_label and null_label must differ"
        )
    missing = [c for c in cols if not frozen.get(c)]
    if missing:
        raise ValueError(
            f"{op}: frozen_categories has no categories for {missing} — "
            "every column needs a non-empty selection (derive one with "
            "heavy_hitter_categories)"
        )
    canon = {
        c: [_canon_category(v, op) for v in frozen[c]] for c in cols
    }
    tainted = [c for c in cols if other_label in canon[c]]
    if tainted:
        raise ValueError(
            f"{op}: frozen_categories for {tainted} contains the "
            f"other_label {other_label!r} — folded and frozen "
            "categories must not collide"
        )
    return canon


def category_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    *,
    top_n: int = 20,
    eps: float = 1e-6,
    other_label: str = "(other)",
    null_label: str = "(null)",
    frozen_categories: dict[str, list[str]] | None = None,
) -> DataFrame:
    """PSI drift for CATEGORICAL columns (language, source domain,
    license, script…) — the same clamped psi terms as
    :func:`snapshot_drift`, with bins = categories instead of
    quantile intervals.

    Per column: values cast to string (NULL → ``null_label`` — a null
    share moving IS drift), the ``top_n`` categories by OLD-side count
    (ties broken by category ascending — deterministic) keep their
    identity, everything else — including categories seen only in the
    new snapshot — folds into ``other_label`` (a brand-new category
    surfaces as OTHER's n_old≈0 / n_new≫0 psi spike).  Returns one row
    per (column, category):
    ``[column, category, n_old, n_new, p_old, p_new, psi_term]``;
    every selected category appears even with a zero count on one
    side; OTHER appears only when something folded into it.  Totals
    count ALL rows (nulls are a category), so shares sum to 1 per
    (column, side).

    Plan shape (one corpus-wide pass TOTAL, zero driver jobs at
    construction): both snapshots stack map-side to (side, column,
    category), ONE ``groupBy(column, category)`` with map-side combine
    produces the O(vocabulary) counts frame; selection (a keyed
    row_number window), OTHER folding (a second tiny groupBy), and
    per-column totals (keyed window sums) all run on that aggregate.

    ``frozen_categories`` ({column: [categories keeping identity]}) is
    the UNBOUNDED-vocabulary path: the fold to ``other_label`` happens
    MAP-SIDE BEFORE the aggregation, so the counts frame is
    O(cols·(|frozen|+1)) and no vocabulary-sized state (aggregate OR
    selection window) ever exists; ``top_n`` is ignored.  Derive the
    selection with :func:`heavy_hitter_categories` — when every frozen
    category clears the MG guarantee the result is IDENTICAL to the
    exact ``top_n`` path (pinned in tests/test_diff.py).  A frozen
    category absent from both sides emits no row (nothing to
    compare)."""
    from pyspark.sql import Window as W

    if top_n < 1:
        raise ValueError(f"need top_n >= 1; got {top_n}")
    if not cols:
        raise ValueError("category_drift: no columns given")
    if other_label == null_label:
        raise ValueError("other_label and null_label must differ")
    if frozen_categories is not None:
        frozen_categories = _check_frozen(
            cols, frozen_categories, other_label, "category_drift",
            null_label=null_label,
        )
    for df, side in ((old, "old"), (new, "new")):
        for c in cols:
            base = df.schema[c].dataType.simpleString().split("(")[0]
            if base.startswith(("array", "map", "struct")):
                raise ValueError(
                    f"category_drift: column {c!r} on the {side} side "
                    f"is {base} — categories must be scalar"
                )

    def stacked(df: DataFrame, side: str) -> DataFrame:
        return _cat_stack(df, cols, null_label).select(
            F.lit(side).alias("side"), "column", "category"
        )

    both = stacked(old, "o").unionByName(stacked(new, "n"))
    if frozen_categories is not None:
        # fold BEFORE the aggregation: the grouping key is already the
        # folded category, so the aggregate is bounded by construction
        folded = (
            both.select(
                "side", "column",
                _frozen_fold(cols, frozen_categories, other_label)
                .alias("category"),
            )
            .groupBy("column", "category")
            .agg(
                F.sum(F.when(F.col("side") == "o", 1).otherwise(0))
                .cast("long").alias("n_old"),
                F.sum(F.when(F.col("side") == "n", 1).otherwise(0))
                .cast("long").alias("n_new"),
            )
        )
    else:
        counts = (
            both
            .groupBy("column", "category")
            .agg(
                F.sum(F.when(F.col("side") == "o", 1).otherwise(0))
                .cast("long").alias("n_old"),
                F.sum(F.when(F.col("side") == "n", 1).otherwise(0))
                .cast("long").alias("n_new"),
            )
        )
        # selection on the vocabulary-sized aggregate: rank OLD-present
        # categories per column, keep identity for rank <= top_n
        rn = F.row_number().over(
            W.partitionBy("column").orderBy(
                F.col("n_old").desc(), F.col("category").asc()
            )
        )
        folded = (
            counts.withColumn(
                "__rn",
                F.when(F.col("n_old") > 0, rn).otherwise(F.lit(None)),
            )
            .select(
                "column",
                F.when(F.col("__rn") <= top_n, F.col("category"))
                .otherwise(F.lit(other_label)).alias("category"),
                "n_old", "n_new",
            )
            .groupBy("column", "category")
            .agg(
                F.sum("n_old").cast("long").alias("n_old"),
                F.sum("n_new").cast("long").alias("n_new"),
            )
        )
    w = W.partitionBy("column")
    ta = F.sum("n_old").over(w)
    tb = F.sum("n_new").over(w)
    err = F.raise_error(
        F.concat(
            F.lit("category_drift: column "), F.col("column"),
            F.lit(" has no rows on one side — no distribution to compare"),
        )
    ).cast("double")
    pa = F.col("n_old").cast("double") / F.when(ta > 0, ta.cast("double")).otherwise(err)
    pb = F.col("n_new").cast("double") / F.when(tb > 0, tb.cast("double")).otherwise(err)
    return folded.select(
        "column", "category", "n_old", "n_new", *_psi_terms(pa, pb, eps)
    )
